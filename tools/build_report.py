"""Build observability report from the catalog's checkpoint/lineage/
metrics ledger tables (north rule: per-partition lineage + build
metrics as observable artifacts, not write-only rows).

    python tools/build_report.py --catalog /data/index_catalog \
        [--build-id build-0] [--partitions]

Prints, per build stage: committed partitions, wall time, docs/sec,
postings/sec, compressed bytes (total and per partition), and the input
snapshot lineage; then build totals.  --partitions adds the per-
partition breakdown — the view that shows a straggler or skewed term
bucket directly.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STAGE_ORDER = {"prepare": 0, "tokenize": 1, "stats": 2, "encode": 3}


def fmt_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024 or unit == "TiB":
            return f"{n:,.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:,.1f} TiB"


def report(spark, catalog, build_id: str | None, show_partitions: bool):
    metrics = catalog.read(spark, "metrics").collect()
    lineage = {(r["stage"], r["partition_id"]): r
               for r in catalog.read(spark, "lineage").collect()}
    builds = sorted({r["build_id"] for r in metrics})
    if build_id is None:
        if len(builds) > 1:
            print(f"builds in catalog: {builds}; reporting {builds[-1]!r} "
                  "(pass --build-id to pick)")
        build_id = builds[-1]
    rows = [r for r in metrics if r["build_id"] == build_id]
    if not rows:
        raise SystemExit(f"no metrics rows for build_id {build_id!r} "
                         f"(available: {builds})")

    print(f"build {build_id!r} — {len(rows)} committed partitions")
    by_stage: dict = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)

    hdr = (f"{'stage':<10}{'parts':>6}{'wall_s':>9}{'docs/s':>10}"
           f"{'postings/s':>12}{'bytes':>12}{'bytes/part':>12}")
    print(hdr)
    print("-" * len(hdr))
    tot_wall = tot_docs = tot_postings = tot_bytes = 0.0
    for stage in sorted(by_stage, key=lambda s: STAGE_ORDER.get(s, 99)):
        part = by_stage[stage]
        wall = sum(r["wall_sec"] for r in part)
        docs = sum(r["docs_per_sec"] * r["wall_sec"] for r in part)
        postings = sum(r["postings_per_sec"] * r["wall_sec"] for r in part)
        nbytes = sum(r["bytes_compressed"] for r in part)
        tot_wall += wall
        tot_bytes += nbytes
        if stage == "tokenize":
            tot_docs, tot_postings = docs, postings
        print(f"{stage:<10}{len(part):>6}{wall:>9.2f}"
              f"{(docs / wall if wall else 0):>10.1f}"
              f"{(postings / wall if wall else 0):>12.1f}"
              f"{fmt_bytes(nbytes):>12}"
              f"{fmt_bytes(nbytes / len(part)):>12}")
        if show_partitions:
            for r in sorted(part, key=lambda r: r["partition_id"]):
                lin = lineage.get((r["stage"], r["partition_id"]))
                src = (f" <- {lin['input_snapshot'][:12]} "
                       f"rows {lin['rows_in']}->{lin['rows_out']}"
                       if lin else "")
                print(f"  p{r['partition_id']:<4} wall {r['wall_sec']:>7.2f}s"
                      f"  {r['docs_per_sec']:>8.1f} docs/s"
                      f"  {r['postings_per_sec']:>10.1f} postings/s"
                      f"  {fmt_bytes(r['bytes_compressed']):>10}{src}")
    print("-" * len(hdr))
    print(f"{'total':<10}{len(rows):>6}{tot_wall:>9.2f}"
          f"{(tot_docs / tot_wall if tot_wall else 0):>10.1f}"
          f"{(tot_postings / tot_wall if tot_wall else 0):>12.1f}"
          f"{fmt_bytes(tot_bytes):>12}")
    print(f"\nindexed {int(tot_docs)} docs, {int(tot_postings)} postings, "
          f"{fmt_bytes(tot_bytes)} compressed "
          f"({(tot_docs / tot_wall if tot_wall else 0):.1f} docs/s over "
          f"committed stage wall)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--build-id", default=None)
    ap.add_argument("--partitions", action="store_true",
                    help="per-partition breakdown (stragglers, skew)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ir_index_construction_spark.sources.catalog import Catalog

    spark = (SparkSession.builder.appName("ir-build-report")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    report(spark, Catalog(args.catalog), args.build_id, args.partitions)


if __name__ == "__main__":
    main()
