"""spark-submit entry point for catalog + index maintenance.

    zip -r dist/engine.zip ir_index_construction_spark
    spark-submit --py-files dist/engine.zip tools/maintain.py \
        --catalog /data/index_catalog <command> [options]

Commands (each is one atomic catalog operation; see
sources/catalog.py and plans/maintenance.py for semantics):

  compact    [--tables t1,t2] [--target-mb 128]
             rewrite small per-commit file sets into right-sized files
  expire     [--tables t1,t2] [--keep-last 3]
             drop old snapshot manifests (releases their files)
  vacuum     [--tables t1,t2] [--grace-hours 24]
             delete unreferenced data files + crashed staging dirs
  tombstone  --urls-file FILE [--reason takedown]
             mark the docs currently indexed for these urls deleted
  purge      [--shard-size N] [--term-buckets N] [--salt-buckets N]
             physically rewrite docs+postings (and re-encode the
             compressed index) without tombstoned ids
  reindex    [--shard-size N] [--term-buckets N] [--salt-buckets N]
             merge all index segments into one at the current avgdl

The nightly maintenance a long-lived streaming index wants, in order:
``reindex`` (bound segment growth) -> ``purge`` (apply takedowns) ->
``compact`` -> ``expire`` -> ``vacuum`` (reclaim disk, complete
erasure).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# positions/doc_meta accrete one file set per streaming micro-batch and
# rdictionary one delta per segment commit — they need compact/expire/
# vacuum exactly like the big four (tables absent from a catalog are
# skipped, so the default list is safe on any build profile)
DEFAULT_TABLES = ("postings", "docs", "index", "dictionary",
                  "rdictionary", "doc_meta", "positions")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="catalog root dir")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("compact")
    p.add_argument("--tables", default=",".join(DEFAULT_TABLES))
    p.add_argument("--target-mb", type=int, default=128)
    p = sub.add_parser("expire")
    p.add_argument("--tables", default=",".join(DEFAULT_TABLES))
    p.add_argument("--keep-last", type=int, default=3)
    p = sub.add_parser("vacuum")
    p.add_argument("--tables", default=",".join(DEFAULT_TABLES))
    p.add_argument("--grace-hours", type=float, default=24.0)
    p = sub.add_parser("tombstone")
    p.add_argument("--urls-file", required=True,
                   help="file with one url per line")
    p.add_argument("--reason", default="takedown")
    p = sub.add_parser("purge")
    p.add_argument("--shard-size", type=int, default=1 << 20)
    p.add_argument("--term-buckets", type=int, default=64)
    p.add_argument("--salt-buckets", type=int, default=4)
    p = sub.add_parser("reindex")
    p.add_argument("--shard-size", type=int, default=1 << 20)
    p.add_argument("--term-buckets", type=int, default=64)
    p.add_argument("--salt-buckets", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ir_index_construction_spark.sources.catalog import Catalog

    spark = SparkSession.builder.appName(f"ir-maintain-{args.cmd}") \
        .getOrCreate()
    cat = Catalog(args.catalog)

    def tables():
        return [t for t in args.tables.split(",") if cat.table_exists(t)]

    if args.cmd == "compact":
        for t in tables():
            snap = cat.compact(spark, t,
                               target_file_bytes=args.target_mb << 20)
            print(f"compact {t}: v{snap['version']}, "
                  f"{len(snap['files'])} files")
    elif args.cmd == "expire":
        for t in tables():
            gone = cat.expire_snapshots(t, keep_last=args.keep_last)
            print(f"expire {t}: dropped versions {gone}")
    elif args.cmd == "vacuum":
        for t in tables():
            gone = cat.vacuum(t, grace_seconds=args.grace_hours * 3600)
            print(f"vacuum {t}: removed {len(gone)} paths")
    elif args.cmd == "tombstone":
        from ir_index_construction_spark.plans.maintenance import (
            tombstone_urls)

        urls = [u.strip() for u in
                Path(args.urls_file).read_text().splitlines() if u.strip()]
        n = tombstone_urls(spark, cat, urls, reason=args.reason)
        print(f"tombstoned {n} doc_ids for {len(urls)} urls")
    elif args.cmd == "purge":
        from ir_index_construction_spark.config import IndexConfig
        from ir_index_construction_spark.plans.maintenance import (
            purge_tombstones)

        cfg = IndexConfig(shard_size=args.shard_size,
                          term_buckets=args.term_buckets,
                          salt_buckets=args.salt_buckets)
        print(f"purged {purge_tombstones(spark, cat, index_cfg=cfg)} "
              "doc_ids")
    elif args.cmd == "reindex":
        from ir_index_construction_spark.config import IndexConfig
        from ir_index_construction_spark.plans.maintenance import reindex

        cfg = IndexConfig(shard_size=args.shard_size,
                          term_buckets=args.term_buckets,
                          salt_buckets=args.salt_buckets)
        print(f"merged away {reindex(spark, cat, index_cfg=cfg)} segments")


if __name__ == "__main__":
    main()
