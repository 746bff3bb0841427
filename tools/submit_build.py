"""spark-submit entry point for the resumable index build.

    zip -r dist/engine.zip ir_index_construction_spark
    spark-submit --py-files dist/engine.zip tools/submit_build.py \
        --corpus /data/corpus_parquet --catalog /data/index_catalog \
        --build-id crawl-2026-08 --batches 64 [--resume]

On a cluster the master/memory come from spark-submit; the script only
declares the plan.  A killed run re-submitted with --resume re-runs
only unfinished partitions (checkpoints ledger in the catalog).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="parquet dir with (url, warc_ts, html, text, lang)")
    ap.add_argument("--catalog", required=True, help="catalog root dir")
    ap.add_argument("--build-id", default="build-0")
    ap.add_argument("--batches", type=int, default=1)
    ap.add_argument("--shard-size", type=int, default=1 << 20)
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--salt-buckets", type=int, default=4)
    ap.add_argument("--positions", action="store_true",
                    help="also build the positional index (enables "
                         "exact-phrase / proximity queries; positions "
                         "commit atomically with each tokenize batch)")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ir_index_construction_spark.config import BuildConfig, IndexConfig
    from ir_index_construction_spark.plans.builder import IndexBuilder
    from ir_index_construction_spark.sources.catalog import Catalog

    spark = (SparkSession.builder.appName(f"ir-index-build-{args.build_id}")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    cfg = BuildConfig(index=IndexConfig(
        shard_size=args.shard_size,
        term_buckets=args.term_buckets,
        salt_buckets=args.salt_buckets,
    ), positions=args.positions)
    builder = IndexBuilder(Catalog(args.catalog), cfg,
                           build_id=args.build_id, n_batches=args.batches)
    documents = None if args.resume else spark.read.parquet(args.corpus)
    builder.build(documents)

    tables = builder.tables(spark)
    stats = tables["stats"].collect()[0]
    print(f"build {args.build_id} complete: n_docs={stats['n_docs']} "
          f"avgdl={stats['avgdl']:.2f} n_terms={stats['n_terms']}")


if __name__ == "__main__":
    main()
