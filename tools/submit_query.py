"""spark-submit entry point for BM25 top-k queries against a built
catalog.

    spark-submit --py-files dist/engine.zip tools/submit_query.py \
        --catalog /data/index_catalog --query "machine learning" [-k 10]
        [--mode wand|exhaustive]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--mode", choices=["wand", "exhaustive"], default="wand")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ir_index_construction_spark.operators.topk import wand_topk
    from ir_index_construction_spark.plans.query import bm25_topk_exhaustive
    from ir_index_construction_spark.sources.catalog import Catalog

    spark = (SparkSession.builder.appName("ir-query")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    cat = Catalog(args.catalog)
    stats = cat.read(spark, "stats").collect()[0]
    docs = cat.read(spark, "docs")
    dictionary = cat.read(spark, "dictionary")

    if args.mode == "wand":
        out = wand_topk(cat.read(spark, "index"), dictionary, docs,
                        args.query, stats["n_docs"], float(stats["avgdl"]),
                        k=args.k)
    else:
        out = bm25_topk_exhaustive(cat.read(spark, "postings"), dictionary,
                                   docs, args.query, stats["n_docs"],
                                   float(stats["avgdl"]), k=args.k)
    for r in out.orderBy("rank").collect():
        print(f"{r['rank']:3}  {r['score']:10.4f}  {r['url']}")


if __name__ == "__main__":
    main()
