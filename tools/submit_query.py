"""spark-submit entry point for BM25 top-k queries against a built
catalog — one-shot or interactive REPL (parity with the reference's
query loop, /root/reference/searcher.py:202-219, which prompts, prints
the ranked URLs and the elapsed milliseconds until an empty line quits).

    spark-submit --py-files dist/engine.zip tools/submit_query.py \
        --catalog /data/index_catalog [--query "machine learning"] [-k 10]
        [--mode wand|exhaustive] [--weighted] [--batch queries.txt]

--batch FILE evaluates every line of FILE as one query in a SINGLE
Spark job (operators/topk.py wand_topk_batch) and prints per-query
blocks — the shape for scoring a mined query set against the corpus.

Without --query, enters the REPL:

    query> machine learning
      1      4.6633  https://ics.example.edu/page/42/214
      ...
    [12.3 ms]
    query>
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_query(spark, cat, query: str, k: int, mode: str, weighted: bool,
              idf_cache: dict | None = None):
    from ir_index_construction_spark.operators.topk import wand_topk
    from ir_index_construction_spark.plans.query import bm25_topk_exhaustive

    stats = cat.read(spark, "stats").collect()[0]
    docs = cat.read(spark, "docs")
    dictionary = cat.read(spark, "dictionary")
    if mode == "wand":
        return wand_topk(cat.read(spark, "index"), dictionary, docs,
                         query, stats["n_docs"], float(stats["avgdl"]),
                         k=k, weighted=weighted, idf_cache=idf_cache)
    return bm25_topk_exhaustive(cat.read(spark, "postings"), dictionary,
                                docs, query, stats["n_docs"],
                                float(stats["avgdl"]), k=k,
                                weighted=weighted, idf_cache=idf_cache)


def print_results(rows):
    if not rows:
        print("  (no results)")
    for r in rows:
        print(f"{r['rank']:3}  {r['score']:10.4f}  {r['url']}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--query", default=None,
                    help="one-shot query; omit for the interactive REPL")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--mode", choices=["wand", "exhaustive"], default="wand")
    ap.add_argument("--weighted", action="store_true",
                    help="rank by BM25 x tag-importance (imp/10)")
    ap.add_argument("--batch", default=None, metavar="FILE",
                    help="file with one query per line, all evaluated in "
                         "a single Spark job (wand_topk_batch)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ir_index_construction_spark.sources.catalog import Catalog

    spark = (SparkSession.builder.appName("ir-query")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    cat = Catalog(args.catalog)

    if args.batch is not None:
        from ir_index_construction_spark.operators.topk import wand_topk_batch

        lines = [l.strip() for l in Path(args.batch).read_text().splitlines()]
        queries = {f"q{i:04d}": q for i, q in enumerate(lines) if q}
        stats = cat.read(spark, "stats").collect()[0]
        t0 = time.time()
        rows = wand_topk_batch(
            cat.read(spark, "index"), cat.read(spark, "dictionary"),
            cat.read(spark, "docs"), queries, stats["n_docs"],
            float(stats["avgdl"]), k=args.k, weighted=args.weighted,
        ).orderBy("query_id", "rank").collect()
        elapsed = time.time() - t0
        by_qid: dict = {}
        for r in rows:
            by_qid.setdefault(r["query_id"], []).append(r)
        for qid in sorted(queries):
            print(f"== {queries[qid]}")
            print_results(by_qid.get(qid, []))
        print(f"[{len(queries)} queries in {elapsed * 1000.0:.1f} ms — "
              f"{elapsed * 1000.0 / max(1, len(queries)):.1f} ms/query]")
        return

    if args.query is not None:
        out = run_query(spark, cat, args.query, args.k, args.mode,
                        args.weighted)
        print_results(out.orderBy("rank").collect())
        return

    # REPL (searcher.py:202-219): empty line exits, elapsed ms printed.
    # idf_cache: terms seen once never pay the dictionary-lookup job
    # again (valid for the lifetime of this catalog snapshot).
    idf_cache: dict = {}
    while True:
        try:
            query = input("query> ").strip()
        except EOFError:
            break
        if not query:
            break
        t0 = time.time()
        rows = run_query(spark, cat, query, args.k, args.mode,
                         args.weighted, idf_cache).orderBy("rank").collect()
        elapsed_ms = (time.time() - t0) * 1000.0
        print_results(rows)
        print(f"[{elapsed_ms:.1f} ms]")


if __name__ == "__main__":
    main()
