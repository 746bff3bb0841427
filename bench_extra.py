"""Per-operator isolation bench + explain capture (round 6 optimization).

bench.py is FROZEN for measurement; this harness reproduces its setup
(same corpus, same IndexConfig, same query sets) so individual operators
can be timed in isolation (guide §1.4: noop sink / collect, labelled
jobs) and their executed plans dumped for the plans/r06/ deliverable.

Usage:
    python bench_extra.py [op ...]             # time + explain the ops
    SPARK_GRAFT_PLANS_DIR=plans/r06 SPARK_GRAFT_PLANS_SUFFIX=_before \
        python bench_extra.py knn_ivf source_cap ...

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py;
     SPARK_GRAFT_PLANS_DIR: where to write <op><suffix>.txt explains
     SPARK_GRAFT_EXTRA_REPS (default 3): timing reps per op.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from ir_index_construction_spark.config import BM25Config, IndexConfig
from ir_index_construction_spark.session import get_spark

REFERENCE_QUERIES = ["cristina lopes", "machine learning", "ACM",
                     "master of software engineering"]

PLANS_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR")
SUFFIX = os.environ.get("SPARK_GRAFT_PLANS_SUFFIX", "")
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "3"))


def dump_plan(name: str, df):
    if not PLANS_DIR:
        return
    os.makedirs(PLANS_DIR, exist_ok=True)
    p = os.path.join(PLANS_DIR, f"{name}{SUFFIX}.txt")
    with open(p, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])

    spark = get_spark("ir-bench-extra", cpus=cpus,
                      shuffle_partitions=max(4 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    timings: dict = {}

    def timed(name, fn, reps=REPS):
        if only and name not in only:
            return
        sc.setJobDescription(name)
        laps = []
        out = None
        for _ in range(max(1, reps)):
            t0 = time.time()
            out = fn()
            laps.append(round(time.time() - t0, 4))
        sc.setJobDescription(None)
        timings[name] = laps
        print(f"{name}: {laps}", flush=True)
        return out

    def want(name):
        return not only or name in only

    # ---- corpus + index identical to bench.py ----
    n_docs_target = 12000
    if "0.001" in sf_dir:
        n_docs_target = 400
    elif "0.01" in sf_dir:
        n_docs_target = 2000
    if env := os.environ.get("SPARK_GRAFT_BENCH_DOCS"):
        n_docs_target = int(env)

    staged = os.environ.get("SPARK_GRAFT_CORPUS_DIR")
    if staged:
        corpus_path = staged
    else:
        corpus_path = os.path.join(
            tempfile.mkdtemp(prefix="ir_bench_extra_"), "corpus")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        import bench
        bench.generate_corpus(spark, n_docs_target, corpus_path)

    from ir_index_construction_spark.operators.compress import (
        build_compressed_index)
    from ir_index_construction_spark.operators.topk import (
        wand_topk, wand_topk_batch)
    from ir_index_construction_spark.plans.build import build_tables
    from ir_index_construction_spark.plans.query import bm25_topk_exhaustive

    cfg = IndexConfig(shard_size=4096, block_size=128, chunk_blocks=256,
                      salt_buckets=4, term_buckets=max(cpus, 8))

    need_index = not only or bool(only & {
        "index_build", "wand", "exhaustive", "wand_batch100", "wildcard",
        "bool_expr", "fuzzy", "mlt", "phrase", "phrase_batch50",
        "build_phase_tokenize", "build_phase_ids", "build_phase_encode"})

    built = index = None
    if need_index:
        # phase isolation for the build (guide §1: find where the time goes)
        docs_df = spark.read.parquet(corpus_path)
        if want("build_phase_ids"):
            from ir_index_construction_spark.operators.corpus import (
                dedup_assign_ids, defrag_and_filter)

            def ids_pass():
                cleaned = defrag_and_filter(docs_df)
                key_ids, h = dedup_assign_ids(
                    cleaned.select("url", "warc_ts"), ["url", "warc_ts"],
                    cache_input=True)
                n = key_ids.count()
                h.unpersist(blocking=True)
                return n
            timed("build_phase_ids", ids_pass, reps=2)
        if want("build_phase_tokenize"):
            from ir_index_construction_spark.operators.corpus import (
                defrag_and_filter)
            from ir_index_construction_spark.operators.postings import (
                tokenize_corpus)

            def tok_pass():
                (tokenize_corpus(defrag_and_filter(docs_df))
                 .write.format("noop").mode("overwrite").save())
            timed("build_phase_tokenize", tok_pass, reps=2)

        def full_build():
            b = build_tables(docs_df)
            ix = build_compressed_index(b.postings, b.avgdl,
                                        BM25Config(), cfg)
            ix.write.format("noop").mode("overwrite").save()
            b.unpersist()
            return b
        timed("index_build", full_build, reps=2)

        built = build_tables(docs_df)
        index = build_compressed_index(built.postings, built.avgdl,
                                       BM25Config(), cfg).persist()
        index.count()
        built.dictionary = built.dictionary.persist()
        built.dictionary.count()

    idf_cache: dict = {}
    if need_index:
        for q in REFERENCE_QUERIES:
            wand_topk(index, built.dictionary, built.docs, q,
                      built.n_docs, built.avgdl, k=10,
                      idf_cache=idf_cache).collect()
        bm25_topk_exhaustive(built.postings, built.dictionary, built.docs,
                             REFERENCE_QUERIES[0], built.n_docs,
                             built.avgdl, k=10, idf_cache=idf_cache).collect()

    if want("wand"):
        df = wand_topk(index, built.dictionary, built.docs,
                       REFERENCE_QUERIES[0], built.n_docs, built.avgdl,
                       k=10, idf_cache=idf_cache)
        dump_plan("wand", df)
        timed("wand", lambda: wand_topk(
            index, built.dictionary, built.docs, REFERENCE_QUERIES[0],
            built.n_docs, built.avgdl, k=10, idf_cache=idf_cache).collect())
    if want("exhaustive"):
        df = bm25_topk_exhaustive(built.postings, built.dictionary,
                                  built.docs, REFERENCE_QUERIES[0],
                                  built.n_docs, built.avgdl, k=10,
                                  idf_cache=idf_cache)
        dump_plan("exhaustive", df)
        timed("exhaustive", lambda: bm25_topk_exhaustive(
            built.postings, built.dictionary, built.docs,
            REFERENCE_QUERIES[0], built.n_docs, built.avgdl, k=10,
            idf_cache=idf_cache).collect())

    if want("wand_batch100"):
        import random as _random
        head_terms = [r["term"] for r in
                      built.dictionary.orderBy(F.col("df").desc())
                      .limit(300).select("term").collect()]
        rng = _random.Random(7)
        pre100 = {
            f"w{i:03d}": (rng.sample(head_terms, rng.choice([2, 3])), False)
            for i in range(100)
        }
        q100 = {qid: " ".join(t) for qid, (t, _) in pre100.items()}
        df = wand_topk_batch(index, built.dictionary, built.docs, q100,
                             built.n_docs, built.avgdl, k=10,
                             pre_parsed=pre100)
        dump_plan("wand_batch100", df)
        df.collect()           # warmup
        timed("wand_batch100", lambda: wand_topk_batch(
            index, built.dictionary, built.docs, q100, built.n_docs,
            built.avgdl, k=10, pre_parsed=pre100).collect())

    if want("bool_expr"):
        from ir_index_construction_spark.plans.boolquery import (
            bool_query_topk)
        bq = "(machine OR learning) AND NOT research"
        df = bool_query_topk(built.postings, built.dictionary, built.docs,
                             bq, built.n_docs, built.avgdl, k=10,
                             idf_cache=idf_cache)
        dump_plan("bool_expr", df)
        df.collect()
        timed("bool_expr", lambda: bool_query_topk(
            built.postings, built.dictionary, built.docs, bq,
            built.n_docs, built.avgdl, k=10, idf_cache=idf_cache).collect())

    if want("phrase") or want("phrase_batch50"):
        import random as _random
        from ir_index_construction_spark.operators.corpus import ingest
        from ir_index_construction_spark.operators.postings import (
            docs_table, positions_from_tokenized, tokenize)
        from ir_index_construction_spark.plans.query import (
            phrase_topk_batch, phrase_topk_indexed)

        t0 = time.time()
        with_ids, _h = ingest(spark.read.parquet(corpus_path))
        tokp = tokenize(with_ids, positions=True)
        positions = positions_from_tokenized(tokp).persist()
        positions.count()
        pdocs = docs_table(tokp).persist()
        pdocs.count()
        _h.unpersist()
        timings["positions_build"] = [round(time.time() - t0, 4)]
        print(f"positions_build: {timings['positions_build']}", flush=True)

        if want("phrase"):
            ph_cache: dict = {}
            ph = "research development"
            df = phrase_topk_indexed(positions, pdocs, ph, built.n_docs,
                                     built.avgdl, k=10, df_cache=ph_cache)
            dump_plan("phrase", df)
            df.collect()
            timed("phrase", lambda: phrase_topk_indexed(
                positions, pdocs, ph, built.n_docs, built.avgdl, k=10,
                df_cache=ph_cache).collect())
        if want("phrase_batch50"):
            head_terms = [r["term"] for r in
                          built.dictionary.orderBy(F.col("df").desc())
                          .limit(300).select("term").collect()]
            rng_ph = _random.Random(11)
            pre_ph = {f"ph{i:02d}": rng_ph.sample(head_terms, 2)
                      for i in range(50)}
            qs = {q: " ".join(t) for q, t in pre_ph.items()}
            timed("phrase_batch50", lambda: phrase_topk_batch(
                positions, pdocs, qs, built.n_docs, built.avgdl, k=10,
                pre_parsed=pre_ph).collect())

    # ---- training-data operators on the driver-provided tables ----
    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb_tbl = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    from ir_index_construction_spark.operators.dedup import (
        duplicate_clusters, exact_duplicates, minhash_lsh_pairs, simhash_64)
    from ir_index_construction_spark.operators.similarity import (
        cosine_topk_bruteforce, ivf_topk, lsh_bucketed_topk)
    from ir_index_construction_spark.operators.textstats import (
        language_id, quality_score, token_counts)

    if want("dedup_exact"):
        df = exact_duplicates(docs_tbl, "doc_id", "text")
        dump_plan("dedup_exact", df)
        timed("dedup_exact", lambda: exact_duplicates(
            docs_tbl, "doc_id", "text").count())
    if want("dedup_minhash_lsh"):
        df = minhash_lsh_pairs(docs_tbl, "doc_id", "text", threshold=0.5)
        dump_plan("dedup_minhash_lsh", df)
        timed("dedup_minhash_lsh", lambda: minhash_lsh_pairs(
            docs_tbl, "doc_id", "text", threshold=0.5).count())
    if want("dedup_simhash"):
        df = simhash_64(docs_tbl, "doc_id", "text")
        dump_plan("dedup_simhash", df)
        timed("dedup_simhash", lambda: simhash_64(
            docs_tbl, "doc_id", "text").count())
    if want("dedup_cluster"):
        dup_pairs = minhash_lsh_pairs(docs_tbl, "doc_id", "text",
                                      threshold=0.5).persist()
        dup_pairs.count()
        timed("dedup_cluster",
              lambda: duplicate_clusters(dup_pairs).count())
        dup_pairs.unpersist()

    qvec = [float(x) for x in
            emb_tbl.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    if want("knn_bruteforce"):
        df = cosine_topk_bruteforce(emb_tbl, "vec_id", "embedding", qvec,
                                    k=10)
        dump_plan("knn_bruteforce", df)
        timed("knn_bruteforce", lambda: cosine_topk_bruteforce(
            emb_tbl, "vec_id", "embedding", qvec, k=10).collect())
    if want("knn_lsh"):
        df = lsh_bucketed_topk(emb_tbl, "vec_id", "embedding", qvec, k=10)
        dump_plan("knn_lsh", df)
        timed("knn_lsh", lambda: lsh_bucketed_topk(
            emb_tbl, "vec_id", "embedding", qvec, k=10).collect())
    if want("knn_ivf"):
        df = ivf_topk(emb_tbl, "vec_id", "embedding", qvec, k=10)
        dump_plan("knn_ivf", df)
        timed("knn_ivf", lambda: ivf_topk(
            emb_tbl, "vec_id", "embedding", qvec, k=10).collect())

    if want("langid"):
        timed("langid", lambda: language_id(
            docs_tbl, "doc_id", "text").count())
    if want("quality"):
        timed("quality", lambda: quality_score(
            docs_tbl, "doc_id", "text").count())
    if want("quality_noop"):
        # count() prunes the computed columns; the noop sink forces the
        # full quality expression per guide §1.4 — the cost source_cap
        # actually pays
        df = quality_score(docs_tbl, "doc_id", "text",
                           keep_cols=("source",))
        dump_plan("quality_noop", df)
        timed("quality_noop", lambda: quality_score(
            docs_tbl, "doc_id", "text", keep_cols=("source",))
            .write.format("noop").mode("overwrite").save())

    if want("source_cap"):
        from ir_index_construction_spark.operators.sampling import (
            cap_per_key, token_budget_sample)
        df = cap_per_key(
            quality_score(docs_tbl, "doc_id", "text", keep_cols=("source",)),
            "source", [F.col("quality").desc(), F.col("id").asc()],
            n=10, id_col="id")
        dump_plan("source_cap", df)
        timed("source_cap", lambda: cap_per_key(
            quality_score(docs_tbl, "doc_id", "text", keep_cols=("source",)),
            "source", [F.col("quality").desc(), F.col("id").asc()],
            n=10, id_col="id").count())
    if want("token_budget"):
        from ir_index_construction_spark.operators.sampling import (
            token_budget_sample)
        df = token_budget_sample(
            token_counts(docs_tbl, "doc_id", "text", keep_cols=("source",)),
            "source", "ws_tokens", "id", 600)
        dump_plan("token_budget", df)
        timed("token_budget", lambda: token_budget_sample(
            token_counts(docs_tbl, "doc_id", "text", keep_cols=("source",)),
            "source", "ws_tokens", "id", 600).count())

    if want("repetition"):
        from ir_index_construction_spark.operators.textstats import (
            repetition_signals)
        timed("repetition", lambda: repetition_signals(
            docs_tbl, "doc_id", "text").count())
    if want("source_stats"):
        from ir_index_construction_spark.operators.textstats import (
            source_stats)
        timed("source_stats", lambda: source_stats(docs_tbl).count())

    # ---- streaming drains (the VERDICT #1 extras) ----
    if want("stream_drain") or want("stream_drain_seg"):
        import shutil as _shutil
        from ir_index_construction_spark.sources.catalog import Catalog
        from ir_index_construction_spark.streaming import (
            incremental_index_update)

        for tag, maintain in (("stream_drain", False),
                              ("stream_drain_seg", True)):
            if not want(tag):
                continue
            laps = []
            for _ in range(2):
                sdir = tempfile.mkdtemp(prefix="ir_extra_stream_")
                cat = Catalog(os.path.join(sdir, "cat"))
                sc.setJobDescription(tag)
                t0 = time.time()
                incremental_index_update(
                    spark, cat, corpus_path, os.path.join(sdir, "ck"),
                    maintain_index=maintain,
                    index_cfg=cfg if maintain else IndexConfig())
                laps.append(round(time.time() - t0, 4))
                sc.setJobDescription(None)
                _shutil.rmtree(sdir, ignore_errors=True)
            timings[tag] = laps
            print(f"{tag}: {laps}", flush=True)

    print(json.dumps({"timings": timings, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
