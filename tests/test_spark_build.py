"""Spark pipeline vs pure-Python oracle: table-level and rank identity."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import QUERY_SET
from tests.oracle import search as oracle_search


def test_docs_table_matches_oracle(built, oracle_index):
    rows = built.docs.orderBy("doc_id").collect()
    assert built.n_docs == oracle_index.n_docs
    assert len(rows) == oracle_index.n_docs
    for r in rows:
        assert oracle_index.doc_url[r["doc_id"]] == r["url"]
        assert oracle_index.doc_len[r["doc_id"]] == r["doc_len"]
    assert abs(built.avgdl - oracle_index.avgdl) < 1e-9


def test_extracted_text_byte_identical(built, documents_df, spark, corpus_rows):
    """North-rule per-row invariant: UDF-extracted text == the corpus
    `text` column (itself produced by the oracle extractor) per url."""
    from ir_index_construction_spark.functions.udfs import extract_text_udf

    got = (
        documents_df.select("url", extract_text_udf("html").alias("t2"), "text")
        .withColumn("same", F.col("t2") == F.col("text"))
        .agg(F.sum(F.when(F.col("same"), 0).otherwise(1)).alias("bad"))
        .collect()[0]["bad"]
    )
    assert got == 0


def test_postings_match_oracle(built, oracle_index):
    rows = built.postings.collect()
    got = {}
    for r in rows:
        key = (r["term"], r["doc_id"])
        assert key not in got, f"duplicate posting {key}"
        got[key] = (r["tf"], r["imp"], r["dl"])
    want = {
        (t, d): (tf, imp, oracle_index.doc_len[d])
        for t, posting in oracle_index.postings.items()
        for d, (tf, imp) in posting.items()
    }
    assert got == want


def test_dictionary_matches_oracle(built, oracle_index):
    rows = built.dictionary.collect()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    want = {
        t: (len(p), sum(tf for tf, _ in p.values()))
        for t, p in oracle_index.postings.items()
    }
    assert got == want


def test_exact_refetch_not_double_counted(spark, corpus_rows):
    """An exact re-fetch (identical url AND warc_ts AND html twice in the
    input) must yield exactly one docs row and one set of postings — the
    attach join dedups on the join key (ADVICE.md: corpusgen never
    generates this case, so it's planted here)."""
    from ir_index_construction_spark.plans.build import build_tables
    from ir_index_construction_spark.schemas import DOCUMENTS

    rows = corpus_rows[:40]
    doubled = rows + [dict(rows[3]), dict(rows[7])]   # exact re-fetches
    dup_urls = {rows[3]["url"], rows[7]["url"]}

    base = build_tables(spark.createDataFrame(rows, DOCUMENTS), persist=False)
    got = build_tables(spark.createDataFrame(doubled, DOCUMENTS), persist=False)
    try:
        assert got.n_docs == base.n_docs
        base_docs = {(r["doc_id"], r["url"], r["doc_len"])
                     for r in base.docs.collect()}
        got_docs = {(r["doc_id"], r["url"], r["doc_len"])
                    for r in got.docs.collect()}
        assert got_docs == base_docs
        dup_ids = [d for d, u, _ in got_docs if u in dup_urls]
        n_base = base.postings.filter(F.col("doc_id").isin(dup_ids)).count()
        n_got = got.postings.filter(F.col("doc_id").isin(dup_ids)).count()
        assert n_base == n_got > 0
    finally:
        base.unpersist()
        got.unpersist()


def test_dirty_duplicate_key_survivor_deterministic(spark, corpus_rows):
    """Two input rows sharing (url, warc_ts) but with DIFFERENT html
    (dirty crawl data) must produce the same surviving postings on every
    run and under any input partitioning (round-2 ADVICE: dropDuplicates
    kept an arbitrary survivor, breaking build determinism)."""
    from ir_index_construction_spark.plans.build import build_tables
    from ir_index_construction_spark.schemas import DOCUMENTS

    rows = [dict(r) for r in corpus_rows[:30]]
    dirty = dict(rows[5])
    dirty["html"] = rows[17]["html"]          # same key, different content
    dirty["text"] = rows[17]["text"]
    doubled = rows + [dirty]

    def posting_set(n_parts):
        df = spark.createDataFrame(doubled, DOCUMENTS).repartition(n_parts)
        built = build_tables(df, persist=False)
        try:
            return sorted(
                (r["term"], r["doc_id"], r["tf"], r["dl"])
                for r in built.postings.collect())
        finally:
            built.unpersist()

    first = posting_set(2)
    assert first == posting_set(7)
    assert first == posting_set(13)


@pytest.mark.parametrize("query", QUERY_SET)
def test_rank_identity_exhaustive(built, oracle_index, query):
    from ir_index_construction_spark.plans.query import bm25_topk_exhaustive

    expected = oracle_search(oracle_index, query, k=10)
    got = bm25_topk_exhaustive(
        built.postings, built.dictionary, built.docs, query,
        built.n_docs, built.avgdl, k=10,
    ).orderBy("rank").collect()

    assert [(r["rank"], r["doc_id"], r["url"]) for r in got] == [
        (rank, d, u) for rank, d, u, _ in expected
    ]
    for r, (_, _, _, score) in zip(got, expected):
        assert math.isclose(r["score"], score, rel_tol=1e-9, abs_tol=1e-12)


@pytest.mark.parametrize("query", QUERY_SET)
def test_rank_identity_exhaustive_weighted(built, oracle_index, query):
    """Importance-weighted BM25 on the flat-postings native plan vs the
    weighted oracle (imp/10 contribution multiplier)."""
    from ir_index_construction_spark.plans.query import bm25_topk_exhaustive

    expected = oracle_search(oracle_index, query, k=10, weighted=True)
    got = bm25_topk_exhaustive(
        built.postings, built.dictionary, built.docs, query,
        built.n_docs, built.avgdl, k=10, weighted=True,
    ).orderBy("rank").collect()

    assert [(r["rank"], r["doc_id"], r["url"]) for r in got] == [
        (rank, d, u) for rank, d, u, _ in expected
    ]
    for r, (_, _, _, score) in zip(got, expected):
        assert math.isclose(r["score"], score, rel_tol=1e-9, abs_tol=1e-12)
