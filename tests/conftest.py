"""Shared Spark fixtures. One session per test run (startup is ~30s)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from ir_index_construction_spark.session import get_spark

    s = get_spark("ir-engine-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    from ir_index_construction_spark.corpusgen import make_corpus

    return make_corpus(400)


@pytest.fixture(scope="session")
def oracle_index(corpus_rows):
    from tests.oracle import build_index

    return build_index(corpus_rows)


@pytest.fixture(scope="session")
def documents_df(spark, corpus_rows):
    from ir_index_construction_spark.schemas import DOCUMENTS

    return spark.createDataFrame(corpus_rows, DOCUMENTS)


@pytest.fixture(scope="session")
def built(documents_df):
    from ir_index_construction_spark.plans.build import build_tables

    tables = build_tables(documents_df)
    yield tables
    tables.unpersist()


QUERY_SET = [
    "cristina lopes",
    "machine learning",
    "ACM",
    "master of software engineering",
    "commoncrawl",                      # planted head term (skew)
    "learning machine learning",        # repeated non-adjacent term (mult=2)
    "machine AND learning",
    "software AND 2024",
    "machine AND zzzymissing",          # absent AND-term -> []
    "the and of",                        # stopword-only
    "Don't",                             # normalization asymmetry -> []
    "state-of-the-art",
    "20245",                             # filtered token, absent from index
    "",
]
