"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (BM25 top-10 over the sf0.001
documents table).  ``queries()``/``oracle_sql()`` expose one entry per
implemented operator family from SURVEY.md §2 plus the training-data
pipeline operators; see ir_index_construction_spark/entry_queries.py for
the implementations and the oracle-parity conventions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ir_index_construction_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 (tokenize ->
    postings -> df/idf -> score -> TakeOrdered), all-native plan."""
    return _eq.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
