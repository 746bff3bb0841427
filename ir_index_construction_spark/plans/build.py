"""Index build pipeline.

``build_tables`` is the in-memory logical pipeline (documents ->
docs/postings/dictionary/stats DataFrames).  The persisted, resumable,
checkpointed build over the compressed index lives in
``sources.catalog`` + ``builder`` (added with the index encoder).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..operators.corpus import ingest
from ..operators.postings import (
    dictionary_table,
    docs_table,
    postings_from_tokenized,
    stats_table,
    tokenize,
)


@dataclass
class BuiltTables:
    docs: DataFrame
    postings: DataFrame
    dictionary: DataFrame
    n_docs: int
    avgdl: float
    _handles: tuple = ()

    def unpersist(self):
        for h in self._handles:
            try:
                h.unpersist()
            except Exception:
                pass


def build_tables(documents: DataFrame, persist: bool = True) -> BuiltTables:
    """documents -> (docs, postings, dictionary) + scalar stats.

    Plan shape (two Python crossings, one wide shuffle):
      scan -> url UDF -> native filters -> window dedup (shuffle on url)
      -> two-pass dense ids (persisted) -> fused extract+tokenize UDF
      -> explode -> postings (persisted; feeds dictionary agg, index
      encoder, and query scans without recomputing extraction).
    """
    with_ids, handle = ingest(documents)
    tokenized = tokenize(with_ids)
    postings = postings_from_tokenized(tokenized)
    docs = docs_table(tokenized)
    if persist:
        postings = postings.persist()
        docs = docs.persist()
    dictionary = dictionary_table(postings)
    stats = stats_table(docs).collect()[0]
    return BuiltTables(
        docs=docs,
        postings=postings,
        dictionary=dictionary,
        n_docs=stats["n_docs"],
        avgdl=float(stats["avgdl"]),
        _handles=(handle, postings, docs) if persist else (handle,),
    )
