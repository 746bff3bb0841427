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

    Plan shape (two Python crossings, ONE corpus shuffle):
      scan -> url UDF -> native filters -> range-partition on url
      (fused dedup + dense ids, single shuffle) -> fused extract+tokenize
      UDF -> persist TOKENIZED (the expensive Python output; postings and
      docs both derive from it narrowly, so extraction runs exactly once)
      -> explode -> postings.  The heavy `text` column is dropped before
      caching — the build never reads it (the extraction-invariant checks
      use the UDF directly).
    """
    with_ids, handle = ingest(documents)
    tokenized = tokenize(with_ids).drop("text")
    if persist:
        tokenized = tokenized.persist()
    postings = postings_from_tokenized(tokenized)
    docs = docs_table(tokenized)
    dictionary = dictionary_table(postings)
    stats = stats_table(docs).collect()[0]
    if persist:
        handle.unpersist()      # tokenized cache supersedes the sorted corpus
    return BuiltTables(
        docs=docs,
        postings=postings,
        dictionary=dictionary,
        n_docs=stats["n_docs"],
        avgdl=float(stats["avgdl"]),
        _handles=(tokenized,) if persist else (handle,),
    )
