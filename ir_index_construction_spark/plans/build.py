"""Index build pipeline.

``build_tables`` is the in-memory logical pipeline (documents ->
docs/postings/dictionary/stats DataFrames).  The persisted, resumable,
checkpointed build over the compressed index lives in
``sources.catalog`` + ``builder`` (added with the index encoder).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..operators.corpus import dedup_assign_ids, defrag_and_filter
from ..operators.postings import (
    dictionary_table,
    docs_table,
    postings_from_tokenized,
    stats_table,
    tokenize_corpus,
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
                h.unpersist(blocking=True)
            except Exception:
                pass


def build_tables(documents: DataFrame, persist: bool = True) -> BuiltTables:
    """documents -> (docs, postings, dictionary) + scalar stats.

    Plan shape — TOKENIZE-FIRST with a projected id pass (SURVEY.md
    §3.1; the design that holds at 100 TB: raw html is read once from
    parquet and never shuffled or cached, and nothing heavier than
    (url, warc_ts) ever enters the id machinery):

      id pass   scan (url, warc_ts ONLY — column pruning skips html)
                -> url UDF -> native filters -> range-partition dedup +
                dense-id Arrow pass over the tiny projection
                => key_ids(url, warc_ts, doc_id), first occurrence per url
      extract   scan -> url UDF -> native filters
                -> fused extract+tokenize UDF (emit_text=False: neither
                html nor full text ever crosses Arrow outward) [narrow]
      attach    join tok_raw with key_ids on (url, warc_ts) — inner join
                drops duplicate-url occurrences; Catalyst/AQE picks
                broadcast at small scale (no shuffle of the fat side at
                all) or a shuffled join at cluster scale (the tokenized
                rows, 5-10x smaller than html, shuffle exactly once)
      persist   with_ids (dl, terms, doc_id) -> explode -> postings.

    Duplicate urls (<~5% of a crawl) are extracted redundantly before
    the join drops them — cheaper than shuffling every page's html just
    to dedup first.
    """
    cleaned = defrag_and_filter(documents)
    key_stats: dict = {}
    key_ids, handle = dedup_assign_ids(
        cleaned.select("url", "warc_ts"), ["url", "warc_ts"],
        stats_out=key_stats, cache_input=True)
    tok_raw = tokenize_corpus(cleaned)
    # exact re-fetches (identical url AND warc_ts) collapse to ONE key_ids
    # row but would match the inner join twice, duplicating the doc's
    # postings; dedup the attach side on the join key — but ONLY when the
    # id pass actually saw a duplicate key (measured for free on its own
    # shuffle): the common path keeps the zero-extra-shuffle attach, the
    # pathological path pays one dedup exchange that the join then reuses
    # (same keys).  The survivor is DETERMINISTIC (round-2 ADVICE): rows
    # sharing (url, warc_ts) but carrying different html — dirty crawl
    # data, not a true re-fetch — are ordered by a content hash of their
    # tokenized output, so the same input yields the same postings under
    # any partitioning.  (True re-fetches have identical terms, so any
    # survivor is identical anyway; a 2^-64 hash collision between
    # DIFFERENT contents is the accepted residual.)
    if key_stats["n_rows"] > key_stats["n_distinct_keys"]:
        w = Window.partitionBy("url", "warc_ts").orderBy(
            F.xxhash64("dl", "terms").asc())
        tok_raw = (tok_raw.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
    with_ids = tok_raw.join(key_ids, ["url", "warc_ts"], "inner")
    if persist:
        with_ids = with_ids.persist()
    postings = postings_from_tokenized(with_ids)
    docs = docs_table(with_ids)
    dictionary = dictionary_table(postings)
    stats = stats_table(docs).collect()[0]
    if persist:
        # with_ids is materialized (stats ran); the id-pass cache is now
        # redundant — free it synchronously so repeated builds in one
        # session don't accumulate heap
        handle.unpersist(blocking=True)
    return BuiltTables(
        docs=docs,
        postings=postings,
        dictionary=dictionary,
        n_docs=stats["n_docs"],
        avgdl=float(stats["avgdl"]),
        _handles=(with_ids,) if persist else (handle,),
    )
