"""Targeted document removal: merge-on-read tombstones + atomic purge.

A web-scale corpus must support removing specific documents after the
fact — takedown notices, robots.txt retractions, GDPR erasure — without
rewriting a 100 TB table per request.  This module implements the
Iceberg-style split the reference pipeline has no answer for (its
JSONL partitions can only be rebuilt wholesale):

- ``tombstone_urls`` resolves the urls to the doc_ids CURRENTLY
  indexed for them and commits those ids to a tiny ``doc_tombstones``
  table — one manifest commit, zero data rewritten.  Keying by doc_id
  (not url) means a later re-crawl of the same url gets a fresh id and
  is NOT retro-deleted; only the documents visible at request time are.
- ``live_docs`` / ``live_postings`` are the merge-on-read views: the
  stored table anti-joined against the broadcast tombstone set.  The
  tombstone side is bounded by takedown volume (thousands), so the
  filter is a broadcast-hash anti-join that adds no shuffle to a scan
  of any size.
- ``purge_tombstones`` is the merge-on-write step maintenance runs at
  leisure: rewrite docs AND postings without the tombstoned ids and
  truncate the tombstone table, all in ONE catalog transaction — a
  crash at any instant leaves either the old state (tombstones intact,
  rows masked by the views) or the new (rows physically gone), never a
  half-purge where postings survive their doc row.  Old snapshots'
  files are reclaimed by ``Catalog.expire_snapshots`` + ``vacuum``,
  which is what makes erasure COMPLETE on disk, not just invisible.
"""

from __future__ import annotations

import datetime as _dt
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import TOMBSTONES
from ..sources.catalog import Catalog


def tombstone_urls(spark: SparkSession, catalog: Catalog, urls: list,
                   reason: str = "takedown") -> int:
    """Mark every doc currently indexed for ``urls`` as deleted.
    Returns the number of doc_ids tombstoned (0 if none matched; no
    commit happens then).  Already-tombstoned ids are not re-added."""
    if not urls or not catalog.table_exists("docs"):
        return 0
    url_df = spark.createDataFrame([(u,) for u in urls], "url string")
    hits = (catalog.read(spark, "docs")
            .join(F.broadcast(url_df), "url")
            .select("doc_id", "url"))
    if catalog.table_exists("doc_tombstones"):
        existing = catalog.read(spark, "doc_tombstones").select("doc_id")
        hits = hits.join(F.broadcast(existing), "doc_id", "left_anti")
    rows = hits.collect()                    # bounded by takedown volume
    if not rows:
        return 0
    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    catalog.transaction().append_rows(
        spark, "doc_tombstones",
        [(r["doc_id"], r["url"], now, reason) for r in rows],
        TOMBSTONES).commit()
    return len(rows)


def _masked(spark: SparkSession, catalog: Catalog, table: str) -> DataFrame:
    df = catalog.read(spark, table)
    if not catalog.table_exists("doc_tombstones"):
        return df
    ids = catalog.read(spark, "doc_tombstones").select("doc_id").distinct()
    return df.join(F.broadcast(ids), "doc_id", "left_anti")


def live_docs(spark: SparkSession, catalog: Catalog) -> DataFrame:
    """docs minus tombstoned ids (broadcast anti-join, shuffle-free)."""
    return _masked(spark, catalog, "docs")


def live_postings(spark: SparkSession, catalog: Catalog) -> DataFrame:
    """postings minus tombstoned ids (broadcast anti-join)."""
    return _masked(spark, catalog, "postings")


def purge_tombstones(spark: SparkSession, catalog: Catalog,
                     fault: Callable | None = None) -> int:
    """Physically rewrite docs + postings without tombstoned ids and
    empty the tombstone table — one atomic transaction.  Returns the
    number of doc_ids purged.  ``fault`` (tests only) runs just before
    the commit: the torn window must leave the OLD state fully intact."""
    if not catalog.table_exists("doc_tombstones"):
        return 0
    tomb = catalog.read(spark, "doc_tombstones").select("doc_id").distinct()
    n = tomb.count()
    if n == 0:
        return 0
    txn = catalog.transaction()
    txn.write(live_docs(spark, catalog), "docs")
    if catalog.table_exists("postings"):
        txn.write(live_postings(spark, catalog), "postings")
    txn.write(spark.createDataFrame([], TOMBSTONES), "doc_tombstones")
    if fault is not None:
        fault()
    txn.commit()
    return n
