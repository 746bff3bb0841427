"""Deterministic sampling / dataset-split operators.

A training-data pipeline needs reproducible, cluster-order-independent
answers to "which split is this doc in?" and "sample x% of stratum S":
the assignment must be a pure function of the doc id (stable across
reruns, repartitions, and engine versions), never `rand()` or
`df.sample` (both depend on partitioning and task scheduling).

Both operators hash the id with the md5-derived 64-bit hash shared with
the dedup family (`dedup._hash64`), reduce it mod 1e6 to an integer
bucket, and compare against integer thresholds — exactly reproducible
in ANSI SQL (DuckDB oracles q39/q40 mirror the arithmetic literally).
Everything is a native row-local expression: no shuffle, no UDF, and at
100 TB the split is a predicate the scan can evaluate (a filter on
`split = 'train'` never materializes the other splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _hash64

DENOM = 1_000_000


def _bucket(id_col: str, seed: int):
    """Uniform integer bucket in [0, DENOM) — a pure function of
    (seed, id).  Different seeds give independent assignments, so a
    split and a sample over the same corpus don't correlate."""
    return F.pmod(_hash64(F.col(id_col).cast("string"), seed),
                  F.lit(DENOM)).cast("long")


def split_bounds(weights: dict, denom: int = DENOM) -> list:
    """Cumulative integer thresholds for the named weights (normalized);
    the last split takes the remainder, so the bounds list has
    len(weights) - 1 entries.  Shared by the Spark expression and the
    SQL oracle so boundary docs can't disagree."""
    total = float(sum(weights.values()))
    bounds, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        bounds.append(int(round(cum * denom)))
    return bounds


def deterministic_split(df: DataFrame, id_col: str,
                        weights: dict | None = None,
                        seed: int = 13) -> DataFrame:
    """(id, bucket, split): hash-based train/val/test assignment.
    weights default to {train: 0.9, val: 0.05, test: 0.05}.  Exact
    proportions hold in expectation per stratum (hash uniformity), and
    the assignment of any given id never changes as the corpus grows —
    the property `rand()`-based splits lack."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(weights)
    bounds = split_bounds(weights)
    u = _bucket(id_col, seed)
    split = F.when(u < F.lit(bounds[0]), F.lit(names[0]))
    for i in range(1, len(bounds)):
        split = split.when(u < F.lit(bounds[i]), F.lit(names[i]))
    split = split.otherwise(F.lit(names[-1]))
    return df.select(F.col(id_col).alias("id"), u.alias("bucket"),
                     split.alias("split"))


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      rates: dict, seed: int = 29,
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row of stratum s with probability rates[s] (data-mixing:
    'keep 50% of en, 10% of fr, drop zh').  Deterministic per id; strata
    absent from `rates` use default_rate.  Pure filter — pushes down to
    the scan, samples no partition boundaries, and reruns yield the
    identical row set."""
    u = _bucket(id_col, seed)
    rate = F.lit(int(round(default_rate * DENOM)))
    for s, r in rates.items():
        rate = F.when(F.col(stratum_col) == F.lit(s),
                      F.lit(int(round(r * DENOM)))).otherwise(rate)
    return df.withColumn("bucket", u).filter(F.col("bucket") < rate)
