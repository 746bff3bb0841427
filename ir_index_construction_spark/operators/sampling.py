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

from pyspark.sql import DataFrame, Window, functions as F

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


def cap_per_key(df: DataFrame, key_col: str, order_cols: list,
                n: int, id_col: str, salts: int = 8) -> DataFrame:
    """Keep at most `n` rows per key, preferring the `order_cols` order
    (domain/source diversification: "at most n docs per domain, best
    quality first").  `order_cols` MUST be a total order (end with a
    unique id tiebreak) or the survivor set is nondeterministic.

    Scale shape: a naive row_number over `partitionBy(key)` puts every
    row of a mega-key in ONE task — the classic skew wall.  This runs
    the salted two-phase form instead: rows first rank within
    (key, salt) where salt = hash(id) % salts, keeping `n` per salt
    group (any global top-n row is top-n within its salt group, so
    phase 1 keeps a superset), then the <= n*salts survivors per key
    rank once more for the final cut.  Phase-2 groups are bounded by
    n*salts regardless of key skew.  Output = input columns + `rank`
    (1-based preference rank within the key).  Result is bit-identical
    to the single-window form — asserted in pytest and by the q45
    DuckDB oracle, which IS the single-window form."""
    salt = F.pmod(_hash64(F.col(id_col).cast("string"), 0xCA9),
                  F.lit(salts))
    w1 = Window.partitionBy(F.col(key_col), salt).orderBy(*order_cols)
    survivors = (df.withColumn("_rn1", F.row_number().over(w1))
                 .filter(F.col("_rn1") <= n).drop("_rn1"))
    w2 = Window.partitionBy(key_col).orderBy(*order_cols)
    return (survivors.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= n))


def token_budget_sample(df: DataFrame, key_col: str, weight_col: str,
                        id_col: str, budget: int,
                        seed: int = 47) -> DataFrame:
    """Greedy per-key prefix under a weight budget (data mixing: "take
    docs from each source until its token budget is spent").  Rows are
    consumed in seeded-hash order (uniform, deterministic, id-stable —
    not arrival order, which would bias toward old crawls), and a row
    is kept while the running weight INCLUDING it stays <= budget.

    Scale shape: one shuffle, partitioned by key; the running sum is a
    per-key ordered window with an explicit ROWS frame (Spark's default
    frame with an ORDER BY is RANGE, which merges ties — the hash+id
    order is total so either frame agrees, but ROWS is stated so the
    DuckDB oracle matches by construction).  For a mega-key whose rows
    dwarf a task, pre-prune with `stratified_sample` at a rate safely
    above budget/total_weight before the window — the hash order makes
    the pruned prefix a superset of the kept prefix.  Output = input
    columns + `cum_weight`."""
    h = _hash64(F.col(id_col).cast("string"), seed)
    w = (Window.partitionBy(key_col)
         .orderBy(h.asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df.withColumn(
        "cum_weight", F.sum(F.col(weight_col).cast("long")).over(w))
    return out.filter(F.col("cum_weight") <= budget)
