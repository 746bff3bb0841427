"""Benchmark decontamination: drop training documents that overlap an
evaluation set.

The standard contamination filter (GPT-3 appendix C / PaLM / Llama
training reports): a training document is contaminated if it shares any
n-token span (n=13 is the usual choice) with a benchmark document.

Scale shape — the benchmark side is SMALL (eval suites are millions of
n-grams at most) and the corpus side is the 100 TB table, so:

  1. benchmark -> distinct n-gram strings (tiny, broadcast)
  2. corpus    -> explode per-doc n-grams (row-local transform, then
                  one Generate — no shuffle before the join)
  3. broadcast LEFT SEMI join corpus n-grams against the benchmark set
     (no shuffle of the corpus side at all), then one map-side-combined
     count per doc

The join key is the raw n-gram string here so the DuckDB oracle (q42)
is trivially exact; at petabyte scale you'd join on xxhash64(ngram) to
cut shuffle-free probe width — same plan, narrower key.  The corpus
n-grams are lowercase whitespace tokens joined by single spaces, the
same token lane every textstats operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import _tok_col


def _ngram_arr(n: int, tok_col: str = "_t"):
    """Array of n-token shingle strings over an array<string> column.
    sequence(0, -1) would yield [0,-1] (descending inference), so short
    docs are guarded explicitly — same guard as repetition_signals."""
    return F.expr(
        f"CASE WHEN size({tok_col}) >= {n} THEN "
        f"transform(sequence(0, size({tok_col}) - {n}), "
        f"i -> concat_ws(' ', slice({tok_col}, i + 1, {n}))) "
        f"ELSE cast(array() AS array<string>) END")


def ngram_shingles(df: DataFrame, id_col: str, text_col: str,
                   n: int = 13) -> DataFrame:
    """(id, ngram): one row per n-token shingle of each document."""
    toks = F.filter(_tok_col(text_col), lambda t: t != "")
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_t"))
        .select("id", F.explode(_ngram_arr(n)).alias("ngram"))
    )


def contaminated_docs(corpus: DataFrame, benchmark: DataFrame,
                      id_col: str, text_col: str,
                      bench_text_col: str | None = None,
                      n: int = 13) -> DataFrame:
    """(id, n_hits): corpus documents sharing >= 1 n-gram with the
    benchmark, with the number of distinct overlapping shingles.

    benchmark is any DataFrame with a text column (bench_text_col,
    default = text_col); it is reduced to its distinct n-gram set and
    broadcast, so the corpus side never shuffles before aggregation.
    """
    bench_ngrams = (
        ngram_shingles(benchmark, id_col, bench_text_col or text_col, n)
        .select("ngram").distinct()
    )
    # semi-join BEFORE the distinct: only matched shingles (rare) ever
    # shuffle; the full corpus n-gram stream stays map-side
    hits = (
        ngram_shingles(corpus, id_col, text_col, n)
        .join(F.broadcast(bench_ngrams), "ngram", "left_semi")
        .select("id", "ngram").distinct()
    )
    return hits.groupBy("id").agg(F.count("*").cast("long").alias("n_hits"))
