"""Term co-occurrence / PMI analytics over the postings relation —
the "related terms" statistic behind query expansion and related-search
suggestions (Manning/Schütze-style pointwise mutual information over
document co-occurrence).

Input is the engine's own postings table (term, doc_id, ...), so this
runs over the same relation the index is built from — no re-tokenize.

Scale shape (the operator is quadratic per document in the naive form,
so the cap is not optional at 100 TB):

  * a df band [min_df, max_df] filters terms BEFORE the self-join —
    the semi-join side is the (tiny) dictionary slice, broadcast.
    Dropping ubiquitous terms (stopwords, boilerplate) is what kills
    the m² blowup: a term in 90% of docs would otherwise pair with
    everything in every doc (same df-cap idea as the n-gram Jaccard
    dedup's boilerplate-shingle cap, operators/dedup.py).
  * the pair generation is one doc_id-keyed self-join with ``term_a <
    term_b`` (each unordered pair once); Catalyst plans it as a single
    shuffle on doc_id, and per-doc work is bounded by the df band.
  * the pair count + PMI is one map-side-combinable hash agg.

PMI(a, b) = ln(n_docs * c_ab / (df_a * df_b)); pairs below ``min_pairs``
co-occurrences are dropped first (PMI is noise at c_ab=1 — the classic
correction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def term_cooccurrence(postings: DataFrame, dictionary: DataFrame,
                      n_docs: int, min_df: int = 2,
                      max_df: int | None = None, min_pairs: int = 2,
                      top_n: int = 100) -> DataFrame:
    """Top-N co-occurring term pairs by PMI.  Returns
    (term_a, term_b, n_both, pmi) with term_a < term_b, ordered
    pmi DESC, term_a ASC, term_b ASC (deterministic cap).

    ``dictionary`` may hold one row per (term, segment): df is summed
    per term first, as everywhere else in the engine."""
    d = dictionary.groupBy("term").agg(F.sum("df").alias("df"))
    band = d.filter(F.col("df") >= min_df)
    if max_df is not None:
        band = band.filter(F.col("df") <= max_df)
    # broadcast the banded dictionary slice into both sides: the term
    # filter reaches the postings scan as a semi-join, and df_a/df_b
    # ride along for the PMI — no second dictionary lookup
    kept = (postings.select("term", "doc_id")
            .join(F.broadcast(band), "term"))
    a = kept.select(F.col("term").alias("term_a"),
                    F.col("df").alias("df_a"), "doc_id")
    b = kept.select(F.col("term").alias("term_b"),
                    F.col("df").alias("df_b"), "doc_id")
    pairs = a.join(b, "doc_id").filter(F.col("term_a") < F.col("term_b"))
    counted = (
        pairs.groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count("*").cast("long").alias("n_both"))
        .filter(F.col("n_both") >= min_pairs)
    )
    pmi = counted.withColumn(
        "pmi",
        F.round(F.log(F.lit(float(n_docs)) * F.col("n_both")
                      / (F.col("df_a") * F.col("df_b"))), 6))
    return (
        pmi.select("term_a", "term_b", "n_both", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("term_a").asc(),
                 F.col("term_b").asc())
        .limit(top_n)
    )


def significant_terms(postings: DataFrame, dictionary: DataFrame,
                      n_docs: int, fg_docs: DataFrame,
                      n_fg: int | None = None, min_fg: int = 2,
                      top_n: int = 10) -> DataFrame:
    """Elasticsearch's significant_terms aggregation with the JLH
    heuristic: terms overrepresented in a FOREGROUND doc set (a query's
    result page, a metadata slice, a near-dup cluster) relative to the
    whole corpus.

        fg_pct = n_fg_term / n_fg        bg_pct = df / n_docs
        jlh    = (fg_pct - bg_pct) * (fg_pct / bg_pct)

    keeping only fg_pct > bg_pct (overrepresented) and n_fg_term >=
    ``min_fg`` (the classic rare-term noise floor).  Returns (term,
    n_fg_term, df, jlh), jlh DESC / term ASC, capped at ``top_n``.

    Scale shape: the foreground set is page/slice-sized by contract, so
    it BROADCASTS into the postings scan (a broadcast semi-ish inner
    join — no shuffle of postings); per-term foreground counts are one
    map-side-combined hash agg over (fg docs x terms/doc) rows; the
    background df arrives by joining the (broadcast, tiny) fg term
    counts INTO the dictionary, pruning the dictionary scan to the
    foreground vocabulary.  ``n_fg`` saves the count job when the
    caller already knows the slice size."""
    spark = postings.sparkSession
    if n_fg is None:
        n_fg = fg_docs.count()
    if n_fg == 0:
        return spark.createDataFrame(
            [], "term string, n_fg_term long, df long, jlh double")
    fg_counts = (
        postings.select("term", "doc_id")
        .join(F.broadcast(fg_docs.select("doc_id")), "doc_id")
        .groupBy("term").agg(F.count("*").cast("long").alias("n_fg_term"))
        .filter(F.col("n_fg_term") >= min_fg)
    )
    d = dictionary.groupBy("term").agg(F.sum("df").alias("df"))
    joined = d.join(F.broadcast(fg_counts), "term")
    fg_pct = F.col("n_fg_term") / F.lit(float(n_fg))
    bg_pct = F.col("df") / F.lit(float(n_docs))
    scored = (
        joined.filter(fg_pct > bg_pct)
        .withColumn("jlh", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6))
    )
    return (
        scored.select("term", "n_fg_term", F.col("df").cast("long").alias("df"),
                      "jlh")
        .orderBy(F.col("jlh").desc(), F.col("term").asc())
        .limit(top_n)
    )


def related_terms(postings: DataFrame, dictionary: DataFrame,
                  n_docs: int, term: str, min_df: int = 2,
                  max_df: int | None = None, min_pairs: int = 2,
                  top_n: int = 10) -> DataFrame:
    """Top partner terms of ONE term by PMI — the "related searches"
    list for a query term.  Cheaper than the all-pairs form: the seed
    term's doc set comes from a term-pruned postings scan (row-group
    stats skip everything else on the term-sorted layout) and joins
    the df-banded postings on doc_id; per-partner counting is one
    map-side-combined hash agg.  The seed's own df may sit outside the
    band (querying a stopword's neighbors is legitimate); partners are
    still band-filtered.  Returns (term_b, n_both, pmi), pmi DESC,
    term_b ASC."""
    d = dictionary.groupBy("term").agg(F.sum("df").alias("df"))
    seed_rows = d.filter(F.col("term") == term).collect()
    if not seed_rows:
        spark = postings.sparkSession
        return spark.createDataFrame(
            [], "term_b string, n_both long, pmi double")
    df_seed = seed_rows[0]["df"]
    seed_docs = (postings.filter(F.col("term") == term)
                 .select("doc_id"))
    band = d.filter((F.col("df") >= min_df) & (F.col("term") != term))
    if max_df is not None:
        band = band.filter(F.col("df") <= max_df)
    partners = (postings.select("term", "doc_id")
                .join(F.broadcast(band), "term")
                .join(seed_docs, "doc_id"))
    counted = (
        partners.groupBy("term", "df")
        .agg(F.count("*").cast("long").alias("n_both"))
        .filter(F.col("n_both") >= min_pairs)
    )
    return (
        counted.withColumn(
            "pmi",
            F.round(F.log(F.lit(float(n_docs)) * F.col("n_both")
                          / (F.lit(float(df_seed)) * F.col("df"))), 6))
        .select(F.col("term").alias("term_b"), "n_both", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("term_b").asc())
        .limit(top_n)
    )
