"""Text-analysis operators for training-data pipelines.

All native Catalyst expressions (whole-stage codegen, no Python):
language-ID by stopword-marker hits, quality scoring, token counting
(whitespace + BPE-ish regex), and a min-hash document fingerprint.
Every operator has an exact DuckDB-SQL oracle (same arithmetic, same
md5-derived hashes), wired in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Marker stopwords per language (tiny, deterministic; real systems use
# char-n-gram models — the *operator shape* is what matters here).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "ich", "mit", "sie"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "was", "on", "are", "as", "with", "he", "they", "at"]

_TOKENS = "split(lower({col}), '\\\\s+')"
_BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _tok_col(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, bpe_ish_tokens, n_chars): whitespace token count +
    a BPE-ish segmentation count (letter runs / digit runs / single
    punctuation — the pre-tokenizer shape most BPE vocabularies use)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(_tok_col(text_col), lambda t: t != "")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_ISH), 0)).alias("bpe_ish_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, <lang>_hits..., lang_pred): marker-stopword hit counts per
    language, argmax with deterministic tie order en>es>de>fr."""
    toks = _tok_col(text_col)
    out = df.select(F.col(id_col).alias("id"), toks.alias("_t"))
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out = out.withColumn(
            f"{lang}_hits",
            F.size(F.filter(F.col("_t"), lambda t: F.array_contains(arr, t))),
        )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"{l}_hits") for l in langs])
    pred = F.when(F.col(f"{langs[0]}_hits") == best, langs[0])
    for l in langs[1:]:
        pred = pred.when(F.col(f"{l}_hits") == best, l)
    return out.select("id", *[f"{l}_hits" for l in langs],
                      pred.alias("lang_pred"))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, avg_token_len, stopword_ratio, digit_ratio, quality).

    quality in [0,1]: length saturation * stopword-plausibility *
    (1 - digit share).  Deterministic arithmetic, exactly reproducible
    in ANSI SQL (the DuckDB oracle uses the same expression)."""
    toks = F.filter(_tok_col(text_col), lambda t: t != "")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    out = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_t"),
        F.length(F.col(text_col)).alias("_chars"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[0-9]"), 0)).alias("_digits"),
    ).withColumn("n_tokens", F.size("_t"))
    out = out.withColumn(
        "avg_token_len",
        F.when(F.col("n_tokens") > 0,
               F.aggregate("_t", F.lit(0), lambda a, t: a + F.length(t))
               .cast("double") / F.col("n_tokens")).otherwise(F.lit(0.0)),
    ).withColumn(
        "stopword_ratio",
        F.when(F.col("n_tokens") > 0,
               F.size(F.filter("_t", lambda t: F.array_contains(sw, t)))
               .cast("double") / F.col("n_tokens")).otherwise(F.lit(0.0)),
    ).withColumn(
        "digit_ratio",
        F.when(F.col("_chars") > 0,
               F.col("_digits").cast("double") / F.col("_chars"))
        .otherwise(F.lit(0.0)),
    )
    quality = (
        F.least(F.col("n_tokens").cast("double") / F.lit(64.0), F.lit(1.0))
        * F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0))
        * (F.lit(1.0) - F.least(F.col("digit_ratio") * F.lit(2.0), F.lit(1.0)))
    )
    return out.select("id", "n_tokens", "avg_token_len", "stopword_ratio",
                      "digit_ratio", F.round(quality, 6).alias("quality"))


def fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 4) -> DataFrame:
    """(id, fp STRING): min-hash sketch fingerprint — the k smallest
    md5-derived token hashes, hyphen-joined.  Shift/word-order robust,
    cross-engine exact (md5 everywhere)."""
    toks = F.array_distinct(F.filter(_tok_col(text_col), lambda t: t != ""))
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.concat_ws("-", F.slice(F.array_sort(hashes), 1, k).cast("array<string>"))
        .alias("fp"),
    )
