"""PII detection and redaction for training-data pipelines.

A web-scale text pipeline scrubs personally-identifiable information
before training: emails, phone numbers, IP addresses.  Both operators
are pure per-row native expressions (regexp_extract_all /
regexp_replace inside whole-stage codegen — no Python, no shuffle) that
APPEND columns to their input, so detect -> redact -> route composes
into a single codegen'd pass over the text bytes regardless of corpus
size, and `has_pii` is a pushdown-able predicate for a downstream
drop/route filter.

The patterns are deliberately RE2-compatible (no backreferences, no
lookaround) so the exact same pattern strings run on Spark's Java regex
engine and DuckDB's RE2 — the q41 oracle re-runs them verbatim and
hash-compares counts AND the md5 of the redacted text.

Real deployments swap in richer pattern sets (names/addresses need an
NER model, which would ride the mapInPandas lane the multimodal
features use); the operator shape — count, flag, redact — is what
scales.

Reference parity: the reference pipeline has no PII stage; this extends
the training-data family mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# RE2- and java.util.regex-compatible, identical semantics in both:
# character classes, bounded repetition, non-capturing groups, \b only.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

PII_PATTERNS = [("email", EMAIL_RE), ("phone", PHONE_RE), ("ipv4", IPV4_RE)]


def pii_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Append (n_email, n_phone, n_ipv4, has_pii) to df: per-pattern
    match counts plus an any-hit flag, all row-local."""
    for name, pat in PII_PATTERNS:
        # idx=0 (whole match) explicitly: Spark defaults to group 1,
        # which errors on group-free patterns and would count only the
        # octet group of IPV4_RE otherwise
        df = df.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)))
    flag = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return df.withColumn("has_pii", flag)


def redact_pii(df: DataFrame, text_col: str,
               out_col: str = "redacted") -> DataFrame:
    """Append <out_col>: text with every PII match replaced by a typed
    placeholder (<EMAIL>, <PHONE>, <IPV4>).  Patterns apply in list
    order; each regexp_replace is global, native, and codegen'd."""
    red = F.col(text_col)
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.withColumn(out_col, red)
