"""Pandas/Arrow UDFs for URL handling and fused extraction+tokenization.

Design note (scale): the O6-O11 chain (HTML parse -> weighted zones ->
normalize -> tokenize -> stem -> filter -> per-doc tf/imp accumulation)
is fused into ONE mapInPandas pass.  Crossing the JVM<->Python boundary
once per document batch and emitting per-doc AGGREGATED term stats
shrinks the downstream shuffle from one row per token occurrence to one
row per distinct (term, doc) — on web text a ~5-10x reduction — and the
per-batch stem memo exploits the Zipf head.  No per-row Python UDFs
anywhere (BASELINE.json input_hint).
"""

from __future__ import annotations

from urllib.parse import urlparse, urlunparse

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from ..text.extract import extract_text, extract_text_and_zones, extract_zones
from ..text.normalize import doc_term_positions, doc_term_stats
from ..text.porter import make_cached_stemmer

_URL_PARTS = StructType([
    StructField("url", StringType(), False),      # defragmented
    StructField("scheme", StringType(), True),
    StructField("path", StringType(), True),
])


@pandas_udf(_URL_PARTS)
def _url_parts(urls: pd.Series) -> pd.DataFrame:
    """Defrag + parse in one Arrow pass.  urlunparse NORMALIZES, so this is
    deliberately not a regex strip — byte-identity with the reference's
    defrag_url (indexer.py:95-107) requires urllib round-tripping."""
    out_url, out_scheme, out_path = [], [], []
    for u in urls:
        p = urlparse(u)
        out_url.append(urlunparse((p.scheme, p.netloc, p.path, p.params, p.query, "")))
        out_scheme.append(p.scheme)
        out_path.append(p.path.lower())
    return pd.DataFrame({"url": out_url, "scheme": out_scheme, "path": out_path})


# marked non-deterministic as an OPTIMIZER FENCE, not because it is
# (it's a pure function): defrag_and_filter filters on fields of the
# UDF's struct, and the optimizer pushes that filter below the
# projection by RE-EVALUATING the UDF — the executed plan carried TWO
# ArrowEvalPython nodes for one call (guide §4.4's exact pattern,
# confirmed in explain), so every scan parsed every url twice in
# Python.  asNondeterministic() forbids the duplication: one
# ArrowEvalPython, filter above it, identical rows.  Nothing else is
# lost — these scans have no other pushable predicates below the UDF.
url_parts_udf = _url_parts.asNondeterministic()


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """North-rule invariant column: byte-identical extracted text per url."""
    return html.map(lambda h: extract_text(h) if h is not None else "")


def make_extract_tokenize(passthrough: tuple = ("doc_id", "url"),
                          emit_text: bool = True,
                          emit_positions: bool = False):
    """mapInPandas fn: (*passthrough, html) batches ->
    (*passthrough, [text,] dl, terms ARRAY<STRUCT<term,tf,imp[,pos]>>).

    One fused Arrow pass over O6-O11 (extract zones, normalize, tokenize,
    stem with memo, validity-filter, per-doc tf/imp accumulation —
    indexer.py:175-228 semantics via the shared text layer).

    emit_text=False skips Arrow-transferring the extracted full text
    (roughly html-sized) when the caller only needs term stats — the
    batch index build's hot path.

    emit_positions=True (positional builds) adds each term's 0-based
    kept-token ordinals (text/normalize.doc_term_positions) to the term
    struct — tf/imp stay bit-identical to the non-positional pass, so a
    positional build's postings/docs/index tables match a plain build's
    exactly; only the extra ``positions`` table differs."""

    def extract_tokenize(batches):
        stemmer = make_cached_stemmer()   # memo shared across the partition
        for pdf in batches:
            texts, dls, terms_col = [], [], []
            for h in pdf["html"]:
                if h is None:
                    texts.append("")
                    dls.append(0)
                    terms_col.append([])
                    continue
                if emit_text:
                    text, zones = extract_text_and_zones(h)
                    texts.append(text)
                else:
                    # round 6: the emit_text=False hot path (batch index
                    # build, streaming) used extract_text_and_zones and
                    # DISCARDED the text — a full extra tree traversal +
                    # string join per document.  extract_zones parses
                    # once and walks only the zone passes.
                    zones = extract_zones(h)
                if emit_positions:
                    stats = doc_term_positions(zones, stemmer)
                    dls.append(sum(tf for tf, _, _ in stats.values()))
                    terms_col.append(
                        [{"term": t, "tf": v[0], "imp": v[1], "pos": v[2]}
                         for t, v in stats.items()]
                    )
                    continue
                stats = doc_term_stats(zones, stemmer)
                dls.append(sum(tf for tf, _ in stats.values()))
                terms_col.append(
                    [{"term": t, "tf": v[0], "imp": v[1]} for t, v in stats.items()]
                )
            out = {c: pdf[c] for c in passthrough}
            if emit_text:
                out["text"] = texts
            out["dl"] = pd.Series(dls, dtype="int32")
            out["terms"] = terms_col
            yield pd.DataFrame(out)

    return extract_tokenize
