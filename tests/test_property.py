"""Property-based invariants (SURVEY.md §5.2 item 5) — hypothesis over
the codec and the text layer; pure Python, no Spark."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ir_index_construction_spark.functions.codec import (
    decode_chunk, encode_chunks, vb_decode, vb_encode)
from ir_index_construction_spark.text import (
    index_normalize, is_valid_token, stem, tokenize_stem_filter)
from ir_index_construction_spark.text.porter import _measure


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_any(values):
    arr = np.array(values, np.uint64)
    buf, ends = vb_encode(arr)
    out = vb_decode(buf, len(arr))
    np.testing.assert_array_equal(out, arr)


@given(
    st.sets(st.integers(min_value=0, max_value=10**9),
            min_size=1, max_size=600),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_chunk_roundtrip_any(doc_set, block_size, chunk_blocks):
    doc_ids = np.array(sorted(doc_set), np.int64)
    n = len(doc_ids)
    rng = np.random.default_rng(n)
    tfs = rng.integers(1, 1000, n).astype(np.int64)
    dls = rng.integers(1, 10000, n).astype(np.int64)
    imps = rng.integers(10, 21, n).astype(np.int64)
    chunks = encode_chunks(doc_ids, tfs, dls, imps, avgdl=200.0,
                           k1=1.2, b=0.75, block_size=block_size,
                           chunk_blocks=chunk_blocks)
    d = np.concatenate([decode_chunk(c["payload"], c["block_last_doc"])[0]
                        for c in chunks])
    t = np.concatenate([decode_chunk(c["payload"], c["block_last_doc"])[1]
                        for c in chunks])
    np.testing.assert_array_equal(d, doc_ids)
    np.testing.assert_array_equal(t, tfs)
    # block_max >= any member's weight (WAND safety), checked on decode
    for c in chunks:
        dd, tt, ll, _ = decode_chunk(c["payload"], c["block_last_doc"])
        w = tt * 2.2 / (tt + 1.2 * (0.25 + 0.75 * (ll / 200.0)))
        pos = 0
        for bi, bn in enumerate(np.diff(np.concatenate(
                ([0], np.searchsorted(dd, np.array(c["block_last_doc"]),
                                      side="right"))))):
            seg = w[pos:pos + bn]
            assert c["block_max_score"][bi] >= seg.max() - 1e-12
            pos += bn


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent_and_clean(s):
    n = index_normalize(s)
    assert index_normalize(n) == n           # idempotent
    assert n == n.strip()
    for tok in n.split():
        assert tok.isalnum() or all(c.isalnum() for c in tok)


@given(st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=122),
               min_size=1, max_size=30))
@settings(max_examples=500, deadline=None)
def test_stemmer_total_and_idempotent_on_output_shape(word):
    out = stem(word)
    assert isinstance(out, str) and len(out) >= 1
    assert len(out) <= len(word) + 2          # rules only grow via +e/+ee
    assert _measure(word.lower()) >= 0


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_tokenize_stem_filter_totality(s):
    toks = tokenize_stem_filter(index_normalize(s))
    for t in toks:
        assert is_valid_token(t)
        assert t == t.lower()
