"""Codec round-trip + block-max invariants (SURVEY.md §5.2 item 4)."""

import numpy as np
import pytest

from ir_index_construction_spark.functions.codec import (
    bm25_tf_norm,
    decode_chunk,
    encode_chunks,
    vb_decode,
    vb_encode,
)

K1, B = 1.2, 0.75


def test_varbyte_roundtrip():
    rng = np.random.default_rng(7)
    for vals in [
        np.array([0], np.uint64),
        np.array([127, 128, 16383, 16384], np.uint64),
        rng.integers(0, 2**40, 5000).astype(np.uint64),
        np.arange(1000, dtype=np.uint64),
        np.array([2**63 - 1, 0, 1], np.uint64),
    ]:
        buf, ends = vb_encode(vals)
        assert len(buf) == int(ends[-1])
        out = vb_decode(buf, len(vals))
        np.testing.assert_array_equal(out, vals)
    assert vb_encode(np.zeros(0, np.uint64))[0] == b""


def _random_postings(n, seed=0, doc_range=10**7):
    rng = np.random.default_rng(seed)
    doc_ids = np.sort(rng.choice(doc_range, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 300, n).astype(np.int64)
    dls = rng.integers(1, 5000, n).astype(np.int64)
    imps = rng.choice([10, 12, 14, 16, 18, 20], n).astype(np.int64)
    return doc_ids, tfs, dls, imps


@pytest.mark.parametrize("n,block,cblocks", [
    (1, 128, 4), (127, 128, 4), (128, 128, 4), (129, 128, 4),
    (1000, 128, 4), (1000, 128, 2), (5000, 64, 8), (513, 8, 2),
])
def test_chunk_roundtrip(n, block, cblocks):
    doc_ids, tfs, dls, imps = _random_postings(n, seed=n)
    chunks = encode_chunks(doc_ids, tfs, dls, imps, avgdl=150.0, k1=K1, b=B,
                           block_size=block, chunk_blocks=cblocks)
    # chunk metadata consistency
    assert sum(c["n_postings"] for c in chunks) == n
    assert chunks[0]["first_doc"] == doc_ids[0]
    assert chunks[-1]["last_doc"] == doc_ids[-1]
    got = [decode_chunk(c["payload"], c["block_last_doc"]) for c in chunks]
    np.testing.assert_array_equal(np.concatenate([g[0] for g in got]), doc_ids)
    np.testing.assert_array_equal(np.concatenate([g[1] for g in got]), tfs)
    np.testing.assert_array_equal(np.concatenate([g[2] for g in got]), dls)
    np.testing.assert_array_equal(np.concatenate([g[3] for g in got]), imps)


def test_partial_block_decode():
    doc_ids, tfs, dls, imps = _random_postings(2000, seed=3)
    (chunk,) = encode_chunks(doc_ids, tfs, dls, imps, avgdl=150.0, k1=K1, b=B,
                             block_size=128, chunk_blocks=1024)
    n_blocks = len(chunk["block_last_doc"])
    rng = np.random.default_rng(5)
    for trial in range(10):
        sel = rng.random(n_blocks) < 0.4
        if not sel.any():
            sel[rng.integers(n_blocks)] = True
        d, t, l, i = decode_chunk(chunk["payload"], chunk["block_last_doc"], sel)
        # expected: postings of selected blocks
        starts = np.arange(n_blocks) * 128
        ends = np.minimum(starts + 128, len(doc_ids))
        mask = np.zeros(len(doc_ids), bool)
        for bi in np.flatnonzero(sel):
            mask[starts[bi]:ends[bi]] = True
        np.testing.assert_array_equal(d, doc_ids[mask])
        np.testing.assert_array_equal(t, tfs[mask])
        np.testing.assert_array_equal(l, dls[mask])
        np.testing.assert_array_equal(i, imps[mask])


def test_block_max_is_upper_bound():
    doc_ids, tfs, dls, imps = _random_postings(3000, seed=9)
    avgdl = 123.4
    chunks = encode_chunks(doc_ids, tfs, dls, imps, avgdl=avgdl, k1=K1, b=B,
                           block_size=128, chunk_blocks=8)
    w = bm25_tf_norm(tfs, dls, avgdl, K1, B)
    ww = w * (imps.astype(np.float64) / 10.0)
    pos = 0
    for c in chunks:
        d, t, l, _ = decode_chunk(c["payload"], c["block_last_doc"])
        n_blocks = len(c["block_last_doc"])
        for bi in range(n_blocks):
            lo = pos + bi * 128
            hi = min(lo + 128, pos + c["n_postings"])
            # exact float max — no quantization (SURVEY.md §7.2 #4)
            assert c["block_max_score"][bi] == w[lo:hi].max()
            assert c["block_max_wscore"][bi] == ww[lo:hi].max()
            assert c["block_last_doc"][bi] == doc_ids[hi - 1]
        pos += c["n_postings"]


def test_decode_without_imp_stream():
    """with_imp=False must return identical doc/tf/dl and zeros for imp
    (the plain-BM25 hot path skips the imp stream decode entirely)."""
    doc_ids, tfs, dls, imps = _random_postings(1500, seed=11)
    chunks = encode_chunks(doc_ids, tfs, dls, imps, avgdl=150.0, k1=K1, b=B,
                           block_size=64, chunk_blocks=8)
    for c in chunks:
        d1, t1, l1, i1 = decode_chunk(c["payload"], c["block_last_doc"])
        d2, t2, l2, i2 = decode_chunk(c["payload"], c["block_last_doc"],
                                      with_imp=False)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(l1, l2)
        assert (i2 == 0).all()
        assert (i1 > 0).all()


@pytest.mark.parametrize("block,cblocks,seed", [
    (128, 1024, 1), (16, 4, 2), (8, 2, 3), (64, 8, 4),
])
def test_encode_many_bit_identical_to_per_term(block, cblocks, seed):
    """The batched multi-term encoder must produce byte-identical chunks
    to per-term encode_chunks — payload bytes AND all metadata."""
    from ir_index_construction_spark.functions.codec import encode_chunks_many

    rng = np.random.default_rng(seed)
    terms = []
    for t in range(40):
        n = int(rng.integers(1, 600))
        d, tf, dl, imp = _random_postings(n, seed=seed * 100 + t)
        terms.append((d, tf, dl, imp))
    doc_ids = np.concatenate([t[0] for t in terms])
    tfs = np.concatenate([t[1] for t in terms])
    dls = np.concatenate([t[2] for t in terms])
    imps = np.concatenate([t[3] for t in terms])
    starts = np.cumsum([0] + [len(t[0]) for t in terms[:-1]])

    got = encode_chunks_many(doc_ids, tfs, dls, imps, starts, avgdl=150.0,
                             k1=K1, b=B, block_size=block,
                             chunk_blocks=cblocks)
    assert len(got) == len(terms)
    for (d, tf, dl, imp), chunks in zip(terms, got):
        want = encode_chunks(d, tf, dl, imp, avgdl=150.0, k1=K1, b=B,
                             block_size=block, chunk_blocks=cblocks)
        assert len(chunks) == len(want)
        for g, w in zip(chunks, want):
            assert g == w, (g["chunk"], w["chunk"])


def test_compression_ratio_on_dense_lists():
    # dense doc ids (head term): gaps ~1 -> ~1 byte/gap; raw is 8 bytes
    doc_ids = np.arange(100000, dtype=np.int64) * 2
    tfs = np.ones(100000, np.int64)
    dls = np.full(100000, 200, np.int64)
    imps = np.full(100000, 10, np.int64)
    chunks = encode_chunks(doc_ids, tfs, dls, imps, avgdl=200.0, k1=K1, b=B)
    payload_bytes = sum(len(c["payload"]) for c in chunks)
    # raw posting = 8B doc + 4B tf + 4B dl + 4B imp = 20B; expect < 6B here
    # (1B gap + 1B tf + 2B dl + 1B imp + headers)
    assert payload_bytes < 100000 * 6
