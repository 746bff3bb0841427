"""Positional index + exact-phrase retrieval (BuildConfig.positions).

1. The positional tokenizer's tf/imp/dl are bit-identical to the plain
   pass, and positions are consistent (tf == len(positions), counter
   ends at dl).
2. phrase_topk_indexed over a positional catalog build matches an
   independent brute-force scan of every document's kept-token stream
   (count of adjacent-window matches + BM25 virtual-term scoring).
3. A streaming drain keeps the positions table current (auto-detected),
   so phrase queries see streamed docs.
4. Tombstoned docs are masked from phrase results (exclude_ids) and
   physically gone after purge — in the same transaction as docs/
   postings.
5. The plural (catalog) and flat (oracle-tier) layouts agree.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from ir_index_construction_spark.config import BM25Config, small_scale
from ir_index_construction_spark.plans.builder import IndexBuilder
from ir_index_construction_spark.plans.query import phrase_topk_indexed
from ir_index_construction_spark.schemas import DOCUMENTS
from ir_index_construction_spark.sources.catalog import Catalog
from ir_index_construction_spark.text.extract import extract_text_and_zones
from ir_index_construction_spark.text.normalize import (
    doc_term_positions,
    doc_term_stats,
    index_normalize,
    parse_query,
    tokenize_stem_filter,
)

CFG = dataclasses.replace(small_scale(), positions=True)
K1, B = 1.2, 0.75


def _kept_stream(html: bytes) -> list:
    """Independent reconstruction of a doc's kept-token stream (the
    position convention: zones in document order, invalid tokens skip)."""
    if html is None:
        return []
    _, zones = extract_text_and_zones(html)
    out = []
    for zone_text, _w in zones:
        out.extend(tokenize_stem_filter(index_normalize(zone_text)))
    return out


def _brute_phrase(stream: list, terms: list) -> int:
    m = len(terms)
    return sum(1 for i in range(len(stream) - m + 1)
               if stream[i:i + m] == terms)


@pytest.fixture(scope="module")
def pos_build(spark, documents_df, tmp_path_factory):
    cat = Catalog(str(tmp_path_factory.mktemp("cat_pos")))
    IndexBuilder(cat, CFG, n_batches=2).build(documents_df)
    return cat


def _phrase_frames(spark, cat):
    stats = cat.read(spark, "stats").collect()[0]
    return (cat.read(spark, "positions"), cat.read(spark, "docs"),
            int(stats["n_docs"]), float(stats["avgdl"]))


def _brute_topk(spark, cat, corpus_rows, query, k=10, exclude=()):
    """Brute-force phrase top-k from the raw corpus + the catalog's own
    docs/stats tables (url -> doc identity via kept-stream length)."""
    terms = parse_query(query)[0]
    positions, docs, n_docs, avgdl = _phrase_frames(spark, cat)
    streams: dict = {}
    for row in corpus_rows:
        streams.setdefault(row["url"], []).append(_kept_stream(row["html"]))
    hits = []
    for r in docs.collect():
        if r["doc_id"] in exclude:
            continue
        cands = [s for s in streams.get(r["url"], [])
                 if len(s) == r["doc_len"]]
        assert cands, f"no corpus row reproduces doc_len for {r['url']}"
        ptf = _brute_phrase(cands[0], terms)
        if ptf:
            hits.append((r["doc_id"], r["url"], ptf, r["doc_len"]))
    if not hits:
        return []
    df_p = len(hits)
    idf = math.log((n_docs - df_p + 0.5) / (df_p + 0.5) + 1.0)
    scored = [
        (doc_id, url, ptf,
         idf * (ptf * (K1 + 1.0))
         / (ptf + K1 * ((1.0 - B) + B * (dl / avgdl))))
        for doc_id, url, ptf, dl in hits
    ]
    scored.sort(key=lambda t: (-t[3], t[0]))
    return scored[:k]


def test_positional_stats_bit_identical():
    html = (b"<html><title>Machine Learning 2024</title><body>"
            b"machine learning for ENSG000 retrieval 1e5 systems; "
            b"machine learning again</body></html>")
    _, zones = extract_text_and_zones(html)
    plain = doc_term_stats(zones)
    positional = doc_term_positions(zones)
    assert set(plain) == set(positional)
    n_kept = 0
    for t, (tf, imp) in plain.items():
        ptf, pimp, pos = positional[t]
        assert (tf, imp) == (ptf, pimp)
        assert tf == len(pos)
        assert pos == sorted(pos)
        n_kept += tf
    all_pos = sorted(p for _, _, ps in positional.values() for p in ps)
    assert all_pos == list(range(n_kept))   # counter == dl, no gaps


def test_positional_build_postings_match_plain(spark, documents_df,
                                               tmp_path):
    plain_cat = Catalog(str(tmp_path / "cat_plain"))
    IndexBuilder(plain_cat, small_scale(), n_batches=2).build(documents_df)
    pos_cat = Catalog(str(tmp_path / "cat_pos2"))
    IndexBuilder(pos_cat, CFG, n_batches=2).build(documents_df)
    a = plain_cat.read(spark, "postings")
    b = pos_cat.read(spark, "postings")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # positions table agrees with postings on (term, doc, tf)
    pos = pos_cat.read(spark, "positions").select(
        "term", "doc_id", F.size("positions").alias("tf"))
    flat = b.select("term", "doc_id", "tf")
    assert pos.exceptAll(flat).isEmpty() and flat.exceptAll(pos).isEmpty()


# phrases that occur adjacently in the synthetic corpus (plus a
# duplicate-term phrase — both offsets hit the same term's positions —
# a trigram, and a guaranteed miss)
PHRASES = ["research development", "of the", "the the", "the and the",
           "nonexistent ghost phrase"]


def test_phrase_indexed_matches_bruteforce(spark, pos_build, corpus_rows):
    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    n_hits = 0
    for q in PHRASES:
        got = phrase_topk_indexed(
            positions, docs, q, n_docs, avgdl, k=10).orderBy("rank").collect()
        want = _brute_topk(spark, pos_build, corpus_rows, q, k=10)
        assert len(got) == len(want), q
        n_hits += len(got)
        for g, w in zip(got, want):
            assert (g["doc_id"], g["url"], g["ptf"]) == w[:3], q
            assert g["score"] == pytest.approx(w[3], abs=1e-9), q
    assert n_hits >= 3 * 10   # the corpus-derived phrases really match


def test_phrase_respects_kept_token_adjacency(spark, pos_build):
    """Tokens separated only by DROPPED tokens are adjacent in position
    space: '<a> 1e5 <b>' matches phrase 'a b' (1e5 is filtered out)."""
    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    # craft a micro-catalog inline: two docs, one with a dropped token
    # between the phrase words, one with a KEPT token between them
    rows = [("alpha 1e5 beta", 1), ("alpha gamma beta", 2)]
    pos_df = spark.createDataFrame(
        [(t, i, [p]) for text, i in rows
         for p, t in enumerate(tokenize_stem_filter(index_normalize(text)))],
        "term string, doc_id long, positions array<int>")
    pos_df = (pos_df.groupBy("term", "doc_id")
              .agg(F.flatten(F.collect_list("positions")).alias("positions")))
    doc_df = spark.createDataFrame(
        [(1, "u1", 2), (2, "u2", 3)], "doc_id long, url string, doc_len int")
    got = phrase_topk_indexed(pos_df, doc_df, "alpha beta", 2, 2.5,
                              k=10).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_streaming_drain_maintains_positions(spark, pos_build, corpus_rows,
                                             tmp_path):
    from ir_index_construction_spark.streaming import incremental_index_update

    phrase = "zebra quartz phrase canary"
    stems = parse_query(phrase)[0]
    html = ("<html><body>filler words before zebra quartz phrase canary "
            "and after tail</body></html>").encode()
    new_rows = [{"url": "https://stream.example.org/canary",
                 "warc_ts": dt.datetime(2024, 5, 1), "html": html,
                 "text": None, "lang": "en"}]
    before_n = pos_build.read(spark, "positions").count()
    inp = tmp_path / "in"
    inp.mkdir()
    spark.createDataFrame(new_rows, DOCUMENTS).write.mode(
        "overwrite").parquet(str(inp / "b0.parquet"))
    incremental_index_update(spark, pos_build, str(inp) + "/*",
                             str(tmp_path / "ckpt"))
    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    assert positions.count() > before_n
    got = phrase_topk_indexed(positions, docs, phrase, n_docs, avgdl,
                              k=5).collect()
    assert [r["url"] for r in got] == ["https://stream.example.org/canary"]
    assert got[0]["ptf"] == 1
    # the streamed doc's positions honor the convention (independent check)
    streamed = positions.join(
        docs.filter(F.col("url").contains("canary")).select("doc_id"),
        "doc_id").collect()
    stream = _kept_stream(html)
    want = {}
    for p, t in enumerate(stream):
        want.setdefault(t, []).append(p)
    assert {r["term"]: sorted(r["positions"]) for r in streamed} == want
    assert stems != []


def test_phrase_tombstone_then_purge(spark, documents_df, corpus_rows,
                                     tmp_path):
    from ir_index_construction_spark.plans.maintenance import (
        purge_tombstones, tombstone_urls)

    cat = Catalog(str(tmp_path / "cat_tomb"))
    IndexBuilder(cat, CFG, n_batches=1).build(documents_df)
    positions, docs, n_docs, avgdl = _phrase_frames(spark, cat)
    q = "research development"
    base = phrase_topk_indexed(positions, docs, q, n_docs, avgdl,
                               k=5).collect()
    assert base
    victim_id, victim_url = base[0]["doc_id"], base[0]["url"]
    assert tombstone_urls(spark, cat, [victim_url]) >= 1
    dead = {r["doc_id"] for r in
            cat.read(spark, "doc_tombstones").select("doc_id").collect()}
    masked = phrase_topk_indexed(positions, docs, q, n_docs, avgdl, k=5,
                                 exclude_ids=dead).collect()
    assert victim_id not in [r["doc_id"] for r in masked]
    want = _brute_topk(spark, cat, corpus_rows, q, k=5, exclude=dead)
    assert [(r["doc_id"], r["ptf"]) for r in masked] == \
        [(w[0], w[2]) for w in want]
    purge_tombstones(spark, cat)
    pos2 = cat.read(spark, "positions")
    assert pos2.filter(F.col("doc_id") == victim_id).isEmpty()
    docs2 = cat.read(spark, "docs")
    after = phrase_topk_indexed(pos2, docs2, q, n_docs, avgdl, k=5).collect()
    assert [(r["doc_id"], r["ptf"]) for r in after] == \
        [(r["doc_id"], r["ptf"]) for r in masked]


def test_phrase_batch_matches_single(spark, pos_build):
    """phrase_topk_batch (one plan for the workload, relational
    start-position formulation + in-plan rank window) is row- AND
    score-identical to phrase_topk_indexed per phrase (array_intersect
    formulation, per-query jobs)."""
    from ir_index_construction_spark.plans.query import phrase_topk_batch

    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    queries = {f"p{i}": q for i, q in enumerate(PHRASES)}
    got = phrase_topk_batch(positions, docs, queries, n_docs, avgdl,
                            k=7).collect()
    by_qid: dict = {}
    for r in got:
        by_qid.setdefault(r["query_id"], []).append(r)
    n_nonempty = 0
    for qid, q in queries.items():
        single = phrase_topk_indexed(positions, docs, q, n_docs, avgdl,
                                     k=7).orderBy("rank").collect()
        batch = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [(r["rank"], r["doc_id"], r["url"], r["ptf"], r["score"])
                for r in batch] == \
               [(r["rank"], r["doc_id"], r["url"], r["ptf"], r["score"])
                for r in single], qid          # scores bit-identical
        n_nonempty += bool(single)
    assert n_nonempty >= 3


def test_phrase_df_cache_identical_results(spark, pos_build):
    """A seeded df_cache (the query service's steady state — one Spark
    job per phrase) returns bit-identical results to the uncached path,
    and caches the zero-match phrases too (negative caching)."""
    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    cache: dict = {}
    for q in PHRASES:
        cold = phrase_topk_indexed(positions, docs, q, n_docs, avgdl,
                                   k=5, df_cache=cache).collect()
        warm = phrase_topk_indexed(positions, docs, q, n_docs, avgdl,
                                   k=5, df_cache=cache).collect()
        plain = phrase_topk_indexed(positions, docs, q, n_docs, avgdl,
                                    k=5).collect()
        rows = lambda rs: [(r["rank"], r["doc_id"], r["ptf"], r["score"])
                           for r in rs]
        assert rows(cold) == rows(warm) == rows(plain), q
    assert len(cache) == len(PHRASES)
    assert 0 in cache.values()          # the ghost phrase cached as absent


def test_phrase_batch_releases_its_cache(spark, pos_build):
    """phrase_topk_batch persists the matched set between its two jobs
    (one positional scan for the whole workload) and must UNPERSIST it
    before returning — a long-lived query service calling it per
    workload must not accumulate cached blocks.  getPersistentRDDs is
    the ground truth the executor storage UI reads."""
    from ir_index_construction_spark.plans.query import phrase_topk_batch

    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    got = phrase_topk_batch(positions, docs,
                            {f"p{i}": q for i, q in enumerate(PHRASES)},
                            n_docs, avgdl, k=5).collect()
    assert got                                     # real work happened
    assert jsc.getPersistentRDDs().size() == before


def test_phrase_batch_respects_exclusions(spark, pos_build):
    from ir_index_construction_spark.plans.query import phrase_topk_batch

    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    q = {"a": "of the"}
    base = phrase_topk_batch(positions, docs, q, n_docs, avgdl, k=3).collect()
    assert base
    dead = {base[0]["doc_id"]}
    masked = phrase_topk_batch(positions, docs, q, n_docs, avgdl, k=3,
                               exclude_ids=dead).collect()
    assert dead.isdisjoint({r["doc_id"] for r in masked}) and masked


def test_plural_and_flat_layouts_agree(spark, pos_build):
    """proximity/phrase matchers give identical results whether positions
    come nested per (term, doc) — the catalog layout — or one row per
    occurrence — the oracle-tier layout."""
    from ir_index_construction_spark.operators.phrase import (
        phrase_match, proximity_match)

    positions = pos_build.read(spark, "positions")
    flat = positions.select(
        "term", "doc_id", F.explode("positions").alias("pos"))
    terms = parse_query("research development")[0]
    a = phrase_match(positions, terms, pos_col="positions", plural=True)
    b = phrase_match(flat, terms)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    pa = proximity_match(positions, terms[0], terms[1], 3,
                         pos_col="positions", plural=True)
    pb = proximity_match(flat, terms[0], terms[1], 3)
    assert pa.exceptAll(pb).isEmpty() and pb.exceptAll(pa).isEmpty()
    assert not a.isEmpty() and not pa.isEmpty()


def test_randomized_phrase_fuzz(spark):
    """Seeded fuzz: 200 random token streams (tiny alphabet, so overlaps
    and self-overlapping phrases like 'a a' occur) x 25 random phrases
    (lengths 1-4, duplicate terms allowed) — phrase_match_batch over the
    plural layout must equal a pure-Python sliding-window count on every
    (phrase, doc) pair.  One Spark job for the whole grid."""
    import random

    rng = random.Random(1234)
    alphabet = ["a", "b", "c", "d", "e"]
    docs = {d: [rng.choice(alphabet) for _ in range(rng.randint(0, 40))]
            for d in range(200)}
    phrases = {f"f{i:02d}": [rng.choice(alphabet)
                             for _ in range(rng.randint(1, 4))]
               for i in range(25)}
    rows = []
    for d, stream in docs.items():
        byterm: dict = {}
        for p, t in enumerate(stream):
            byterm.setdefault(t, []).append(p)
        rows += [(t, d, ps) for t, ps in byterm.items()]
    pos_df = spark.createDataFrame(
        rows, "term string, doc_id long, positions array<int>")

    from ir_index_construction_spark.operators.phrase import (
        phrase_match_batch)

    got = {(r["query_id"], r["doc_id"]): r["ptf"]
           for r in phrase_match_batch(pos_df, phrases,
                                       pos_col="positions",
                                       plural=True).collect()}
    want = {}
    for qid, terms in phrases.items():
        for d, stream in docs.items():
            ptf = _brute_phrase(stream, terms)
            if ptf:
                want[(qid, d)] = ptf
    assert got == want
    assert len(want) > 100          # the grid really exercises matches

    # proximity on the same corpus: seeded (a, b, window) cases vs a
    # pure-Python pair scan
    from ir_index_construction_spark.operators.phrase import proximity_match

    for a, b, w in (("a", "b", 1), ("c", "d", 3), ("e", "a", 7)):
        got_px = {r["doc_id"]: (r["n_pairs"], r["min_dist"])
                  for r in proximity_match(pos_df, a, b, w,
                                           pos_col="positions",
                                           plural=True).collect()}
        want_px = {}
        for d, stream in docs.items():
            pa = [i for i, t in enumerate(stream) if t == a]
            pb = [i for i, t in enumerate(stream) if t == b]
            if not pa or not pb:
                continue
            dists = [abs(x - y) for x in pa for y in pb]
            if min(dists) <= w:
                want_px[d] = (sum(1 for x in dists if x <= w), min(dists))
        assert got_px == want_px, (a, b, w)


def test_snippet_windows_match_bruteforce(spark):
    """Best fixed-width highlight window per doc == a brute-force scan
    over every candidate start (earliest-start tie-break), on seeded
    random token streams."""
    import random

    from ir_index_construction_spark.operators.phrase import snippet_windows

    rng = random.Random(99)
    alphabet = ["a", "b", "c", "d", "e", "f", "g"]
    docs = {d: [rng.choice(alphabet) for _ in range(rng.randint(5, 60))]
            for d in range(60)}
    terms, width = ["a", "c"], 7
    rows = []
    for d, stream in docs.items():
        byterm: dict = {}
        for p, t in enumerate(stream):
            byterm.setdefault(t, []).append(p)
        rows += [(t, d, ps) for t, ps in byterm.items()]
    pos_df = spark.createDataFrame(
        rows, "term string, doc_id long, positions array<int>")
    got = {r["doc_id"]: (r["win_start"], r["n_hits"],
                         sorted(r["hit_positions"]))
           for r in snippet_windows(pos_df, list(docs), terms, width,
                                    pos_col="positions",
                                    plural=True).collect()}
    want = {}
    for d, stream in docs.items():
        hits = [i for i, t in enumerate(stream) if t in terms]
        if not hits:
            continue
        best = max(hits, key=lambda x: (
            sum(1 for y in hits if x <= y < x + width), -x))
        inwin = [y for y in hits if best <= y < best + width]
        want[d] = (best, len(inwin), inwin)
    assert got == want and len(want) >= 50


def test_batch_matcher_equals_array_matcher(spark, pos_build):
    """The relational start-position formulation (phrase_match_batch)
    and the offset-shifted array_intersect formulation (phrase_match)
    produce identical (doc_id, ptf) sets for every phrase."""
    from ir_index_construction_spark.operators.phrase import (
        phrase_match, phrase_match_batch)

    positions = pos_build.read(spark, "positions")
    phrases = {f"p{i}": parse_query(q)[0] for i, q in enumerate(PHRASES)}
    batch = phrase_match_batch(positions, phrases,
                               pos_col="positions", plural=True)
    for qid, terms in phrases.items():
        a = phrase_match(positions, terms, pos_col="positions", plural=True)
        b = batch.filter(F.col("query_id") == qid).select("doc_id", "ptf")
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), qid


def test_batch_matcher_exact_over_segment_appends(spark, tmp_path):
    """Round 6: phrase_match_batch counts offsets per start with a plain
    count(*) instead of countDistinct, which is exact iff (term, doc_id)
    rows stay UNIQUE across per-batch segment appends (each doc is
    tokenized in exactly one commit).  Pin that invariant end-to-end:
    stream TWO micro-batches into a cold catalog with positional
    maintenance, then assert the relational batch matcher still equals
    the set-semantics array matcher for every phrase — a duplicated
    (term, doc_id) row would inflate count(*) and break the equality."""
    import datetime as dt

    from ir_index_construction_spark.operators.phrase import (
        phrase_match, phrase_match_batch)
    from ir_index_construction_spark.sources.catalog import Catalog
    from ir_index_construction_spark.streaming import (
        incremental_index_update)

    cat = Catalog(str(tmp_path / "cat"))
    rows = [
        ("https://seg.example.org/a", "alpha beta gamma alpha beta"),
        ("https://seg.example.org/b", "beta gamma delta beta gamma"),
        ("https://seg.example.org/c", "alpha beta alpha beta gamma"),
        ("https://seg.example.org/d", "gamma alpha beta delta"),
    ]
    inp = tmp_path / "in"
    inp.mkdir()
    for batch_no, chunk in enumerate((rows[:2], rows[2:])):
        spark.createDataFrame(
            [{"url": u, "warc_ts": dt.datetime(2024, 6, 1 + batch_no),
              "html": f"<html><body>{t}</body></html>".encode(),
              "text": None, "lang": "en"} for u, t in chunk],
            DOCUMENTS).write.mode("overwrite").parquet(
            str(inp / f"b{batch_no}.parquet"))
        incremental_index_update(spark, cat, str(inp) + "/*",
                                 str(tmp_path / "ckpt"),
                                 maintain_positions=True)
    positions = cat.read(spark, "positions")
    # two commits landed, and no (term, doc_id) duplicates exist
    dup = (positions.groupBy("term", "doc_id").count()
           .filter(F.col("count") > 1).count())
    assert dup == 0
    phrases = {"p0": ["alpha", "beta"], "p1": ["beta", "gamma"],
               "p2": ["alpha", "beta", "gamma"], "p3": ["gamma", "alpha"]}
    batch = phrase_match_batch(positions, phrases,
                               pos_col="positions", plural=True)
    for qid, terms in phrases.items():
        a = phrase_match(positions, terms, pos_col="positions", plural=True)
        b = batch.filter(F.col("query_id") == qid).select("doc_id", "ptf")
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), qid


def test_snippet_windows_accepts_doc_id_frame(spark):
    """The q58 search+highlight composition passes the top-k subplan as
    a DataFrame instead of a collected id list; both spellings of
    ``doc_ids`` must produce identical spans."""
    from ir_index_construction_spark.operators.phrase import (
        snippet_windows, token_positions)

    docs = spark.createDataFrame(
        [(0, "a b c a x x a"), (1, "x a x c x"), (2, "c c c"),
         (3, "x x x")],
        "doc_id long, text string")
    pos = token_positions(docs)
    ids = [0, 1, 2]
    by_list = sorted(
        snippet_windows(pos, ids, ["a", "c"], width=3).collect())
    id_frame = docs.filter(F.col("doc_id") < 3).select("doc_id")
    by_frame = sorted(
        snippet_windows(pos, id_frame, ["a", "c"], width=3).collect())
    assert by_list == by_frame and len(by_list) == 3
    assert {r["doc_id"] for r in by_list} == {0, 1, 2}


def test_mixed_topk_sums_phrase_and_term_clauses(spark, pos_build):
    """Mixed query language ('"machine learning" software'): per-doc
    score == phrase-virtual-term addend + loose-term addend, each
    bit-identical to its single-clause plan (two addends sum
    commutatively, so the union-agg matches the manual sum exactly);
    the degenerate forms collapse to their single-clause plans."""
    from ir_index_construction_spark.plans.query import (
        bm25_topk_exhaustive, mixed_topk, phrase_topk_indexed)

    positions = pos_build.read(spark, "positions")
    postings = pos_build.read(spark, "postings")
    dictionary = pos_build.read(spark, "dictionary")
    docs = pos_build.read(spark, "docs")
    stats = pos_build.read(spark, "stats").collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])

    phrase_scores = {
        r["doc_id"]: r["score"]
        for r in phrase_topk_indexed(positions, docs, '"machine learning"',
                                     n_docs, avgdl, k=10_000).collect()}
    term_scores = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_exhaustive(postings, dictionary, docs,
                                      "software", n_docs, avgdl,
                                      k=10_000).collect()}
    want_all: dict = {}
    for d, s in phrase_scores.items():
        want_all[d] = want_all.get(d, 0.0) + s
    for d, s in term_scores.items():
        want_all[d] = want_all.get(d, 0.0) + s
    want = sorted(want_all.items(), key=lambda x: (-x[1], x[0]))[:10]

    got = mixed_topk(positions, postings, dictionary, docs,
                     '"machine learning" software', n_docs, avgdl,
                     k=10).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))

    # degenerate: no quotes == the exhaustive plan
    plain = bm25_topk_exhaustive(postings, dictionary, docs,
                                 "machine learning", n_docs, avgdl,
                                 k=10).orderBy("rank").collect()
    got2 = mixed_topk(positions, postings, dictionary, docs,
                      "machine learning", n_docs, avgdl,
                      k=10).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in got2] \
        == [(r["doc_id"], r["score"]) for r in plain]

    # degenerate: only a quoted phrase == the phrase plan's scores
    got3 = mixed_topk(positions, postings, dictionary, docs,
                      '"machine learning"', n_docs, avgdl,
                      k=10).orderBy("rank").collect()
    want3 = phrase_topk_indexed(positions, docs, '"machine learning"',
                                n_docs, avgdl, k=10).orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in got3] \
        == [(r["doc_id"], r["score"]) for r in want3]

    # a phrase that never matches leaves only the term clause
    got4 = mixed_topk(positions, postings, dictionary, docs,
                      '"zzzymissing learning" software', n_docs, avgdl,
                      k=10).orderBy("rank").collect()
    want4 = bm25_topk_exhaustive(postings, dictionary, docs, "software",
                                 n_docs, avgdl, k=10) \
        .orderBy("rank").collect()
    assert [(r["doc_id"], r["score"]) for r in got4] \
        == [(r["doc_id"], r["score"]) for r in want4]


def test_query_service_rescore_and_termvectors(spark, pos_build):
    """The service's --rescore and --termvectors surfaces over a
    positional catalog match the direct plans/rank.py calls."""
    import importlib.util
    from pathlib import Path

    from ir_index_construction_spark.plans.rank import (
        rescore_topk, term_vector)

    spec = importlib.util.spec_from_file_location(
        "submit_query_rescore",
        Path(__file__).resolve().parent.parent / "tools" / "submit_query.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    svc = m.QueryService(spark, pos_build)
    positions, docs, n_docs, avgdl = _phrase_frames(spark, pos_build)
    postings = pos_build.read(spark, "postings")
    dictionary = pos_build.read(spark, "dictionary")

    got = svc.run("machine learning", 10, "wand", False,
                  rescore=20, rescore_weight=2.0).orderBy("rank").collect()
    want = rescore_topk(positions, postings, dictionary, docs,
                        "machine learning", n_docs, avgdl, first_n=20,
                        k=10, weight=2.0).orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"], r["ptf"], r["score"]) for r in got] == \
           [(r["rank"], r["doc_id"], r["ptf"], r["score"]) for r in want]
    assert got

    some_doc = got[0]["doc_id"]
    tv = svc.term_vectors(some_doc).orderBy("term").collect()
    want_tv = term_vector(positions, some_doc).orderBy("term").collect()
    assert [(r["term"], r["tf"], list(r["positions"])) for r in tv] == \
           [(r["term"], r["tf"], list(r["positions"])) for r in want_tv]
    assert tv, "term vector non-empty for a ranked doc"
    # tf is consistent with the positions array by construction
    for r in tv:
        assert r["tf"] == len(r["positions"])
