"""Normalization, tokenization, token validity, URL handling.

Faithful to the reference semantics, with one deliberate asymmetry kept:
index-time normalization replaces punctuation WITH A SPACE
(indexer.py:187,214) while query-time normalization REMOVES it
(searcher.py:183) — so ``don't`` indexes as ``don t`` but queries as
``dont``.  Both the pure-Python oracle and the Spark engine import this
module, which is what guarantees index/query agreement.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse, urlunparse

from .porter import make_cached_stemmer, stem

# --- normalization ---------------------------------------------------------

_NON_ALNUM = re.compile(r"[^a-zA-Z0-9\s]")
_WS = re.compile(r"\s+")


def index_normalize(text: str) -> str:
    """indexer.py:187-188 / 214-215: punctuation -> space, collapse
    whitespace, lowercase, strip."""
    text = _NON_ALNUM.sub(" ", text)
    text = _WS.sub(" ", text)
    return text.lower().strip()


def query_normalize(query: str) -> str:
    """searcher.py:183: punctuation removed (NOT spaced); case kept —
    boolean-mode detection needs the raw-case tokens."""
    return re.sub(r"[^a-zA-Z0-9\s]", "", query)


# --- token validity (indexer.py:109-124, applied to STEMMED tokens) --------

_TOKEN_PREFIX_FILTERS = ("ensm", "ensg")
_ALL_DIGITS = re.compile(r"^[0-9]+$")
_SCI_STRIP = re.compile(r"[.\-eE/]")


def is_valid_token(token: str) -> bool:
    """Reject ensm*/ensg* prefixes; pure integers only if len<=4; tokens
    that become integers after stripping [.\\-eE/] (e.g. 1e5) rejected.
    Matches reference behavior: 2024 keep, 20245 drop, 1e5 drop, e5 drop,
    ee keep, year2024 keep."""
    if token.startswith(_TOKEN_PREFIX_FILTERS):
        return False
    if _ALL_DIGITS.match(token):
        return len(token) <= 4
    cleaned = _SCI_STRIP.sub("", token)
    if cleaned and _ALL_DIGITS.match(cleaned):
        return False
    return True


# --- tokenize + stem + filter (the O8-O11 fusion) ---------------------------


def tokenize_stem_filter(normalized_text: str, stemmer=None) -> list:
    """Whitespace-split the normalized text, stem each token, keep valid
    ones. Stemming happens BEFORE validity filtering (indexer.py:193-194)."""
    do_stem = stemmer if stemmer is not None else stem
    out = []
    for pre in normalized_text.split():
        token = do_stem(pre)
        if is_valid_token(token):
            out.append(token)
    return out


def doc_term_stats(zones, stemmer=None) -> dict:
    """Per-document (term -> [tf, imp]) over weighted zones, matching the
    reference's two-pass accumulation (indexer.py:197-201, 224-228):
    ``c`` += 1 per occurrence, ``s`` = max(weight, existing)."""
    if stemmer is None:
        stemmer = make_cached_stemmer()
    acc: dict = {}
    for zone_text, weight in zones:
        for token in tokenize_stem_filter(index_normalize(zone_text), stemmer):
            entry = acc.get(token)
            if entry is None:
                acc[token] = [1, weight]
            else:
                entry[0] += 1
                if weight > entry[1]:
                    entry[1] = weight
    return acc


def doc_term_positions(zones, stemmer=None) -> dict:
    """Positional twin of ``doc_term_stats``: per-document
    (term -> [tf, imp, positions]) where ``positions`` are 0-based
    ordinals in the document's KEPT token stream (zones concatenated in
    document order; invalid tokens do not consume a position — the
    Lucene-style convention, so phrase adjacency means "adjacent among
    indexed tokens").  tf == len(positions) by construction, and the
    position counter's final value equals dl, so a positional build's
    postings are bit-identical to ``doc_term_stats``'s."""
    if stemmer is None:
        stemmer = make_cached_stemmer()
    acc: dict = {}
    pos = 0
    for zone_text, weight in zones:
        for token in tokenize_stem_filter(index_normalize(zone_text), stemmer):
            entry = acc.get(token)
            if entry is None:
                acc[token] = [1, weight, [pos]]
            else:
                entry[0] += 1
                if weight > entry[1]:
                    entry[1] = weight
                entry[2].append(pos)
            pos += 1
    return acc


# --- URLs (indexer.py:95-107, 126-150) --------------------------------------

_EXT_BLACKLIST = re.compile(
    r".*.(css|js|bmp|gif|jpe?g|ico|svg"
    r"|png|tiff?|mid|mp2|mp3|mp4"
    r"|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf"
    r"|ps|eps|tex|ppt|pptx|doc|docx|xls|xlsx|names|xml"
    r"|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso"
    r"|epub|dll|cnf|tgz|sha1|m|ma|nb|pd|sql"
    r"|thmx|mso|arff|rtf|jar|csv|shtml|htm|txt"
    r"|rm|smil|wmv|swf|wma|zip|rar|gz|war|img|mpg|apk"
    r"|c|cc|py|ipynb|h|cp?p|pov|lif|ppsx|pps|patch)$"
)

# Kept verbatim from the reference (including the unescaped '.'): this
# exact pattern is the compatibility contract for is_valid_url.
EXT_BLACKLIST_PATTERN = _EXT_BLACKLIST.pattern


def defrag_url(url: str) -> str:
    """urlparse -> urlunparse with fragment dropped (indexer.py:95-107).
    NOTE: urlunparse normalizes, so this is NOT equivalent to a regex
    fragment strip — byte-identity requires going through urllib."""
    p = urlparse(url)
    return urlunparse((p.scheme, p.netloc, p.path, p.params, p.query, ""))


def is_valid_url(url: str) -> bool:
    """indexer.py:126-150: reject '...=txt' suffixes, non-http(s) schemes,
    and the ~70-extension blacklist matched on the lowercased path."""
    if url.split("=")[-1] == "txt":
        return False
    parsed = urlparse(url)
    if parsed.scheme not in ("http", "https"):
        return False
    return not _EXT_BLACKLIST.match(parsed.path.lower())


# --- query parsing (searcher.py:180-197) ------------------------------------


def parse_query(query: str):
    """Returns (terms, is_bool). Boolean mode iff uppercase 'AND' appears in
    the punctuation-stripped, case-preserved split; in boolean mode the
    stemmed token 'and' is removed from the term list (searcher.py:194-197).
    In OR mode 'and' stays as a scored term — reference quirk preserved."""
    split_text = query_normalize(query).split()
    tokens = [stem(w.lower()) for w in split_text]
    if not tokens:
        return [], False
    if "AND" in split_text:
        return [t for t in tokens if t != "and"], True
    return tokens, False


def parse_query_with_negation(query: str):
    """Beyond-reference query surface: ``-token`` words are NEGATIONS
    (docs containing them are excluded).  Returns (terms, is_bool,
    neg_terms).  Negations must be split off BEFORE query_normalize —
    it strips punctuation, so the minus sign would silently vanish (a
    '-scan' query would otherwise SCORE the term it meant to exclude).
    Both halves then go through the reference parse/stem path, so
    positive-term semantics are untouched (parse_query is the
    compatibility contract and stays as-is)."""
    raw = query.split()
    neg_raw = " ".join(w[1:] for w in raw if w.startswith("-") and len(w) > 1)
    pos_raw = " ".join(w for w in raw if not w.startswith("-"))
    terms, is_bool = parse_query(pos_raw)
    neg_terms, _ = parse_query(neg_raw)
    return terms, is_bool, neg_terms


def parse_boosted_query(query: str):
    """Beyond-reference query surface: per-term boosts, the Lucene
    query-language ``term^2.5`` clause weight.  Returns (terms, is_bool,
    boosts) where ``boosts`` maps STEMMED terms to their float weight —
    the same key space the scorers' term metadata uses, so a boost
    multiplies that term's idf and nothing else (score contribution AND
    the WAND block-max bound scale together, keeping pruning exact).

    The ``^w`` suffix must be split off BEFORE query_normalize — it
    turns ``^`` into a space, so ``scan^2`` would otherwise tokenize as
    the two terms ``scan 2``.  A suffix that does not parse as a float
    is NOT a boost (``x^y`` stays a literal token, matching Lucene's
    lenient parser).  When two raw words stem to the same term with
    different boosts, the last one wins (one weight per scored term —
    the scorers weigh terms, not clause occurrences).  Word order,
    multiplicity, and boolean-mode detection are untouched: the
    boost-stripped words rejoin the original sequence and go through
    the reference parse/stem path (parse_query stays the compatibility
    contract)."""
    raw = query.split()
    words, raw_boosts = [], []          # raw_boosts[i] aligns with words[i]
    for w in raw:
        base, sep, suffix = w.rpartition("^")
        bval = None
        if sep and base:
            try:
                bval = float(suffix)
            except ValueError:
                base = w
        else:
            base = w
        words.append(base)
        raw_boosts.append(bval)
    terms, is_bool = parse_query(" ".join(words))
    boosts: dict = {}
    for w, bval in zip(words, raw_boosts):
        if bval is None:
            continue
        stemmed, _ = parse_query(w)
        for t in stemmed:
            if not (is_bool and t == "and"):
                boosts[t] = bval
    return terms, is_bool, boosts


def expand_synonyms(terms: list, synonyms: dict) -> list:
    """Beyond-reference query surface: OR-mode synonym expansion — each
    query term is followed by its synonym-map entries (Elasticsearch's
    default expand-at-query-time behavior: every member scores with its
    OWN idf, so the expansion is a plain OR query over the widened term
    list).  The map is in the INDEXED vocabulary (synonym files ship
    stemmed, like any analyzer-chain synonym filter).  Original terms
    pass through UNTOUCHED — a repeated query term keeps its
    multiplicity (the scorers' mult weighting) — and each synonym is
    appended once, after its first source occurrence, unless it is
    already a query term itself; insertion order is deterministic,
    preserving the float-sum order contract with the scorers."""
    out, added = [], set()
    originals = set(terms)
    for t in terms:
        out.append(t)
        for s in synonyms.get(t, ()):
            if s not in added and s not in originals:
                added.add(s)
                out.append(s)
    return out


def parse_mixed_query(query: str):
    """Beyond-reference query surface: a query mixing "quoted phrases"
    and loose terms (`"machine learning" tutorial`) — the Lucene query
    language's phrase clause.  Returns (phrases, terms): each quoted
    span parses through the SAME parse_query chain (normalize + stem),
    so a phrase matches exactly when its words would match as terms and
    additionally sit adjacent; the remainder parses as loose OR terms.
    Quotes must be balanced; an unbalanced trailing quote opens a span
    to end-of-string (browser search-box behavior).  Mixed queries are
    OR-mode across clauses: each clause (phrase or term) contributes
    its own BM25 addend (plans/query.mixed_topk)."""
    spans, rest = [], []
    parts = query.split('"')
    # even indices = outside quotes, odd = inside
    for i, part in enumerate(parts):
        (spans if i % 2 else rest).append(part)
    phrases = []
    for s in spans:
        terms, _ = parse_query(s)
        if terms:
            phrases.append(terms)
    terms, _ = parse_query(" ".join(rest))
    return phrases, terms
