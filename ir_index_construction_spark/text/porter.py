"""Vendored Porter stemmer, NLTK-extensions-compatible.

The reference pipeline stems every token with ``nltk.stem.PorterStemmer``
(default mode, i.e. NLTK_EXTENSIONS) — see /root/reference/indexer.py:64,193,220
and /root/reference/searcher.py:186.  The sandbox has no nltk, so this module
re-implements the Porter (1980) algorithm *including the NLTK-documented
departures* so that index-time and query-time stemming agree with the
reference semantics.  Pure stdlib, deterministic, no state.

Departures from the 1980 paper that NLTK mode adds (all public knowledge,
documented in the NLTK source comments):
  * an irregular-forms pool (sky/dying/news/… handled as special cases)
  * words of length <= 2 are returned unchanged
  * step 1a: ``ies`` -> ``ie`` when the word is exactly 4 letters (ties->tie)
  * step 1b: ``ied`` -> ``ie``/``i`` by the same length rule (died->die)
  * step 1c: ``y`` -> ``i`` only after a consonant that is not the only letter
  * step 2: ``alli`` -> ``al`` applied first (with re-entry), ``fulli`` ->
    ``ful``, ``logi`` -> ``log`` (measure taken on the stem + ``l``), and the
    revised ``bli`` -> ``ble`` rule instead of ``abli`` -> ``able``
  * ends-cvc treats a 2-letter vowel-consonant word (e.g. ``ab``) as cvc
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# Irregular forms short-circuited before the algorithm proper (NLTK pool).
_POOL = {
    "sky": "sky",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "news": "news",
    "innings": "inning",
    "inning": "inning",
    "outings": "outing",
    "outing": "outing",
    "cannings": "canning",
    "canning": "canning",
    "howe": "howe",
    "proceed": "proceed",
    "exceed": "exceed",
    "succeed": "succeed",
}


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        if i == 0:
            return True
        return not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the [C](VC)^m[V] decomposition."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_consonant(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    ):
        return True
    # NLTK extension: a two-letter vowel+consonant word counts as cvc.
    return (
        len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _apply_rules(word: str, rules) -> str:
    """Try rules in order; the FIRST matching suffix decides: if its
    condition fails, the word is returned unchanged (no later rule runs).
    A rule of ('*d', repl, cond) matches a double-consonant ending."""
    for suffix, replacement, condition in rules:
        if suffix == "*d":
            if _ends_double_consonant(word):
                stem = word[:-2]
                if condition is None or condition(stem):
                    return stem + replacement
                return word
            continue
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)] if suffix else word
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _m_gt0(stem: str) -> bool:
    return _measure(stem) > 0


def _m_gt1(stem: str) -> bool:
    return _measure(stem) > 1


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:
        return word[:-3] + "ie"
    return _apply_rules(
        word,
        [
            ("sses", "ss", None),
            ("ies", "i", None),
            ("ss", "ss", None),
            ("s", "", None),
        ],
    )


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        return word[:-3] + ("ie" if len(word) == 4 else "i")

    if word.endswith("eed"):
        stem = word[:-3]
        if _measure(stem) > 0:
            return stem + "ee"
        return word

    intermediate = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            candidate = word[: -len(suffix)]
            if _has_vowel(candidate):
                intermediate = candidate
            break
    if intermediate is None:
        return word

    last = intermediate[-1] if intermediate else ""
    return _apply_rules(
        intermediate,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            ("*d", last, lambda stem: last not in ("l", "s", "z")),
            ("", "e", lambda stem: _measure(stem) == 1 and _ends_cvc(stem)),
        ],
    )


def _step1c(word: str) -> str:
    return _apply_rules(
        word,
        [("y", "i", lambda stem: len(stem) > 1 and _is_consonant(stem, len(stem) - 1))],
    )


def _step2(word: str) -> str:
    # NLTK extension: apply 'alli' -> 'al' first and re-enter step 2.
    if word.endswith("alli") and _m_gt0(word[:-4]):
        return _step2(word[:-4] + "al")

    return _apply_rules(
        word,
        [
            ("ational", "ate", _m_gt0),
            ("tional", "tion", _m_gt0),
            ("enci", "ence", _m_gt0),
            ("anci", "ance", _m_gt0),
            ("izer", "ize", _m_gt0),
            ("bli", "ble", _m_gt0),  # revised rule (paper had abli->able)
            ("alli", "al", _m_gt0),
            ("entli", "ent", _m_gt0),
            ("eli", "e", _m_gt0),
            ("ousli", "ous", _m_gt0),
            ("ization", "ize", _m_gt0),
            ("ation", "ate", _m_gt0),
            ("ator", "ate", _m_gt0),
            ("alism", "al", _m_gt0),
            ("iveness", "ive", _m_gt0),
            ("fulness", "ful", _m_gt0),
            ("ousness", "ous", _m_gt0),
            ("aliti", "al", _m_gt0),
            ("iviti", "ive", _m_gt0),
            ("biliti", "ble", _m_gt0),
            ("fulli", "ful", _m_gt0),
            # measure is taken on the stem INCLUDING the 'l' (geo-, theo-).
            ("logi", "log", lambda stem: _m_gt0(word[:-3])),
        ],
    )


def _step3(word: str) -> str:
    return _apply_rules(
        word,
        [
            ("icate", "ic", _m_gt0),
            ("ative", "", _m_gt0),
            ("alize", "al", _m_gt0),
            ("iciti", "ic", _m_gt0),
            ("ical", "ic", _m_gt0),
            ("ful", "", _m_gt0),
            ("ness", "", _m_gt0),
        ],
    )


def _step4(word: str) -> str:
    return _apply_rules(
        word,
        [
            ("al", "", _m_gt1),
            ("ance", "", _m_gt1),
            ("ence", "", _m_gt1),
            ("er", "", _m_gt1),
            ("ic", "", _m_gt1),
            ("able", "", _m_gt1),
            ("ible", "", _m_gt1),
            ("ant", "", _m_gt1),
            ("ement", "", _m_gt1),
            ("ment", "", _m_gt1),
            ("ent", "", _m_gt1),
            ("ion", "", lambda stem: _m_gt1(stem) and stem[-1] in ("s", "t")),
            ("ou", "", _m_gt1),
            ("ism", "", _m_gt1),
            ("ate", "", _m_gt1),
            ("iti", "", _m_gt1),
            ("ous", "", _m_gt1),
            ("ive", "", _m_gt1),
            ("ize", "", _m_gt1),
        ],
    )


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        if _measure(stem) > 1:
            return stem
        if _measure(stem) == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word: str) -> str:
    if word.endswith("ll") and _measure(word[:-1]) > 1:
        return word[:-1]
    return word


def stem(word: str) -> str:
    """Stem one token (lowercased first, matching nltk's default)."""
    w = word.lower()
    if w in _POOL:
        return _POOL[w]
    if len(w) <= 2:
        return w
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _step2(w)
    w = _step3(w)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w


class PorterStemmer:
    """Drop-in object API mirroring nltk.stem.PorterStemmer().stem(...)."""

    def stem(self, word: str) -> str:
        return stem(word)


# worker-global stem memo (round 6, guide §4.5): stem() is a pure
# string -> string function, so its memo never invalidates and can be
# shared by every task a reused Python worker runs (this module is
# importable on executors, so the global survives across tasks; with
# per-task dicts each of a build's ~64 tokenize tasks re-stemmed the
# whole Zipf head from scratch).  Capped so a pathological vocabulary
# cannot grow the worker's RSS unboundedly (~1M entries ≈ tens of MB;
# real web vocabularies per worker are far below it).
_STEM_MEMO: dict[str, str] = {}
_STEM_MEMO_CAP = 1 << 20


def make_cached_stemmer():
    """Return a memoizing stem function backed by the worker-global
    memo. Web text is Zipf-distributed, so nearly every call is a dict
    hit; used inside the Arrow-batched tokenizer UDF."""
    cache = _STEM_MEMO

    def cached(word: str) -> str:
        hit = cache.get(word)
        if hit is None:
            hit = stem(word)
            if len(cache) < _STEM_MEMO_CAP:
                cache[word] = hit
        return hit

    return cached
