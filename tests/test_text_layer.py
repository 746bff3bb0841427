"""Unit tests for the vendored text layer (stemmer, extractor, normalizer)."""

from ir_index_construction_spark.text import (
    defrag_url,
    extract_text,
    extract_zones,
    index_normalize,
    is_valid_token,
    is_valid_url,
    parse_query,
    query_normalize,
    stem,
    tokenize_stem_filter,
)

# Known NLTK PorterStemmer (default mode) outputs — classic Porter test
# pairs plus NLTK-extension cases.
PORTER_VECTORS = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "tie"),           # NLTK ext: 4-letter ies -> ie
    ("flies", "fli"),
    ("dies", "die"),           # NLTK ext
    ("died", "die"),           # NLTK ext: 4-letter ied -> ie
    ("spied", "spi"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),       # step5a drops the final e
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),            # pool
    ("skies", "sky"),          # pool
    ("dying", "die"),          # pool
    ("news", "news"),          # pool
    ("proceed", "proceed"),    # pool
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),    # step2 first-match condition fails -> step4
    ("valenci", "valenc"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
    # engine-relevant tokens
    ("machine", "machin"),
    ("learning", "learn"),
    ("engineering", "engin"),
    ("software", "softwar"),
    ("master", "master"),
    ("cristina", "cristina"),
    ("lopes", "lope"),
    ("running", "run"),
    ("1e5", "1e5"),
    ("2024", "2024"),
    ("the", "the"),
    ("and", "and"),
]


def test_porter_vectors():
    bad = [(w, stem(w), want) for w, want in PORTER_VECTORS if stem(w) != want]
    assert not bad, f"stemmer mismatches: {bad}"


def test_porter_short_and_case():
    assert stem("a") == "a"
    assert stem("ab") == "ab"
    assert stem("RUNNING") == "run"


def test_token_validity():
    # indexer.py:109-124 behavior table (SURVEY.md O11)
    assert is_valid_token("2024")
    assert not is_valid_token("20245")
    assert not is_valid_token("1e5")
    assert not is_valid_token("e5")
    assert is_valid_token("ee")
    assert is_valid_token("e")
    assert is_valid_token("year2024")
    assert not is_valid_token("ensm0001")
    assert not is_valid_token("ensg42")
    assert is_valid_token("machin")


def test_normalize_asymmetry():
    # index time: punctuation -> space; query time: removed
    assert index_normalize("Don't stop") == "don t stop"
    assert query_normalize("Don't stop") == "Dont stop"
    assert index_normalize("state-of-the-art") == "state of the art"
    assert index_normalize("  A  \t B\n") == "a b"


def test_tokenize_stem_filter():
    toks = tokenize_stem_filter(index_normalize("Machines learning 20245 ensm1 2024"))
    assert toks == ["machin", "learn", "2024"]


def test_parse_query_modes():
    terms, is_bool = parse_query("machine AND learning")
    assert is_bool and terms == ["machin", "learn"]
    terms, is_bool = parse_query("machine and learning")
    assert not is_bool and terms == ["machin", "and", "learn"]
    terms, is_bool = parse_query("Don't")
    assert terms == ["dont"]
    assert parse_query("!!!") == ([], False)


def test_url_rules():
    assert defrag_url("https://x.edu/a/b#frag?x") == "https://x.edu/a/b"
    assert defrag_url("https://x.edu/a?q=1#frag") == "https://x.edu/a?q=1"
    assert is_valid_url("https://x.edu/a/b")
    assert not is_valid_url("ftp://x.edu/a")
    assert not is_valid_url("https://x.edu/paper.pdf")
    assert not is_valid_url("https://x.edu/file?format=txt")
    assert is_valid_url("https://x.edu/a.html")


HTML = b"""<!DOCTYPE html><html><head><title> My  Title &amp; More </title>
<style>p { color: red }</style><script>var x = 1 < 2;</script></head>
<body><nav>skip me</nav><h1>Big <b>Bold</b> Header</h1>
<p>Body text, with <strong>emphasis</strong> here.</p>
<!-- a comment --><aside>sidebar</aside><footer>foot</footer>
<p>Second &lt;p&gt; paragraph.</p></body></html>"""


def test_extract_text():
    # script/style/nav/aside/footer stripped; entities resolved; comments
    # dropped; strings stripped and space-joined (bs4 get_text(' ', True)).
    # Note the internal double space inside the title is preserved: only
    # leading/trailing whitespace of each text node is stripped.
    assert extract_text(HTML) == (
        "My  Title & More Big Bold Header "
        "Body text, with emphasis here. Second <p> paragraph."
    )


def test_extract_zones_weights_and_nesting():
    zones = extract_zones(HTML)
    # title:20, h1:18 (includes nested b text), b:12 (double-extracted),
    # strong:12, default:10
    assert ("My  Title & More", 20) in zones
    assert ("Big Bold Header", 18) in zones
    assert ("Bold", 12) in zones
    assert ("emphasis", 12) in zones
    default = [z for z in zones if z[1] == 10]
    assert len(default) == 1
    assert default[0][0] == "Body text, with here. Second <p> paragraph."
    # important-pass order: title before h1 before strong/b zones
    assert zones[0][1] == 20 and zones[-1][1] == 10


def test_extract_empty_and_malformed():
    assert extract_text(b"") == ""
    assert extract_text(b"<p>unclosed") == "unclosed"
    assert extract_zones(b"<title></title><p></p>") == []


def test_expand_synonyms_contract():
    """OR-mode synonym expansion: originals pass through untouched
    (repeated terms keep their multiplicity), each synonym appends once
    after its first source, and a synonym that is already a query term
    is skipped."""
    from ir_index_construction_spark.text.normalize import expand_synonyms

    syn = {"sort": ["order"], "fast": ["quick", "order"]}
    assert expand_synonyms(["sort", "fast"], syn) \
        == ["sort", "order", "fast", "quick"]
    # repeated original keeps multiplicity; synonym appended once
    assert expand_synonyms(["sort", "sort"], syn) \
        == ["sort", "order", "sort"]
    # synonym already a query term is not duplicated
    assert expand_synonyms(["sort", "order"], syn) == ["sort", "order"]
    assert expand_synonyms([], syn) == []
    assert expand_synonyms(["x"], {}) == ["x"]
