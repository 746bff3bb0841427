"""HTML extraction with the reference's BeautifulSoup semantics, stdlib-only.

The reference (indexer.py:175-228) does, per document:

  1. ``BeautifulSoup(content, 'html.parser')``
  2. decompose every ``script, style, nav, footer, aside`` element
  3. for each important tag (title:20 h1:18 h2:16 h3:14 strong:12 b:12), for
     each element in document order: ``element.get_text(separator=' ',
     strip=True)`` -> one weighted text zone
  4. decompose all important tags, then ``soup.get_text(separator=' ',
     strip=True)`` -> the default zone at weight 10

The sandbox has no bs4 (/root/reference/requirements.txt is not
installable here), so this module builds an equivalent tree on stdlib
``html.parser`` and reproduces ``get_text(separator=' ', strip=True)``
byte-for-byte for well-formed HTML: every descendant text node is
stripped, empty ones dropped, the rest joined with a single space.
Comments / doctype / processing instructions are excluded, matching
bs4's default ``get_text`` string types.

``extract_text(html)`` is the per-row byte-identity invariant column
(north-rule ``text``); ``extract_zones(html)`` feeds the indexer.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Tag weights from /root/reference/indexer.py:55-63 (dict order preserved:
# the reference iterates this dict when extracting important zones).
IMPORTANT_TAGS: dict[str, int] = {
    "title": 20,
    "h1": 18,
    "h2": 16,
    "h3": 14,
    "strong": 12,
    "b": 12,
}
DEFAULT_WEIGHT = 10

# Stripped wholesale before any text extraction (indexer.py:176-177).
NOISE_TAGS = frozenset(["script", "style", "nav", "footer", "aside"])

# HTML void elements: never pushed on the open-element stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _Node:
    __slots__ = ("tag", "children", "removed")

    def __init__(self, tag: str):
        self.tag = tag          # element name, or None for a text node
        self.children: list = []  # _Node or str (text)
        self.removed = False


class _TreeBuilder(HTMLParser):
    """Minimal DOM: nested _Node tree. convert_charrefs=True (the default)
    resolves entities into text exactly as bs4's html.parser builder does."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag)
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag))

    def handle_endtag(self, tag):
        # Close the nearest matching open element; ignore stray end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    # Comments, doctype, PIs: excluded from text (bs4 get_text default).
    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass


def parse(html: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def _iter_strings(node: _Node, out: list):
    if node.removed:
        return
    for child in node.children:
        if isinstance(child, str):
            s = child.strip()
            if s:
                out.append(s)
        else:
            _iter_strings(child, out)


def get_text(node: _Node) -> str:
    """bs4 ``get_text(separator=' ', strip=True)`` equivalent."""
    parts: list = []
    _iter_strings(node, parts)
    return " ".join(parts)


def _find_all(node: _Node, names, out: list):
    if node.removed:
        return
    for child in node.children:
        if isinstance(child, _Node):
            if child.tag in names:
                out.append(child)
            _find_all(child, names, out)


def find_all(node: _Node, names) -> list:
    out: list = []
    _find_all(node, frozenset(names) if not isinstance(names, frozenset) else names, out)
    return out


def decompose(node: _Node, names) -> None:
    for el in find_all(node, frozenset(names)):
        el.removed = True


def extract_text(html) -> str:
    """North-rule ``text`` column: full page text after noise-tag removal.
    This is the byte-identity invariant checked per url (BASELINE.json
    input_hint) — identical to the reference's soup.get_text(' ', True)
    after decomposing script/style/nav/footer/aside."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = parse(html)
    decompose(root, NOISE_TAGS)
    return get_text(root)


def extract_text_and_zones(html):
    """Single-parse fusion of extract_text + extract_zones (the hot path
    inside the tokenizer UDF parses each page exactly once)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = parse(html)
    decompose(root, NOISE_TAGS)
    text = get_text(root)

    zones: list = []
    for tag_name, weight in IMPORTANT_TAGS.items():
        for el in find_all(root, frozenset([tag_name])):
            zone_text = get_text(el)
            if zone_text:
                zones.append((zone_text, weight))
    decompose(root, frozenset(IMPORTANT_TAGS))
    default_text = get_text(root)
    if default_text:
        zones.append((default_text, DEFAULT_WEIGHT))
    return text, zones


def extract_zones(html) -> list:
    """Weighted zones exactly as indexer.py:181-228 orders them.

    Returns [(zone_text, weight), ...]:
      * one zone per important element, iterated tag-by-tag in
        IMPORTANT_TAGS order then document order (indexer.py:181-183);
        nested important tags ARE double-extracted, matching the
        reference (decompose of important tags happens only after all
        important passes, indexer.py:204-206);
      * one final default zone (weight 10) over whatever text remains.
    Empty zones are dropped (indexer.py:185-186, 211-212).
    """
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = parse(html)
    decompose(root, NOISE_TAGS)

    zones: list = []
    for tag_name, weight in IMPORTANT_TAGS.items():
        for el in find_all(root, frozenset([tag_name])):
            text = get_text(el)
            if text:
                zones.append((text, weight))

    decompose(root, frozenset(IMPORTANT_TAGS))
    default_text = get_text(root)
    if default_text:
        zones.append((default_text, DEFAULT_WEIGHT))
    return zones
