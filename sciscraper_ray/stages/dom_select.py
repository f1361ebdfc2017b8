"""CSS-select DOM extraction — the reference's scraping primitives
rebuilt without selectolax (not in this container):

- ``select_text(html, selector, regex=None)`` = GoogleScholarScraper.
  find_element_text (/root/reference/src/webscrapers.py:163-183): first
  matching node's text, optionally refined by a regex (``\\d+``,
  ``\\d{4}`` in the reference).
- ``find_download_link(html)`` = BulkPDFScraper.find_download_link
  (/root/reference/src/downloaders.py:198-230): CSS
  ``#buttons button:nth-child(1)`` -> ``onclick`` attribute.

Selector subset (all the reference uses): ``tag``, ``#id``, ``.class``,
``tag.class``, ``tag#id``, descendant combination with spaces, and
``:nth-child(n)``. Stateless; compiled per batch in ``DomSelectStage``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

_SIMPLE = re.compile(
    r"^(?P<tag>[a-zA-Z][\w-]*)?(?P<id>#[\w-]+)?(?P<cls>\.[\w-]+)?"
    r"(?::nth-child\((?P<nth>\d+)\))?$"
)


def _parse_selector(selector: str) -> list[dict]:
    parts = []
    for token in selector.split():
        m = _SIMPLE.match(token)
        if not m:
            raise ValueError(f"unsupported selector token: {token!r}")
        parts.append(
            {
                "tag": (m.group("tag") or "").lower() or None,
                "id": m.group("id")[1:] if m.group("id") else None,
                "cls": m.group("cls")[1:] if m.group("cls") else None,
                "nth": int(m.group("nth")) if m.group("nth") else None,
            }
        )
    return parts


class _Node:
    __slots__ = ("tag", "attrs", "parent", "children", "text_parts")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = dict(attrs)
        self.parent = parent
        self.children: list[_Node] = []
        self.text_parts: list[str] = []

    def text(self) -> str:
        out = list(self.text_parts)
        for c in self.children:
            out.append(c.text())
        return "".join(out)


_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].text_parts.append(data)


def _matches(node: _Node, part: dict) -> bool:
    if part["tag"] and node.tag != part["tag"]:
        return False
    if part["id"] and node.attrs.get("id") != part["id"]:
        return False
    if part["cls"] and part["cls"] not in (node.attrs.get("class") or "").split():
        return False
    if part["nth"] is not None:
        siblings = node.parent.children if node.parent else []
        if part["nth"] - 1 >= len(siblings) or siblings[part["nth"] - 1] is not node:
            return False
    return True


def _select(root: _Node, parts: list[dict]) -> list[_Node]:
    current = [root]
    for part in parts:
        found: list[_Node] = []

        def walk(n: _Node):
            for c in n.children:
                if _matches(c, part):
                    found.append(c)
                walk(c)

        for n in current:
            walk(n)
        current = found
    return current


def select_text(
    html: str, selector: str, regex: str | None = None
) -> str | None:
    """First matching node's text; with ``regex``, the first regex match
    within it (None if either misses) — find_element_text semantics."""
    builder = _TreeBuilder()
    builder.feed(html)
    nodes = _select(builder.root, _parse_selector(selector))
    if not nodes:
        return None
    text = nodes[0].text()
    if regex is None:
        return text
    m = re.search(regex, text)
    return m.group(0) if m else None


def select_texts(html: str, selector: str) -> list[str]:
    """Every matching node's text, document order — the all-matches
    companion to ``select_text`` (paragraph/section harvesting)."""
    builder = _TreeBuilder()
    builder.feed(html)
    return [n.text() for n in _select(builder.root, _parse_selector(selector))]


def select_attr(html: str, selector: str, attr: str) -> str | None:
    builder = _TreeBuilder()
    builder.feed(html)
    nodes = _select(builder.root, _parse_selector(selector))
    return nodes[0].attrs.get(attr) if nodes else None


def select_links(html: str, selector: str = "a") -> list[tuple[str | None, str]]:
    """(href, anchor text) for EVERY node matched by ``selector`` in
    document order — the multi-match sibling of select_text/select_attr
    (link harvesting for outlink graphs / anchor-text corpora); one parse
    per document."""
    builder = _TreeBuilder()
    builder.feed(html)
    return [
        (n.attrs.get("href"), n.text())
        for n in _select(builder.root, _parse_selector(selector))
    ]


def find_download_link(html: str) -> str | None:
    """BulkPDFScraper's button probe: ``#buttons button:nth-child(1)`` ->
    onclick (downloaders.py:215-230)."""
    return select_attr(html, "#buttons button:nth-child(1)", "onclick")


class DomSelectStage:
    """Actor-pool map_batches stage: apply text extractions (name,
    selector, regex-refine) and attribute extractions (name, selector,
    attr) to an html string column — one parse per row serves all of them,
    one output column each. Selectors are parsed once in __init__."""

    def __init__(
        self,
        extractions: list[tuple[str, str, str | None]] | None = None,
        html_col: str = "html",
        attr_extractions: list[tuple[str, str, str]] | None = None,
        keep_html: bool = False,
    ):
        self.extractions = [
            (name, _parse_selector(sel), rx)
            for name, sel, rx in (extractions or [])
        ]
        self.attr_extractions = [
            (name, _parse_selector(sel), attr)
            for name, sel, attr in (attr_extractions or [])
        ]
        self.html_col = html_col
        self.keep_html = keep_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch[self.html_col].to_pylist()
        names = [n for n, _, _ in self.extractions] + [
            n for n, _, _ in self.attr_extractions
        ]
        cols: dict[str, list[str | None]] = {n: [] for n in names}
        for h in htmls:
            if isinstance(h, bytes):
                h = h.decode("utf-8", errors="replace")
            builder = _TreeBuilder()
            builder.feed(h or "")
            for name, parts, rx in self.extractions:
                nodes = _select(builder.root, parts)
                val = nodes[0].text() if nodes else None
                if val is not None and rx is not None:
                    m = re.search(rx, val)
                    val = m.group(0) if m else None
                cols[name].append(val)
            for name, parts, attr in self.attr_extractions:
                nodes = _select(builder.root, parts)
                cols[name].append(nodes[0].attrs.get(attr) if nodes else None)
        out = batch if self.keep_html else batch.drop_columns([self.html_col])
        for name in names:
            out = out.append_column(name, pa.array(cols[name], type=pa.string()))
        return out


# -- XPath-lite ------------------------------------------------------------

_XPATH_STEP = re.compile(r"^([a-zA-Z][a-zA-Z0-9]*)(?:\[(\d+)\])?$")


def xpath_select(html: str, xpath: str) -> str | None:
    """Evaluate an XPath-lite expression against the document:

    - absolute paths ``/html/body/div`` (child axis per step);
    - 1-based positional predicates ``div[2]`` counting SAME-TAG siblings
      (XPath semantics, not nth-child);
    - a leading ``//tag`` descendant step (document-order first walk);
    - a final ``@attr`` step returning the attribute value.

    Returns the first match's text (or attribute), None when the path
    matches nothing — the subset covering the selector workloads the
    CSS engine (select_text) doesn't express, e.g. positional sibling
    indexing and attribute extraction in one expression."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()

    attr = None
    if "/@" in xpath:
        xpath, attr = xpath.rsplit("/@", 1)
    if xpath.startswith("//"):
        steps = xpath[2:].split("/")
        # descendant seed: every node whose tag matches the first step
        first = steps[0]
        m = _XPATH_STEP.match(first)
        if not m:
            return None
        tag0, idx0 = m.group(1), m.group(2)
        seeds: list[_Node] = []

        def walk(n: _Node):
            for c in n.children:
                if c.tag == tag0:
                    seeds.append(c)
                walk(c)

        walk(b.root)
        if idx0:
            k = int(idx0)
            if len(seeds) < k:
                return None
            seeds = [seeds[k - 1]]
        frontier = seeds
        steps = steps[1:]
    else:
        frontier = [b.root]
        steps = [s for s in xpath.split("/") if s]
    for step in steps:
        m = _XPATH_STEP.match(step)
        if not m:
            return None
        tag, idx = m.group(1), m.group(2)
        nxt: list[_Node] = []
        for node in frontier:
            same = [c for c in node.children if c.tag == tag]
            if idx:
                k = int(idx)
                if len(same) >= k:
                    nxt.append(same[k - 1])
            else:
                nxt.extend(same)
        frontier = nxt
        if not frontier:
            return None
    node = frontier[0]
    if attr is not None:
        return node.attrs.get(attr)
    return node.text()
