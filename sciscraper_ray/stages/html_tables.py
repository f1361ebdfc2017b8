"""HTML structured-data extraction: <table> grids and JSON-LD blocks.

Two extraction surfaces the boilerplate stripper deliberately ignores but
a web-scale corpus pipeline mines separately:

- ``extract_tables``: the HTML table model's grid-filling algorithm
  (WHATWG §4.9.12 "forming a table"): written cells place left-to-right
  skipping slots occupied by rowspans from above; colspan/rowspan expand
  a cell over multiple slots. Emits the FILLED grid — every (row, col)
  slot with the text of the cell covering it — which is the relational
  form downstream table-QA / table-corpus pipelines want.

- ``extract_jsonld``: <script type="application/ld+json"> payloads parsed
  as JSON (schema.org metadata embedding); invalid JSON blocks are
  skipped, multiple blocks per page preserved in document order.

Both are stdlib-HTMLParser passes — pure per-payload functions for
``map_batches``, zero exchange.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser


class _TableGridParser(HTMLParser):
    """Builds one filled grid per <table> (nested tables are treated as
    sibling tables in document order, their cells not leaking into the
    parent — sufficient for the flat fixtures and the common crawl case)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[dict[tuple[int, int], tuple[str, bool]]] = []
        self._grid: dict[tuple[int, int], tuple[str, bool]] | None = None
        self._row = -1
        self._col = 0
        self._pending: dict[int, tuple[int, str, bool]] = {}  # col -> (rows_left, text, hdr)
        self._cell: list[str] | None = None
        self._cell_span: tuple[int, int] | None = None
        self._cell_hdr = False

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "table":
            self._flush_cell()
            self.tables.append({})
            self._grid = self.tables[-1]
            self._row = -1
            self._pending = {}
        elif tag == "tr" and self._grid is not None:
            self._flush_cell()
            self._row += 1
            self._col = 0
            # rowspan carry-down: occupy this row's slots first
            for col, (left, text, hdr) in sorted(self._pending.items()):
                if left > 0:
                    self._grid[(self._row, col)] = (text, hdr)
            self._pending = {
                c: (left - 1, t, h)
                for c, (left, t, h) in self._pending.items()
                if left - 1 > 0
            }
        elif tag in ("td", "th") and self._grid is not None and self._row >= 0:
            self._flush_cell()
            try:
                cs = max(1, int(a.get("colspan", 1)))
            except ValueError:
                cs = 1
            try:
                rs = max(1, int(a.get("rowspan", 1)))
            except ValueError:
                rs = 1
            # skip slots occupied by rowspans from above
            while (self._row, self._col) in self._grid:
                self._col += 1
            self._cell = []
            self._cell_span = (cs, rs)
            self._cell_hdr = tag == "th"

    def handle_endtag(self, tag):
        if tag in ("td", "th", "tr", "table"):
            self._flush_cell()
        if tag == "table":
            self._grid = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)

    def _flush_cell(self) -> None:
        if self._cell is None or self._grid is None:
            self._cell = None
            return
        text = "".join(self._cell).strip()
        cs, rs = self._cell_span or (1, 1)
        for dj in range(cs):
            col = self._col + dj
            self._grid[(self._row, col)] = (text, self._cell_hdr)
            if rs > 1:
                # rows_left counts FUTURE rows this cell still covers
                self._pending[col] = (rs - 1, text, self._cell_hdr)
        self._col += cs
        self._cell = None
        self._cell_span = None


def extract_tables(html: str) -> list[tuple[int, int, int, str, bool]]:
    """``(table_idx, row, col, text, is_header)`` for every filled grid
    slot, in (table, row, col) order."""
    p = _TableGridParser()
    p.feed(html)
    p.close()
    out: list[tuple[int, int, int, str, bool]] = []
    for t_idx, grid in enumerate(p.tables):
        for (r, c), (text, hdr) in sorted(grid.items()):
            out.append((t_idx, r, c, text, hdr))
    return out


class _JsonLdParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._in_ld = False
        self._buf: list[str] = []
        self.blocks: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "script" and dict(attrs).get("type") == "application/ld+json":
            self._in_ld = True
            self._buf = []

    def handle_endtag(self, tag):
        if tag == "script" and self._in_ld:
            self._in_ld = False
            self.blocks.append("".join(self._buf))

    def handle_data(self, data):
        if self._in_ld:
            self._buf.append(data)


def extract_jsonld(html: str) -> list[dict]:
    """Parsed JSON-LD objects in document order; blocks that fail JSON
    parsing (or parse to a non-object) are skipped — a crawl is full of
    truncated/malformed embeds and one bad page must not kill the task."""
    p = _JsonLdParser()
    p.feed(html)
    p.close()
    out: list[dict] = []
    for raw in p.blocks:
        try:
            v = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if isinstance(v, dict):
            out.append(v)
    return out


class _HreflangParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.alternates: list[tuple[str, str]] = []

    def handle_starttag(self, tag, attrs):
        if tag != "link":
            return
        a = dict(attrs)
        if a.get("rel") == "alternate" and a.get("hreflang") and a.get("href"):
            self.alternates.append((a["hreflang"], a["href"]))


def extract_hreflang(html: str) -> list[tuple[str, str]]:
    """``(hreflang, href)`` pairs from <link rel="alternate"> tags in
    document order — the language-variant cluster declaration
    (RFC 8288 link relations; Google's hreflang contract)."""
    p = _HreflangParser()
    p.feed(html)
    p.close()
    return p.alternates


class _RssParser(HTMLParser):
    """RSS 2.0 item harvest (HTMLParser lowercases tag names, so
    <pubDate> arrives as 'pubdate' — normalized here)."""

    _FIELDS = ("title", "guid", "pubdate")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.items: list[dict[str, str]] = []
        self._in_item = False
        self._field: str | None = None
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "item":
            self._in_item = True
            self.items.append({})
        elif self._in_item and tag in self._FIELDS:
            self._field = tag
            self._buf = []

    def handle_endtag(self, tag):
        if tag == "item":
            self._in_item = False
        elif self._in_item and tag == self._field:
            self.items[-1][tag] = "".join(self._buf).strip()
            self._field = None

    def handle_data(self, data):
        if self._field is not None:
            self._buf.append(data)


def extract_rss_items(xml: str) -> list[dict[str, str]]:
    """``{title, guid, pubdate}`` per <item> in document order; fields
    missing from an item are absent from its dict. Entity references in
    titles arrive unescaped (convert_charrefs)."""
    p = _RssParser()
    p.feed(xml)
    p.close()
    return p.items
