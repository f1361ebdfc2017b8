"""GoogleScholar pagination analog — the last reference behavior with no
engine twin (VERDICT r2 #8).

The reference's ``GoogleScholarScraper.obtain``
(/root/reference/src/webscrapers.py:94-161) is a GENERATOR: it walks
``num_pages = (num_articles - 1) // 10 + 1`` result pages (``start = page *
10``), CSS-parses each page's ``div.gs_ri`` result nodes, and yields one
record per result — title from ``h3.gs_rt``, abstract from ``.gs_rs``,
``times_cited`` from ``.gs_flb`` refined by ``\\d+``, year from ``.gs_a``
refined by ``\\d{4}``.

The offline analog keeps the engine-side contract intact and replaces only
the transport: a deterministic fixture transport renders each (query,
page) as Scholar-shaped HTML, the pagination loop is a flat_map-shaped
expansion (1 query -> num_pages page rows), and the result parse is the
same CSS-select + regex-refine machinery as every DOM stage
(stages/dom_select.py), exploding each page into <= 10 result rows.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from sciscraper_ray.stages.dom_select import (
    _parse_selector,
    _select,
    _TreeBuilder,
)

PAGE_SIZE = 10


def n_articles_for(qid: int) -> int:
    """Deterministic per-query result count (1..37) — the fixture
    transport's ground truth, restated in the SQL oracle."""
    return (qid * 7 + 3) % 37 + 1


def scholar_page_html(qid: int, page: int) -> str:
    """One Scholar-results page for (query, page): up to 10 ``div.gs_ri``
    entries shaped like the reference's selectors expect."""
    total = n_articles_for(qid)
    lo = page * PAGE_SIZE
    hi = min(total, lo + PAGE_SIZE)
    entries = []
    for rank in range(lo, hi):
        year = 1980 + (qid + rank) % 45
        cites = (qid * (rank + 1)) % 997
        entries.append(
            f'<div class="gs_ri">'
            f'<h3 class="gs_rt">Deterministic result {rank} for query {qid}</h3>'
            f'<div class="gs_rs">Abstract snippet {(qid + rank * 13) % 101}</div>'
            f'<span class="gs_a">A. Author - {year}</span>'
            f'<span class="gs_flb">Cited by {cites}</span>'
            f"</div>"
        )
    return (
        f'<html><body><div id="gs_res">{"".join(entries)}</div></body></html>'
    )


def expand_pages(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """The pagination loop as a flat_map-shaped batch expansion: one row
    per (query, page), num_pages = (n - 1) // 10 + 1 exactly like the
    reference's range loop. The fixture transport renders the HTML here;
    a live transport would fetch the same (query, start) URL grid."""
    qids = batch[id_col].to_numpy(zero_copy_only=False)
    n = (qids * 7 + 3) % 37 + 1
    n_pages = (n - 1) // PAGE_SIZE + 1
    out_qid = np.repeat(qids, n_pages)
    page_no = np.arange(len(out_qid)) - np.repeat(
        np.concatenate(([0], np.cumsum(n_pages)[:-1])), n_pages
    )
    htmls = [scholar_page_html(int(q), int(p)) for q, p in zip(out_qid, page_no)]
    return pa.table(
        {
            "qid": pa.array(out_qid, pa.int64()),
            "page_no": pa.array(page_no, pa.int64()),
            "html": pa.array(htmls, pa.string()),
        }
    )


class ScholarResultsStage:
    """Actor-pool map_batches stage: parse each page's ``div.gs_ri``
    entries with the shared CSS-select engine and explode to one row per
    result. Selectors compile once per actor (__init__), one tree parse
    per page serves all four fields — find_element_text semantics
    (first match, regex refine, int coercion for times_cited like
    ``int(times_cited)`` in the reference)."""

    def __init__(self):
        self.item_sel = _parse_selector("div.gs_ri")
        self.fields = [
            ("title", _parse_selector("h3.gs_rt"), None),
            ("abstract", _parse_selector(".gs_rs"), None),
            ("gs_a", _parse_selector(".gs_a"), r"\d{4}"),
            ("gs_flb", _parse_selector(".gs_flb"), r"\d+"),
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qid_out, rank_out = [], []
        title_out, abs_out, year_out, cited_out = [], [], [], []
        for qid, page, html in zip(
            batch["qid"].to_pylist(),
            batch["page_no"].to_pylist(),
            batch["html"].to_pylist(),
        ):
            builder = _TreeBuilder()
            builder.feed(html or "")
            for idx, node in enumerate(_select(builder.root, self.item_sel)):
                vals = {}
                for name, sel, rx in self.fields:
                    hits = _select(node, sel)
                    v = hits[0].text() if hits else None
                    if v is not None and rx is not None:
                        m = re.search(rx, v)
                        v = m.group(0) if m else None
                    vals[name] = v
                qid_out.append(qid)
                rank_out.append(page * PAGE_SIZE + idx)
                title_out.append(vals["title"])
                abs_out.append(vals["abstract"])
                year_out.append(int(vals["gs_a"]) if vals["gs_a"] else None)
                cited_out.append(int(vals["gs_flb"]) if vals["gs_flb"] else None)
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.int64()),
                "rank": pa.array(rank_out, pa.int64()),
                "title": pa.array(title_out, pa.string()),
                "abstract": pa.array(abs_out, pa.string()),
                "pub_year": pa.array(year_out, pa.int64()),
                "times_cited": pa.array(cited_out, pa.int64()),
            }
        )
