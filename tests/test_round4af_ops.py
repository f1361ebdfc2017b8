"""Round-4 batch AF: HTML table grid extraction + JSON-LD harvest."""

from __future__ import annotations

from sciscraper_ray.stages.html_tables import extract_jsonld, extract_tables


def _grid(rows):
    return {(r, c): t for (_t, r, c, t, _h) in rows}


def test_table_plain_grid():
    html = "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"
    rows = extract_tables(html)
    assert _grid(rows) == {(0, 0): "a", (0, 1): "b", (1, 0): "1", (1, 1): "2"}
    assert [h for (_, r, _, _, h) in rows if r == 0] == [True, True]
    assert [h for (_, r, _, _, h) in rows if r == 1] == [False, False]


def test_table_colspan_fills_slots():
    html = "<table><tr><td colspan='2'>x</td><td>y</td></tr></table>"
    assert _grid(extract_tables(html)) == {(0, 0): "x", (0, 1): "x", (0, 2): "y"}


def test_table_rowspan_shifts_next_row():
    html = (
        "<table><tr><td rowspan='2'>x</td><td>a</td></tr>"
        "<tr><td>b</td></tr></table>"
    )
    assert _grid(extract_tables(html)) == {
        (0, 0): "x", (0, 1): "a", (1, 0): "x", (1, 1): "b",
    }


def test_table_colspan_rowspan_block():
    html = (
        "<table><tr><td colspan='2' rowspan='2'>x</td><td>a</td></tr>"
        "<tr><td>b</td></tr><tr><td>c</td><td>d</td><td>e</td></tr></table>"
    )
    assert _grid(extract_tables(html)) == {
        (0, 0): "x", (0, 1): "x", (0, 2): "a",
        (1, 0): "x", (1, 1): "x", (1, 2): "b",
        (2, 0): "c", (2, 1): "d", (2, 2): "e",
    }


def test_multiple_tables_indexed():
    html = "<table><tr><td>a</td></tr></table><p>x</p><table><tr><td>b</td></tr></table>"
    rows = extract_tables(html)
    assert [(t, txt) for (t, _, _, txt, _) in rows] == [(0, "a"), (1, "b")]


def test_jsonld_order_and_malformed_skip():
    html = (
        '<script type="application/ld+json">{"@type": broken</script>'
        '<script type="application/ld+json">{"@type":"A","n":1}</script>'
        "<script>var x = 1;</script>"
        '<script type="application/ld+json">[1,2]</script>'
        '<script type="application/ld+json">{"@type":"B","n":2}</script>'
    )
    got = extract_jsonld(html)
    assert [g["@type"] for g in got] == ["A", "B"]


def test_registered_queries_rows(ray_session):
    import pandas as pd

    from sciscraper_ray.pipelines.queries import QUERIES

    SF = "/root/testdata/sf0.001"
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    t = QUERIES["page_html_tables"](SF).to_pandas()
    # every doc emits (r+1)*c slots for table 0, plus one %4 slot
    exp = sum(
        (2 + int(i) % 3 + 1) * (2 + int(i) % 2) + (1 if i % 4 == 0 else 0)
        for i in docs["doc_id"]
    )
    assert len(t) == exp
    j = QUERIES["page_jsonld_extract"](SF).to_pandas()
    exp_j = len(docs) + (docs["doc_id"] % 6 == 0).sum()
    assert len(j) == exp_j
    # malformed leading blocks never shift the valid ordinal
    assert (j[j["type"] == "ScholarlyArticle"]["block_ord"] == 0).all()
