"""Round-4 batch AD: PDF document-structure graphs (outline tree, link
annotations)."""

from __future__ import annotations

from sciscraper_ray.sources.pdf_write import build_pdf_structured
from sciscraper_ray.stages.pdf_parse import extract_pdf_pages
from sciscraper_ray.stages.pdf_struct import (
    extract_link_annots,
    extract_outline,
)


def test_structured_pdf_pages_still_parse():
    payload = build_pdf_structured(
        ["hello world", "second page"],
        outline=[("A", 0, 0), ("A.1", 1, 1), ("B", 1, 0)],
        links=[(0, (10, 20, 30, 40), "https://x.example/1")],
    )
    assert extract_pdf_pages(payload) == ["hello world", "second page"]


def test_outline_preorder_walk():
    payload = build_pdf_structured(
        ["p0", "p1"],
        outline=[
            ("A", 0, 0),
            ("A.1", 1, 1),
            ("A.2", 0, 1),
            ("B", 1, 0),
            ("C", 0, 0),
            ("C.1", 1, 1),
        ],
    )
    got = extract_outline(payload)
    assert got == [
        (0, 0, "A", 0),
        (1, 1, "A.1", 1),
        (2, 1, "A.2", 0),
        (3, 0, "B", 1),
        (4, 0, "C", 0),
        (5, 1, "C.1", 1),
    ]


def test_outline_flat_and_empty():
    flat = build_pdf_structured(["p0"], outline=[("Only", 0, 0)])
    assert extract_outline(flat) == [(0, 0, "Only", 0)]
    assert extract_outline(build_pdf_structured(["p0"])) == []


def test_outline_unicode_title_roundtrip():
    payload = build_pdf_structured(["p0"], outline=[("Résumé — §2", 0, 0)])
    assert extract_outline(payload) == [(0, 0, "Résumé — §2", 0)]


def test_link_annots_page_major_order():
    # link j on page j%2: harvest order must be page-major, not synthesis
    links = [
        (j % 2, (100 + j, 200 + j, 300 + j, 400 + j), f"u:{j}")
        for j in range(4)
    ]
    got = extract_link_annots(build_pdf_structured(["p0", "p1"], links=links))
    assert [r[6] for r in got] == ["u:0", "u:2", "u:1", "u:3"]
    assert [r[1] for r in got] == [0, 0, 1, 1]
    assert got[1][2:6] == (102, 202, 302, 402)


def test_link_annots_skips_non_uri():
    payload = build_pdf_structured(["p0"], links=[(0, (1, 2, 3, 4), "u:0")])
    # splice a non-link annot dict in front: harvested list is unaffected
    patched = payload.replace(
        b"/Annots [<< /Type /Annot /Subtype /Link",
        b"/Annots [<< /Type /Annot /Subtype /Text /Rect [0 0 5 5] >> "
        b"<< /Type /Annot /Subtype /Link",
    )
    assert patched != payload
    # the patch shifts offsets, so rebuild is not parseable via xref — the
    # body-scan model tolerates that by scanning objects directly
    got = extract_link_annots(patched)
    assert [r[6] for r in got] == ["u:0"]


SF = "/root/testdata/sf0.001"


def _df(out):
    import pandas as pd

    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_pdf_outline_extract_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = (
        _df(QUERIES["pdf_outline_extract"](SF))
        .sort_values(["doc_id", "ord"])
        .reset_index(drop=True)
    )
    import pandas as pd

    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    exp_rows = []
    for did in docs["doc_id"]:
        did = int(did)
        t, c = 1 + did % 3, did % 2
        ordn = 0
        for i in range(t):
            exp_rows.append((did, ordn, 0, f"Section {i + 1} of {did}", i % 2))
            ordn += 1
            for j in range(c):
                exp_rows.append(
                    (did, ordn, 1, f"Sub {i + 1}.{j + 1} of {did}", (i + j + 1) % 2)
                )
                ordn += 1
    exp = pd.DataFrame(
        exp_rows, columns=["doc_id", "ord", "depth", "title", "page_idx"]
    ).sort_values(["doc_id", "ord"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns].astype(exp.dtypes), exp)


def test_pdf_annotation_links_query(ray_session):
    import pandas as pd

    from sciscraper_ray.pipelines.queries import QUERIES

    got = (
        _df(QUERIES["pdf_annotation_links"](SF))
        .sort_values(["doc_id", "link_ord"])
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    exp_rows = []
    for did in docs["doc_id"]:
        did = int(did)
        for j in range(1 + did % 4):
            exp_rows.append(
                (
                    did, j, j % 2,
                    100 + 10 * j, 700 - 20 * j, 160 + 10 * j, 712 - 20 * j,
                    f"https://ref.example/{did}/{j}",
                )
            )
    exp = pd.DataFrame(
        exp_rows,
        columns=[
            "doc_id", "link_ord", "page_idx", "x0", "y0", "x1", "y1", "uri"
        ],
    ).sort_values(["doc_id", "link_ord"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns].astype(exp.dtypes), exp)
