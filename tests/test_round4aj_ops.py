"""Round-4 batch AJ: PDF incremental updates + CSV schema inference."""

from __future__ import annotations

from sciscraper_ray.pipelines.queries.cleaning import infer_csv_schema
from sciscraper_ray.sources.pdf_write import (
    _page_stream,
    append_incremental_update,
    build_pdf,
)
from sciscraper_ray.stages.pdf_parse import extract_pdf_pages


def _update(payload: bytes, obj_num: int, text: str) -> bytes:
    stream = _page_stream([text])
    body = (
        f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
        + stream
        + b"\nendstream"
    )
    return append_incremental_update(payload, obj_num, body)


def test_incremental_update_newest_wins():
    base = build_pdf(["original words here"])
    assert extract_pdf_pages(base) == ["original words here"]
    v2 = _update(base, 5, "second version")
    assert extract_pdf_pages(v2) == ["second version"]
    # chained updates: the NEWEST of several generations wins
    v3 = _update(v2, 5, "third version")
    assert extract_pdf_pages(v3) == ["third version"]
    assert v3.count(b"%%EOF") == 3
    # /Prev chain points at the prior xref of each generation
    assert b"/Prev" in v3[len(base):]


def test_incremental_update_other_object_untouched():
    base = build_pdf(["page one text", "page two text"])
    # update only page TWO's content (object 7)
    v2 = _update(base, 7, "revised two")
    assert extract_pdf_pages(v2) == ["page one text", "revised two"]


def test_csv_infer_lattice():
    blob = (
        "a,b,c,d,e,f\n"
        "1,true,2024-01-02,1.5,x,\n"
        "2,false,2024-02-03,7,y,\n"
        ",TRUE,2024-03-04,2e3,3,"
    )
    got = {name: (t, n) for name, t, n in infer_csv_schema(blob)}
    assert got == {
        "a": ("bigint", 1),
        "b": ("boolean", 0),
        "c": ("date", 0),
        "d": ("double", 0),  # int+float+exponent mix promotes to double
        "e": ("varchar", 0),  # late string demotes the whole column
        "f": ("null", 3),
    }


def test_csv_infer_int_not_bool_not_date():
    # digits that LOOK like parts of dates/bools must stay bigint
    blob = "x\n2024\n-5\n0"
    assert infer_csv_schema(blob) == [("x", "bigint", 0)]


def test_queries_registered(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    SF = "/root/testdata/sf0.001"
    pdf = QUERIES["pdf_incremental_update_extract"](SF).to_pandas()
    assert (pdf[pdf["doc_id"] % 3 == 0]["n_generations"] == 2).all()
    assert (pdf[pdf["doc_id"] % 3 != 0]["n_generations"] == 1).all()
    assert (
        pdf[pdf["doc_id"] % 3 == 0]["extracted_text"]
        .str.startswith("REVISED ")
        .all()
    )
    csv = QUERIES["csv_schema_infer"](SF).to_pandas()
    assert len(csv) == 2000
    assert set(csv[csv["col"] == "c3"]["inferred_type"]) == {"null"}
