"""HTML/PDF extraction tests: boilerplate stripping, layout parsing,
routing, dedup, byte-identical round trips, error degradation."""

from __future__ import annotations

import pyarrow as pa
import pytest

from sciscraper_ray.sources.page_synth import render_html, synth_pages_batch
from sciscraper_ray.sources.pdf_write import build_pdf
from sciscraper_ray.stages.html_extract import extract_main_content
from sciscraper_ray.stages.pdf_parse import extract_pdf_text


def test_html_extractor_strips_boilerplate():
    text = " ".join(f"word{i}" for i in range(60))
    html = render_html(7, text, "en").decode()
    got, spans = extract_main_content(html)
    assert got == text
    # nav/footer/sidebar content must not leak
    for boiler in ("privacy", "newsletter", "about us", "related one", "Document 7"):
        assert boiler not in got
    # spans tile the extracted text (two 40/20-word paragraphs)
    assert len(spans) == 2
    assert spans[0][0] == 0 and spans[-1][1] == len(got)
    assert got[spans[1][0] : spans[1][1]] == " ".join(f"word{i}" for i in range(40, 60))


def test_html_extractor_entities_and_garbage():
    got, _ = extract_main_content(
        "<body><article><p>a &amp; b &lt;tag&gt; and some more padding text</p></article></body>"
    )
    assert got == "a & b <tag> and some more padding text"
    # garbage input degrades, never raises
    extract_main_content("<<<>>>< not html at all")
    extract_main_content("")


def test_pdf_multipage_multiline():
    pages = ["first page words here", "second page more words"]
    text, n = extract_pdf_text(build_pdf(pages))
    assert n == 2
    assert text == "first page words here second page more words"
    # multi-line pages produce newlines within a page (pdfplumber-style)
    text2, _ = extract_pdf_text(build_pdf(["one two three four"], lines_per_page=2))
    assert text2 == "one two\nthree four"


def test_pdf_escapes():
    tricky = r"paren (open and close) back\slash"
    text, _ = extract_pdf_text(build_pdf([tricky]))
    assert text == tricky


@pytest.mark.usefixtures("ray_session")
def test_extraction_pipeline_end_to_end():
    import ray.data

    from sciscraper_ray.pipelines.extract import extraction_pipeline

    docs = pa.table(
        {
            "doc_id": pa.array(range(12), pa.int64()),
            "text": pa.array(
                [" ".join(f"tok{i}w{j}" for j in range(50)) for i in range(12)]
            ),
            "lang": pa.array(["en"] * 12),
        }
    )
    pages = synth_pages_batch(docs, pdf_mod=3, dup_mod=5)
    ds = ray.data.from_arrow(pages)
    out = extraction_pipeline(ds, dedup=True, analyze=True).to_pandas()
    assert len(out) == 12  # dup fetches removed
    src = {i: t for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())}
    for _, r in out.iterrows():
        assert r["extract_status"] == "ok"
        assert r["extracted_text"] == src[r["doc_id"]], r["doc_id"]
        assert r["total_word_count"] == 50
    # both payload routes exercised
    assert (out["doc_id"] % 3 == 0).any() and (out["doc_id"] % 3 != 0).any()


@pytest.mark.usefixtures("ray_session")
def test_extraction_error_rows_degrade():
    import ray.data

    from sciscraper_ray.stages.pdf_parse import PdfParser

    bad = pa.table(
        {
            "url": pa.array(["u1", "u2"]),
            "html": pa.array([b"%PDF-garbage no streams", None], type=pa.binary()),
        }
    )
    out = (
        ray.data.from_arrow(bad)
        .map_batches(PdfParser, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert out["extract_status"].str.startswith(("ok", "error")).all()
    assert out["extracted_text"].iloc[1] is None


def test_keep_latest_merge_plans_agree(ray_session):
    """driver-merge and shuffle-merge keep-latest produce identical rows."""
    import pyarrow.parquet as pq

    import ray.data
    from sciscraper_ray.pipelines.extract import keep_latest_by_url
    from sciscraper_ray.sources.page_synth import synth_pages_batch

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    ).slice(0, 150)
    pages = synth_pages_batch(docs, pdf_mod=10, dup_mod=7)
    ds = ray.data.from_arrow(pages)
    a = (
        keep_latest_by_url(ds, key_merge="driver")
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    b = (
        keep_latest_by_url(ds, key_merge="shuffle")
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    assert len(a) == 150  # dups removed
    assert a["url"].tolist() == b["url"].tolist()
    assert a["warc_ts"].tolist() == b["warc_ts"].tolist()


from hypothesis import given, settings
from hypothesis import strategies as st

# word alphabet deliberately includes unicode, digits and punctuation that
# must survive HTML-escape round-trips and PDF string encoding
_words = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd", "Po"),
        blacklist_characters=" \t\n\r",
        max_codepoint=0x2FF,
    ),
    min_size=1,
    max_size=12,
)
_texts = st.lists(_words, min_size=1, max_size=120).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(text=_texts, doc_id=st.integers(0, 10_000))
def test_html_roundtrip_byte_identical(text, doc_id):
    """render -> readability strip reproduces the text byte-identically,
    and spans index exactly into it (north-star per-row invariant)."""
    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.html_extract import extract_main_content

    html = render_html(doc_id, text, "en").decode("utf-8")
    got, spans = extract_main_content(html)
    assert got == text
    words = text.split(" ")
    blocks = [" ".join(words[i : i + 40]) for i in range(0, len(words), 40)]
    assert [got[s:e] for s, e in spans] == blocks


@settings(max_examples=40, deadline=None)
@given(text=_texts)
def test_pdf_roundtrip_byte_identical(text):
    """build_pdf -> layout parse, pages joined with " "
    (docscraper.py:202-205 semantics) reproduces the text exactly."""
    from sciscraper_ray.sources.pdf_write import build_pdf
    from sciscraper_ray.stages.pdf_parse import extract_pdf_pages

    words = text.split(" ")
    pages = [" ".join(words[i : i + 40]) for i in range(0, len(words), 40)]
    payload = build_pdf(pages)
    got = extract_pdf_pages(payload)
    assert " ".join(got) == text


def test_pdf_odd_length_hex_string_pads():
    """PDF spec 7.3.4.3: odd final hex digit is padded with 0."""
    from sciscraper_ray.stages.pdf_parse import _tokenize

    toks = list(_tokenize(b"<48656C6C6F2> Tj"))
    assert toks[0] == ("str", b"Hello "), toks


def test_keep_latest_drops_same_batch_ts_ties(ray_session):
    import pyarrow as pa

    import ray.data
    from sciscraper_ray.pipelines.extract import keep_latest_by_url

    t = pa.table(
        {
            "url": ["u", "u", "v"],
            "warc_ts": pa.array([100, 100, 5], pa.timestamp("us")),
            "payload": ["a", "b", "c"],
        }
    )
    out = keep_latest_by_url(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out["url"]) == ["u", "v"]  # one survivor per url


def test_keep_latest_int_epoch_ts(ray_session):
    """ADVICE r1: an int64 epoch-us warc_ts column must dedup identically
    to a timestamp[us] one — the two passes used to normalize ints
    differently (ns vs us), so winner keys never matched and every
    duplicated url was silently dropped."""
    import pyarrow as pa

    import ray.data
    from sciscraper_ray.pipelines.extract import keep_latest_by_url

    base = 1_700_000_000_000_000  # epoch-us
    as_int = pa.table(
        {
            "url": ["u", "u", "v", "w"],
            "warc_ts": pa.array([base + 1, base + 9, base, base], pa.int64()),
            "payload": ["old", "new", "x", "y"],
        }
    )
    out = (
        keep_latest_by_url(ray.data.from_arrow(as_int))
        .to_pandas()
        .sort_values("url")
    )
    assert list(out["url"]) == ["u", "v", "w"]
    assert out[out["url"] == "u"]["payload"].iloc[0] == "new"

    as_ts = as_int.set_column(
        1, "warc_ts", pa.compute.cast(as_int["warc_ts"], pa.timestamp("us"))
    )
    out_ts = (
        keep_latest_by_url(ray.data.from_arrow(as_ts))
        .to_pandas()
        .sort_values("url")
    )
    assert list(out_ts["payload"]) == list(out["payload"])


def test_keep_latest_auto_plan_flips(ray_session):
    """key_merge='auto' must pick the shuffle plan above the driver limit
    (the 10^12-row safety: scale must not depend on a caller kwarg)."""
    import pyarrow as pa

    import ray.data
    from sciscraper_ray.pipelines.extract import keep_latest_by_url

    t = pa.table(
        {
            "url": [f"u{i}" for i in range(10)] + ["u0"],
            "warc_ts": pa.array(list(range(10)) + [99], pa.timestamp("us")),
            "payload": [str(i) for i in range(11)],
        }
    )
    ds = ray.data.from_arrow(t)
    # limit below the key count -> auto resolves to shuffle; result identical
    out = keep_latest_by_url(ds, key_merge="auto", driver_merge_limit=3).to_pandas()
    assert len(out) == 10
    assert "0" not in set(out[out["url"] == "u0"]["payload"])


def test_pdf_info_round_trip():
    """M10: /Info dict written by the synthetic writer is recoverable,
    pdfplumber-shaped (slash-less keys, insertion order preserved)."""
    from sciscraper_ray.sources.pdf_write import build_pdf
    from sciscraper_ray.stages.pdf_parse import extract_pdf_info, extract_pdf_pages

    pdf = build_pdf(
        ["hello world"],
        info={"Title": "Doc (1)", "doi": "10.5555/meta.8", "arxiv": "2345.6789"},
    )
    info = extract_pdf_info(pdf)
    assert info == {
        "Title": "Doc (1)", "doi": "10.5555/meta.8", "arxiv": "2345.6789"
    }
    assert list(info) == ["Title", "doi", "arxiv"]  # on-disk order
    assert extract_pdf_pages(pdf) == ["hello world"]  # text unharmed
    assert extract_pdf_info(build_pdf(["x"])) == {}  # no Info -> {}


def test_pdf_string_escapes_per_spec():
    """ADVICE r2: PDF literal-string escapes decode per spec §7.3.4.2 —
    \\n/\\t/\\r are control chars (not the letters n/t/r), octal \\ddd
    decodes, \\<EOL> is a line continuation, unknown escapes fall through
    to the literal byte."""
    from sciscraper_ray.stages.pdf_parse import _decode_pdf_string

    assert _decode_pdf_string(rb"(a\nb\tc\rd)") == "a\nb\tc\rd"
    assert _decode_pdf_string(rb"(\101\102\1038)") == "ABC8"  # 3-digit octal + literal 8
    assert _decode_pdf_string(rb"(\53)") == "+"  # 2-digit octal
    assert _decode_pdf_string(b"(one \\\ntwo)") == "one two"  # continuation
    assert _decode_pdf_string(b"(one \\\r\ntwo)") == "one two"  # CRLF continuation
    assert _decode_pdf_string(rb"(par\(en\))") == "par(en)"
    assert _decode_pdf_string(rb"(back\\slash)") == "back\\slash"
    assert _decode_pdf_string(rb"(unk\zq)") == "unkzq"  # unknown escape


def test_metadata_probe_order_and_raw_value():
    """M8 (doifrompdf.py:55-82): fixed probe order doi >
    pdf2doi_identifier > arxiv (replacing the reference's set iteration);
    the RAW value is returned with the KEY as identifier type."""
    from sciscraper_ray.kernels.identifiers import find_identifier_in_metadata

    meta = {
        "arxiv": "2345.1111",
        "pdf2doi_identifier": "10.4444/p.1",
        "doi": "RAW-VALUE-NOT-NORMALIZED",
    }
    assert find_identifier_in_metadata(meta) == ("RAW-VALUE-NOT-NORMALIZED", "doi")
    del meta["doi"]
    assert find_identifier_in_metadata(meta) == ("10.4444/p.1", "pdf2doi_identifier")
    del meta["pdf2doi_identifier"]
    assert find_identifier_in_metadata(meta) == ("2345.1111", "arxiv")
    assert find_identifier_in_metadata({"Title": "x"}) is None
    assert find_identifier_in_metadata({"doi": ""}) is None  # falsy skipped


def test_pdf_info_scan_last_value_wins():
    """M9 (doifrompdf.py:85-111): the loop overwrites result per value —
    only the LAST value's outcome survives; '/wps-journaldoi' is skipped."""
    from sciscraper_ray.kernels.identifiers import find_identifier_in_pdf_info

    hit_then_miss = {"Title": "see doi:10.3333/x.1 inside", "Producer": "none"}
    assert find_identifier_in_pdf_info(hit_then_miss) is None
    miss_then_hit = {"Producer": "none", "Title": "see doi:10.3333/x.1 inside"}
    assert find_identifier_in_pdf_info(miss_then_hit) == ("10.3333/x.1", "doi")
    excluded = {"/wps-journaldoi": "doi:10.9999/skip.me"}
    assert find_identifier_in_pdf_info(excluded) is None
