"""CSS-select DOM extraction (M19/M20 rebuild) over stdlib html.parser."""

from __future__ import annotations

import pyarrow as pa
import pytest

from sciscraper_ray.stages.dom_select import (
    DomSelectStage,
    find_download_link,
    select_attr,
    select_text,
)

PAGE = """
<html><body>
<div id="gs_res">
  <div class="gs_ri">
    <h3 class="gs_rt">A Study of Things</h3>
    <div class="gs_fl">Cited by 123 - year 2015</div>
  </div>
  <div class="gs_ri">
    <h3 class="gs_rt">Second Result</h3>
    <div class="gs_fl">Cited by 7 - year 1999</div>
  </div>
</div>
<div id="buttons"><button onclick="location.href='/downloads/a.pdf">save</button>
<button onclick="location.href='/other.pdf">other</button></div>
</body></html>
"""


def test_select_text_first_match():
    assert select_text(PAGE, "h3.gs_rt") == "A Study of Things"


def test_select_text_regex_refine():
    # find_element_text's \d+ / \d{4} refinements (webscrapers.py:163-183)
    assert select_text(PAGE, "div.gs_fl", r"\d+") == "123"
    assert select_text(PAGE, "div.gs_fl", r"\d{4}") == "2015"


def test_select_by_id_and_descendant():
    assert select_text(PAGE, "#gs_res h3") == "A Study of Things"
    assert select_text(PAGE, "#missing") is None


def test_nth_child_and_attr():
    assert (
        select_attr(PAGE, "#buttons button:nth-child(1)", "onclick")
        == "location.href='/downloads/a.pdf"
    )
    assert find_download_link(PAGE) == "location.href='/downloads/a.pdf"
    assert find_download_link("<div>no buttons</div>") is None


def test_regex_miss_returns_none():
    assert select_text(PAGE, "h3.gs_rt", r"\d{9}") is None


def test_unsupported_selector_raises():
    with pytest.raises(ValueError):
        select_text(PAGE, "a[href]")


def test_dom_select_stage_batch():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "html": pa.array([PAGE, "<p>plain</p>"], pa.string()),
        }
    )
    out = DomSelectStage(
        [("title", "h3.gs_rt", None), ("cited", "div.gs_fl", r"\d+")]
    )(batch)
    assert out["title"].to_pylist() == ["A Study of Things", None]
    assert out["cited"].to_pylist() == ["123", None]
    assert "html" not in out.column_names
