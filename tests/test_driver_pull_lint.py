"""Structural guard against unguarded driver pulls (VERDICT r4 item 1).

The round-3/4 scale bugs (``doc_ngram_novelty``, ``events_dau_stickiness``,
``token_zipf_slope``) all had the same shape: a data-proportional
intermediate table pulled to the driver with a bare ``.to_pandas()``,
invisible among ~200 legitimate pulls. This lint makes the class
structurally impossible to reintroduce: every ``.to_pandas()`` in the
query registry must be one of

  * ``driver_frame(...)`` — the guarded pull (``pipelines/plan.py``),
    which fails fast past the 50M-row driver plan limit;
  * annotated ``# bounded: <why>`` on the call line or the three lines
    above — the author's claim that the row count is bounded by something
    sf-invariant (|days|, |types|, buckets, k, vocab-of-a-fixed-list, a
    prior ``limit(...)``), checkable in review;
  * annotated ``# final`` — the query's result fetch itself (the harness
    compares full frames; a final per-entity table is the answer, not an
    intermediate).

A bare ``.to_pandas()`` with none of the three fails this test with the
file:line list, so the reviewer sees every new driver pull and its
justification in the diff that introduces it.
"""

import re
from pathlib import Path

QUERIES_DIR = (
    Path(__file__).resolve().parent.parent
    / "sciscraper_ray"
    / "pipelines"
    / "queries"
)

_MARK = re.compile(r"#\s*(bounded:|final\b)")


def test_no_unguarded_driver_pulls():
    offenders = []
    for path in sorted(QUERIES_DIR.glob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if ".to_pandas(" not in line:
                continue
            if "driver_frame(" in line:
                continue
            window = lines[max(0, i - 3) : i + 1]
            if any(_MARK.search(w) for w in window):
                continue
            offenders.append(f"{path.name}:{i + 1}: {line.strip()[:90]}")
    assert not offenders, (
        "bare .to_pandas() without driver_frame / '# bounded:' / '# final' "
        "annotation (see tests/test_driver_pull_lint.py docstring):\n"
        + "\n".join(offenders)
    )
