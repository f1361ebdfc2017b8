"""Round-4 session-G additions: Good-Turing count-of-counts, vocab
coverage curve, PDF xref audit — first-principles pandas/python
recomputes (oracle parity runs in tools/check_correctness.py)."""

from collections import Counter

import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES
from sciscraper_ray.pipelines.queries.extraction import _pdf_audit_one
from sciscraper_ray.sources.pdf_write import build_pdf

SF = "/root/testdata/sf0.001"


def _df(out):
    return out.to_pandas() if hasattr(out, "to_pandas") else out


def _trigram_counts() -> Counter:
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    c: Counter = Counter()
    for t in docs["text"]:
        toks = t.lower().strip().split(" ")
        for i in range(len(toks) - 2):
            c[" ".join(toks[i : i + 3])] += 1
    return c


def test_token_good_turing(ray_session):
    got = _df(QUERIES["token_good_turing"](SF)).set_index("r")
    hist = Counter(_trigram_counts().values())  # r -> N_r
    assert set(got.index) == set(hist)
    for r, n_r in hist.items():
        assert int(got.loc[r, "n_r"]) == n_r
        assert int(got.loc[r, "gt_num"]) == (r + 1) * hist.get(r + 1, 0)


def test_token_coverage_topk(ray_session):
    got = _df(QUERIES["token_coverage_topk"](SF)).set_index("pct")
    counts = sorted(_trigram_counts().values(), reverse=True)
    total = sum(counts)
    for pct in (50, 90, 99):
        # brute-force greedy: admit most-frequent types one at a time
        covered = 0
        k = 0
        for c in counts:
            if 100 * covered >= pct * total:
                break
            covered += c
            k += 1
        assert int(got.loc[pct, "vocab_size"]) == k
        assert int(got.loc[pct, "covered_mass"]) == covered
        assert int(got.loc[pct, "total_mass"]) == total
        # minimality: one fewer type falls below the target
        assert 100 * (covered - counts[k - 1]) < pct * total


def test_pdf_audit_clean_and_corrupt():
    text = " ".join(f"w{i}" for i in range(100))
    pages = [
        " ".join(text.split(" ")[j : j + 40])
        for j in range(0, 100, 40)
    ]
    pdf = build_pdf(pages, info={"Title": "t"})
    n_pages, n_objects, ok = _pdf_audit_one(pdf)
    assert (n_pages, n_objects, ok) == (3, 10, 1)

    # corrupting one digit of an in-use xref offset flips the audit
    at = pdf.rindex(b"xref\n0 ")
    entry0 = pdf.index(b"\n", pdf.index(b"\n", at) + 1) + 1
    entry1 = entry0 + 20  # first in-use entry
    digit = pdf[entry1 : entry1 + 10]
    bad = (b"%010d" % (int(digit) + 1)) + pdf[entry1 + 10 : entry1 + 20]
    corrupt = pdf[:entry1] + bad + pdf[entry1 + 20 :]
    assert _pdf_audit_one(corrupt)[2] == 0

    # truncated trailer is detected, not crashed on
    assert _pdf_audit_one(pdf[:-8])[2] == 0


def test_pdf_audit_query_all_green(ray_session):
    got = _df(QUERIES["pdf_xref_audit"](SF))
    assert (got["xref_ok"] == 1).all()
    assert (got["n_objects"] == 4 + 2 * got["n_pages"]).all()
    assert len(got) == 500
