"""Round-4 batch AE: public-suffix (eTLD+1) resolution and canonical-URL
crawl dedup — first-principles recomputes (oracle parity runs in
tools/check_correctness.py)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from sciscraper_ray.kernels.psl import psl_registrable
from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_psl_rule_classes():
    cases = {
        # host: (suffix, registrable, rule)
        "a.example.com": ("com", "example.com", "normal"),
        "b.sub.example.co.uk": ("co.uk", "example.co.uk", "normal"),
        "site.github.io": ("github.io", "site.github.io", "normal"),
        "github.io": ("github.io", None, "normal"),  # host IS a suffix
        "w.zone.ck": ("zone.ck", "w.zone.ck", "wildcard"),
        "foo.ck": ("foo.ck", None, "wildcard"),
        "www.ck": ("ck", "www.ck", "exception"),
        "deep.www.ck": ("ck", "www.ck", "exception"),
        "x.svc.internal": ("internal", "svc.internal", "default"),
        "192.168.1.7": (None, None, None),
    }
    s, r, t = psl_registrable(pa.array(list(cases)))
    got = list(zip(s.to_pylist(), r.to_pylist(), t.to_pylist()))
    assert got == list(cases.values())


def test_url_registrable_domain_query(ray_session):
    got = _df(QUERIES["url_registrable_domain"](SF))
    assert len(got) == 500
    # spot-check precedence: %13 rows are IP-null even when %8 would match
    ips = got[got["doc_id"] % 13 == 0]
    assert ips["registrable_domain"].isna().all()
    assert ips["rule_type"].isna().all()
    # private-registry suffix: each site gets its OWN registrable domain
    gh = got[(got["doc_id"] % 13 != 0) & (got["doc_id"] % 17 != 0)
             & (got["doc_id"] % 8 == 2)]
    assert (
        gh["registrable_domain"] == "site" + gh["doc_id"].astype(str) + ".github.io"
    ).all()


def test_dedup_url_canonical_query(ray_session):
    got = _df(QUERIES["dedup_url_canonical"](SF)).sort_values("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    parseable = docs[docs["doc_id"] % 11 != 0]["doc_id"].astype(int)
    assert sorted(got["doc_id"]) == sorted(parseable)
    # the v=0 record always survives and variant counts are exact
    assert (got["survivor_record"] == 4 * got["doc_id"]).all()
    assert (got["n_variants"] == 1 + got["doc_id"] % 3).all()
    # canonical form is fully normalized (no noise survives)
    assert got["canonical_url"].str.startswith("https://").all()
    assert not got["canonical_url"].str.contains("utm_|#|:443").any()
