"""Round-4 batch AL: RSS item extraction + host template LCP."""

from __future__ import annotations

import pandas as pd

from sciscraper_ray.stages.html_tables import extract_rss_items

SF = "/root/testdata/sf0.001"


def test_rss_basic_and_entities():
    xml = (
        '<rss version="2.0"><channel><title>chan</title>'
        "<item><title>News &amp; &lt;x&gt;</title><guid>g1</guid>"
        "<pubDate>2024-01-02</pubDate></item>"
        "<item><title>plain</title><guid>g2</guid></item>"
        "</channel></rss>"
    )
    items = extract_rss_items(xml)
    assert items[0] == {
        "title": "News & <x>", "guid": "g1", "pubdate": "2024-01-02",
    }
    # channel-level title never leaks into items; missing fields absent
    assert items[1] == {"title": "plain", "guid": "g2"}


def test_rss_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["page_rss_items"](SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    assert len(got) == int((1 + docs["doc_id"] % 3).sum())
    esc = got[(got["doc_id"] % 5 == 0) & (got["item_ord"] == 0)]
    assert esc["title"].str.startswith("News & <updates> ").all()


def test_host_template_lcp_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES
    from sciscraper_ray.sources.page_synth import HOSTS, host_for

    got = QUERIES["host_template_lcp"](SF)
    got = pd.DataFrame(got.to_pandas() if hasattr(got, "to_pandas") else got)
    assert sorted(got["host"]) == sorted(HOSTS)
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    import os

    for host, g in docs.groupby(docs["doc_id"].map(lambda i: host_for(int(i)))):
        pages = [f"[{host}] Daily Digest :: {t}" for t in g["text"]]
        exp = len(os.path.commonprefix(pages))
        row = got[got["host"] == host].iloc[0]
        assert row["template_len"] == exp
        assert row["n_pages"] == len(g)
        # the skeleton prefix is always inside the template
        assert exp >= len(f"[{host}] Daily Digest :: ")
