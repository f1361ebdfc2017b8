"""Deterministic Common-Crawl-style page-table synthesizer.

Renders the FIXTURES.md §1 schema (url, warc_ts, html: binary, text, lang)
from a documents table: most rows become HTML pages (known main-content
text wrapped in nav/sidebar/footer/script boilerplate), a deterministic
subset become PDF payloads (%PDF- magic, Flate-compressed content streams),
plus exact-duplicate urls and a skewed host distribution (one mega-host)
to exercise dedup and salting. Everything is keyed on doc_id — no RNG at
render time, so the ground truth is the input text column itself.
"""

from __future__ import annotations

import html as html_mod

import pyarrow as pa

from sciscraper_ray.sources.pdf_write import build_pdf

HOSTS = [
    "mega.example.org",  # skewed: ~30% of rows
    "alpha.example.com",
    "beta.example.net",
    "gamma.example.io",
    "delta.example.edu",
    "epsilon.example.dev",
]

_BOILER_NAV = (
    '<nav class="top"><ul>'
    '<li><a href="/">home</a></li>'
    '<li><a href="/papers">papers</a></li>'
    '<li><a href="/about">about us</a></li>'
    '<li><a href="/contact">contact</a></li>'
    "</ul></nav>"
)
_BOILER_SIDEBAR = (
    '<aside class="sidebar"><h3>related</h3>'
    '<a href="/r/1">related one</a> <a href="/r/2">related two</a> '
    '<a href="/r/3">more links here</a><p>subscribe to our <a href="/n">newsletter</a></p></aside>'
)
_BOILER_FOOTER = (
    '<footer><a href="/privacy">privacy</a> | <a href="/terms">terms</a>'
    " | © 2024 example press</footer>"
)


def host_for(doc_id: int) -> str:
    # ~30% of ids land on the mega-host; the rest spread uniformly.
    if doc_id % 10 < 3:
        return HOSTS[0]
    return HOSTS[1 + doc_id % 5]


_LINK_MOD = 997  # cross-host outlink target space (dangling targets are
# normal on the web; the modulus keeps targets derivable from doc_id alone)


def ref_targets(doc_id: int) -> tuple[int, int]:
    """The two deterministic cross-host outlink targets of a page
    (with_links=True). Pure arithmetic on doc_id so link-graph oracles
    reproduce the edge list from first principles."""
    return (doc_id * 17 + 13) % _LINK_MOD, (doc_id * 29 + 7) % _LINK_MOD


def render_html(
    doc_id: int, text: str, lang: str, with_links: bool = False
) -> bytes:
    """Known main-content text inside realistic boilerplate chrome.

    Content paragraphs are ~40-word chunks; the extractor's contract is to
    reproduce ``" ".join(chunks) == text`` byte-identically.

    ``with_links`` (off by default — payload bytes of every existing
    fixture are unchanged) appends a references section of deterministic
    cross-host outlinks (``ref_targets``) before the footer: boilerplate
    to the main-content extractor, ground truth for the link-graph /
    anchor-text queries.
    """
    words = text.split(" ")
    paras = [
        "<p>" + html_mod.escape(" ".join(words[i : i + 40])) + "</p>"
        for i in range(0, len(words), 40)
    ]
    refs = ""
    if with_links:
        t1, t2 = ref_targets(doc_id)
        refs = (
            '<section class="refs"><h3>references</h3>'
            f'<a href="https://{host_for(t1)}/html/doc-{t1}">ref {t1}</a> '
            f'<a href="https://{host_for(t2)}/html/doc-{t2}">ref {t2}</a>'
            "</section>"
        )
    doc = (
        "<!DOCTYPE html>"
        f'<html lang="{lang}"><head><title>Document {doc_id}</title>'
        "<style>body{margin:0} .sidebar{float:right}</style>"
        '<script>var tracker="' + str(doc_id) + '";trk(tracker);</script>'
        "</head><body>"
        + _BOILER_NAV
        + _BOILER_SIDEBAR
        + f"<header><h1>Document {doc_id}</h1><p>by the synthesis authors</p></header>"
        + '<article id="main">'
        + "".join(paras)
        + "</article>"
        + refs
        + _BOILER_FOOTER
        + "</body></html>"
    )
    return doc.encode("utf-8")


def _pdf_info_for(doc_id: int) -> dict[str, str]:
    """Deterministic /Info fixture exercising every branch of the
    doi_from_pdf metadata chain (doifrompdf.py:30-111):

    - %4==0: priority key ``doi`` -> metadata probe hit (raw value wins)
    - %4==1: priority key ``pdf2doi_identifier`` -> probe order case
    - %4==2: id only INSIDE the Title value -> pdf-info value scan case
      (the id-bearing value is LAST, surviving the last-value-wins quirk)
    - %4==3: no identifier anywhere in Info -> falls through to the text
      step downstream
    """
    m = doc_id % 4
    if m == 0:
        return {"Title": f"Document {doc_id}", "doi": f"10.5555/meta.{doc_id}"}
    if m == 1:
        return {
            "Title": f"Document {doc_id}",
            "pdf2doi_identifier": f"10.4444/p2d.{doc_id}",
        }
    if m == 2:
        return {
            "Producer": "synth press",
            "Title": f"see doi:10.3333/info.{doc_id} inside",
        }
    return {"Title": f"Document {doc_id}"}


def synth_pages_batch(
    batch: pa.Table,
    pdf_mod: int = 10,
    dup_mod: int = 17,
    repeat: int = 1,
    with_pdf_info: bool = False,
    change_mod: int = 0,
) -> pa.Table:
    """documents batch -> page-table batch.

    - doc_id % pdf_mod == 0: payload is a PDF (one text line per page,
      40 words per page) instead of HTML.
    - doc_id % dup_mod == 0: an extra exact-duplicate fetch of the same
      url at a later warc_ts is appended (dedup fixture).
    - change_mod (with dup_mod): the extra fetch of ids also divisible by
      ``change_mod`` carries REVISED content (text + " rev") instead of an
      exact duplicate — the incremental-crawl / snapshot-diff fixture.
    - repeat > 1: each document yields ``repeat`` pages with DISTINCT urls
      and doc_ids (bench scaling knob — more extraction work, same per-row
      semantics).
    - with_pdf_info: PDF payloads carry the deterministic /Info dict from
      ``_pdf_info_for`` (metadata identifier chain fixture).
    """
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()

    urls: list[str] = []
    ts: list[int] = []
    payloads: list[bytes] = []
    out_text: list[str | None] = []
    out_lang: list[str] = []
    out_ids: list[int] = []

    base_ts = 1_700_000_000_000_000  # 2023-11-14, microseconds

    def emit(i: int, t: str, lang: str, fetch: int, rep: int = 0) -> None:
        is_pdf = bool(pdf_mod) and i % pdf_mod == 0
        kind = "pdf" if is_pdf else "html"
        suffix = f"-r{rep}" if rep else ""
        urls.append(f"https://{host_for(i)}/{kind}/doc-{i}{suffix}")
        ts.append(base_ts + i * 1_000_000 + fetch)
        if is_pdf:
            words = t.split(" ")
            pages = [" ".join(words[j : j + 40]) for j in range(0, len(words), 40)]
            info = _pdf_info_for(i) if with_pdf_info else None
            payloads.append(build_pdf(pages, info=info))
            out_text.append(None)  # PDF rows carry no pre-extracted text
        else:
            payloads.append(render_html(i, t, lang))
            out_text.append(t)
        out_lang.append(lang)
        out_ids.append(i + rep * 100_000_000)

    for i, t, lang in zip(ids, texts, langs):
        for rep in range(max(1, repeat)):
            emit(int(i), t, lang, fetch=0, rep=rep)
            if dup_mod and i % dup_mod == 0:
                t2 = (
                    t + " rev"
                    if change_mod and i % change_mod == 0
                    else t
                )
                emit(int(i), t2, lang, fetch=500_000, rep=rep)  # same url, later

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(payloads, type=pa.binary()),
            "text": pa.array(out_text, type=pa.string()),
            "lang": pa.array(out_lang, type=pa.string()),
            "doc_id": pa.array(out_ids, type=pa.int64()),
        }
    )


def synth_page_table(sf_dir: str, out_dir: str, num_files: int = 8) -> str:
    """Materialize the synthetic page table under ``out_dir`` (idempotent:
    skipped if the directory already has parquet files)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    ):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    n = len(docs)
    per = max(1, (n + num_files - 1) // num_files)
    for fi in range(0, n, per):
        chunk = docs.slice(fi, per)
        pages = synth_pages_batch(chunk)
        pq.write_table(pages, f"{out_dir}/part-{fi // per:05d}.parquet")
    return out_dir


def synth_page_table_ray(
    sf_dir: str, out_dir: str, *, repeat: int = 1, pdf_mod: int = 10, dup_mod: int = 17
) -> str:
    """Ray-parallel page-table materialization (bench input generation —
    NOT pipeline work). Idempotent via a _SUCCESS marker, so the second
    bench process at a different CPU count reuses the same input."""
    import os

    import ray.data

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):  # half-written previous attempt
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(
        lambda b: synth_pages_batch(b, pdf_mod=pdf_mod, dup_mod=dup_mod, repeat=repeat),
        batch_format="pyarrow",
        batch_size=512,
    )
    # ≥128 files so the read (file-grained IO + decompress) can use every
    # core at the larger cluster size — a handful of fat files caps read
    # parallelism. repartition gives the writer 128 blocks (one file each);
    # max_rows_per_file is the enforced per-file ceiling.
    ds.repartition(128).write_parquet(
        out_dir, max_rows_per_file=max(1000, (n_docs * repeat) // 128)
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
