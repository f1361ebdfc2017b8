"""The flagship extraction pipeline over Common-Crawl-style page tables —
the engine's north-star dataflow (BASELINE.json north_rule).

    read_parquet(pages)                       column-pruned, streamed
      -> keep-latest dedup by url             ONE shuffle (hash on url),
                                              fed by per-batch partials
      -> PayloadExtractor pool                per-row payload-magic routing:
                                              %PDF- -> layout parse, else
                                              readability strip — ONE pass,
                                              no dataset split/union (a
                                              split would re-execute the
                                              dedup subgraph per branch and
                                              double the payload traffic)
      -> DocAnalyzer                          fused tokenize/terms/wordscore
      -> (caller writes / consumes)

Per-row invariant: ``extracted_text`` is byte-identical per url to the
reference semantics (pdfplumber-style layout parse joined with " " across
pages — docscraper.py:188-205 — and readability main-content for HTML).

EP1 analog ("directory" mode, factories.py:27-33): the binary payload
column replaces the PDF directory walk; identifier mining runs on the
extracted text (doifrompdf.py:30-52 text fallback).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from sciscraper_ray.stages.doc_analyzer import DocAnalyzer
from sciscraper_ray.stages.html_extract import extract_main_content
from sciscraper_ray.stages.pdf_parse import extract_pdf_pages

EXTRACT_COLUMNS = [
    "url", "warc_ts", "lang", "doc_id",
    "extracted_text", "spans", "payload_kind", "extract_status",
]

SPAN_TYPE = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))


class PayloadExtractor:
    """Actor-pool stage: sniff each payload's magic and extract.

    %PDF- payloads -> content-stream layout parse (pages joined " ",
    docscraper.py:205); everything else -> readability main-content strip.
    Emits extracted_text, spans, payload_kind, extract_status; errors
    degrade to null text, never crash the task.
    """

    def __init__(self, payload_col: str = "html"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str | None] = []
        spans_col: list[list[dict] | None] = []
        kinds: list[str] = []
        status: list[str] = []
        for payload in batch[self.payload_col].to_pylist():
            if payload is None:
                texts.append(None)
                spans_col.append(None)
                kinds.append("none")
                status.append("error: null payload")
                continue
            kind = "pdf" if bytes(payload).startswith(b"%PDF-") else "html"
            kinds.append(kind)
            try:
                if kind == "pdf":
                    pages = extract_pdf_pages(payload)
                    spans, pos = [], 0
                    for p in pages:
                        spans.append({"start": pos, "end": pos + len(p)})
                        pos += len(p) + 1
                    texts.append(" ".join(pages))
                    spans_col.append(spans)
                else:
                    text, spans = extract_main_content(payload.decode("utf-8", errors="replace"))
                    texts.append(text)
                    spans_col.append([{"start": s, "end": e} for s, e in spans])
                status.append("ok")
            except Exception as exc:  # noqa: BLE001 — degrade, never crash
                texts.append(None)
                spans_col.append(None)
                status.append(f"error: {type(exc).__name__}")
        return (
            batch.drop_columns([self.payload_col])
            .append_column("extracted_text", pa.array(texts, type=pa.large_string()))
            .append_column("spans", pa.array(spans_col, type=SPAN_TYPE))
            .append_column("payload_kind", pa.array(kinds, type=pa.string()))
            .append_column("extract_status", pa.array(status, type=pa.string()))
        )


def keep_latest_by_url(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup, keep-latest fetch per url (SURVEY §2.6): per-batch
    partial keep-latest, then one hash-partitioned grouped reduce."""
    import pandas as pd

    from sciscraper_ray.stages.relational import keep_latest_batch

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return keep_latest_batch(batch, "url", ["warc_ts"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("url")
        .map_groups(lambda g: keep_latest_batch(g, "url", ["warc_ts"]), batch_format="pandas")
    )


def extraction_pipeline(
    source: str | ray.data.Dataset,
    *,
    dedup: bool = True,
    analyze: bool = True,
    batch_size: int = 256,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """pages (path or Dataset) -> extracted (and optionally analyzed) docs.

    ``batch_size`` is small because payload rows are wide (multi-KB to
    multi-MB binary); the extract stages are the CPU-heavy pools.
    """
    if isinstance(source, str):
        ds = ray.data.read_parquet(source)
    else:
        ds = source
    if dedup:
        ds = keep_latest_by_url(ds)

    extracted = ds.map_batches(
        PayloadExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    # Pass lineage columns (fragment_id from run_resumable) through untouched;
    # a per-batch projection avoids ds.schema()'s partial execution.
    def project(batch: pa.Table) -> pa.Table:
        keep = [
            c for c in EXTRACT_COLUMNS + ["fragment_id"]
            if c in batch.column_names
        ]
        return batch.select(keep)

    out = extracted.map_batches(project, batch_format="pyarrow")
    if analyze:
        out = out.map_batches(
            DocAnalyzer,
            fn_constructor_kwargs={"text_column": "extracted_text"},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=2048,
            concurrency=concurrency,
        )
    return out
