"""PDF document-structure extraction: outline (bookmark) tree walk and
link-annotation harvesting over the body-scan document model.

The reference's PDF tier stops at text + /Info metadata
(/root/reference/src/doifrompdf.py:30-126); these extractors cover the two
other structure graphs a bulk academic-PDF pipeline mines — the bookmark
tree (section inventory / TOC recovery) and URI link annotations
(outbound-citation harvesting) — implemented as pure per-payload functions
so they run inside ``map_batches`` with zero exchange.
"""

from __future__ import annotations

from sciscraper_ray.stages.pdf_doc import PdfDocument, Ref, decode_text_string


def _as_text(v) -> str:
    if isinstance(v, bytes):
        return decode_text_string(v)
    return str(v) if v is not None else ""


def _catalog(doc: PdfDocument) -> dict | None:
    cat = None
    for v in doc.values.values():
        if isinstance(v, dict) and v.get("Type") == "Catalog":
            cat = v  # last catalog wins (incremental updates)
    return cat


def _page_index(doc: PdfDocument) -> dict[int, int]:
    """Map id(resolved page dict) -> 0-based page index (tree order)."""
    return {id(p): i for i, p in enumerate(doc.pages())}


def _dest_page(doc: PdfDocument, dest, pidx: dict[int, int]) -> int:
    """Resolve an explicit destination array's page reference to its
    0-based index; -1 when absent/unresolvable."""
    dest = doc.resolve(dest)
    if isinstance(dest, dict):  # /Dest may be a dict with /D (§12.3.2.3)
        dest = doc.resolve(dest.get("D"))
    if not (isinstance(dest, list) and dest):
        return -1
    page = doc.resolve(dest[0]) if isinstance(dest[0], Ref) else dest[0]
    return pidx.get(id(page), -1)


def extract_outline(payload: bytes) -> list[tuple[int, int, str, int]]:
    """Pre-order walk of the /Outlines tree (§12.3.3): follows /First for
    children and /Next for siblings (never /Count, which is advisory),
    emitting ``(ord, depth, title, page_idx)`` per item. Cycle-proof via a
    visited set; depth capped at 32 like the rest of the document model."""
    doc = PdfDocument(payload)
    cat = _catalog(doc)
    if cat is None:
        return []
    root = doc.resolve(cat.get("Outlines"))
    if not isinstance(root, dict):
        return []
    pidx = _page_index(doc)
    out: list[tuple[int, int, str, int]] = []
    seen: set[int] = set()

    def walk(item, depth: int) -> None:
        while item is not None and depth < 32:
            d = doc.resolve(item)
            if not isinstance(d, dict) or id(d) in seen:
                return
            seen.add(id(d))
            out.append(
                (
                    len(out),
                    depth,
                    _as_text(d.get("Title")),
                    _dest_page(doc, d.get("Dest"), pidx),
                )
            )
            if d.get("First") is not None:
                walk(d.get("First"), depth + 1)
            item = d.get("Next")

    walk(root.get("First"), 0)
    return out


def extract_link_annots(
    payload: bytes,
) -> list[tuple[int, int, int, int, int, int, str]]:
    """Harvest /Subtype /Link annotations with /S /URI actions from every
    page's /Annots array (§12.5.6.5), in page order then array order.
    Emits ``(ord, page_idx, x0, y0, x1, y1, uri)``; rects are rounded to
    int (the synthetic fixtures write integer rects, and sub-point link
    quads are noise for harvesting). Non-link annots are skipped."""
    doc = PdfDocument(payload)
    out: list[tuple[int, int, int, int, int, int, str]] = []
    for page_i, page in enumerate(doc.pages()):
        annots = doc.resolve(page.get("Annots"))
        if not isinstance(annots, list):
            continue
        for a in annots:
            a = doc.resolve(a)
            if not (isinstance(a, dict) and a.get("Subtype") == "Link"):
                continue
            action = doc.resolve(a.get("A"))
            if not (isinstance(action, dict) and action.get("S") == "URI"):
                continue
            uri = _as_text(doc.resolve(action.get("URI")))
            rect = doc.resolve(a.get("Rect"))
            if not (isinstance(rect, list) and len(rect) == 4):
                rect = [0, 0, 0, 0]
            x0, y0, x1, y1 = (int(round(float(doc.resolve(v)))) for v in rect)
            out.append((len(out), page_i, x0, y0, x1, y1, uri))
    return out
