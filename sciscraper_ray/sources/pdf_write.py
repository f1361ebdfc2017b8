"""Minimal deterministic PDF writer for the synthetic page table.

Produces structurally honest PDFs: catalog / pages tree / page objects,
Flate-compressed content streams, per-word text positioning via Tm, an
xref table and trailer. The glyph metric is a fixed 0.6em advance —
documented and shared with the layout parser (stages/pdf_parse.py), which
is the same simplification a font-metric table would fill in for real
fonts.
"""

from __future__ import annotations

import re
import zlib

FONT_SIZE = 10.0
CHAR_W = 0.6 * FONT_SIZE  # fixed-width glyph advance
WORD_GAP = CHAR_W  # inter-word gap (> x_tolerance -> word boundary)
LINE_H = 14.0
PAGE_W, PAGE_H = 612, 792
MARGIN_X, TOP_Y = 72.0, 720.0


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_string(word: str) -> str:
    """Literal string when latin-1 suffices; else a UTF-16BE hex string
    with BOM (the standard PDF text-string encoding for non-Latin text)."""
    try:
        word.encode("latin-1")
        return f"({_esc(word)})"
    except UnicodeEncodeError:
        return "<FEFF" + word.encode("utf-16-be").hex().upper() + ">"


def _page_stream(lines: list[str]) -> bytes:
    """One Tm + Tj per word, one text line per list entry."""
    ops = ["BT", f"/F1 {FONT_SIZE:g} Tf"]
    y = TOP_Y
    for line in lines:
        x = MARGIN_X
        for word in line.split(" "):
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
            ops.append(f"{_pdf_string(word)} Tj")
            x += len(word) * CHAR_W + WORD_GAP
        y -= LINE_H
    ops.append("ET")
    return zlib.compress("\n".join(ops).encode("latin-1"))


def build_pdf(
    pages: list[str],
    lines_per_page: int = 1,
    info: "dict[str, str] | None" = None,
) -> bytes:
    """pages: one text string per page; each is split into
    ``lines_per_page`` lines (1 = single long line, round-trip-exact with
    the reference's ' '.join(pages) concatenation).

    ``info``: optional document-information entries (e.g. Title, doi,
    arxiv) written as a trailer-referenced /Info dict — the metadata the
    reference's doi_from_pdf chain probes FIRST
    (/root/reference/src/doifrompdf.py:30-52,114-126)."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    n_pages = len(pages)
    # object numbers laid out up front: 1 catalog, 2 pages, 3 font,
    # then (page, content) pairs.
    page_obj_nums = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{n} 0 R" for n in page_obj_nums)
    add(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())  # 2
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # 3
    for i, text in enumerate(pages):
        if lines_per_page > 1:
            words = text.split(" ")
            per = max(1, (len(words) + lines_per_page - 1) // lines_per_page)
            lines = [" ".join(words[j : j + per]) for j in range(0, len(words), per)]
        else:
            lines = [text]
        stream = _page_stream(lines)
        add(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Contents {4 + 2 * i + 1} 0 R /Resources << /Font << /F1 3 0 R >> >> >>".encode()
        )
        add(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    info_ref = ""
    if info:
        entries = " ".join(
            f"/{k} {_pdf_string(v)}" for k, v in info.items()
        )
        info_num = add(f"<< {entries} >>".encode("latin-1", errors="replace"))
        info_ref = f" /Info {info_num} 0 R"

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R{info_ref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_pdf_structured(
    pages: list[str],
    outline: "list[tuple[str, int, int]] | None" = None,
    links: "list[tuple[int, tuple[int, int, int, int], str]] | None" = None,
    info: "dict[str, str] | None" = None,
) -> bytes:
    """Document-structure variant of ``build_pdf``: same page/content layout
    plus an /Outlines bookmark tree and /Annots Link annotations.

    ``outline``: pre-order sequence of ``(title, page_idx, depth)`` with
    depth 0 (top level) or 1 (child of the preceding depth-0 item). Items
    are written as real cross-linked objects (/Parent /Prev /Next /First
    /Last /Count /Dest), the graph a conforming reader walks — parity
    target for the reference's bookmark-style metadata probing.

    ``links``: sequence of ``(page_idx, (x0, y0, x1, y1), uri)`` written as
    direct /Annots Link dicts with /A << /S /URI >> actions on their page
    (§12.5.6.5) — integer rects so the extraction compare is exact.
    """
    outline = list(outline or [])
    links = list(links or [])
    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages, 3 font, (page, content) pairs,
    # optional info, outline root, outline items in pre-order.
    page_obj_nums = [4 + 2 * i for i in range(n_pages)]
    next_num = 4 + 2 * n_pages
    info_num = 0
    if info:
        info_num = next_num
        next_num += 1
    root_num = 0
    item_nums: list[int] = []
    if outline:
        root_num = next_num
        item_nums = [root_num + 1 + k for k in range(len(outline))]

    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    outlines_ref = f" /Outlines {root_num} 0 R" if outline else ""
    add(f"<< /Type /Catalog /Pages 2 0 R{outlines_ref} >>".encode())  # 1
    kids = " ".join(f"{n} 0 R" for n in page_obj_nums)
    add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())  # 2
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # 3
    for i, text in enumerate(pages):
        stream = _page_stream([text])
        annots = ""
        page_links = [(r, u) for (p, r, u) in links if p == i]
        if page_links:
            dicts = " ".join(
                f"<< /Type /Annot /Subtype /Link /Rect [{x0} {y0} {x1} {y1}] "
                f"/Border [0 0 0] /A << /S /URI /URI {_pdf_string(u)} >> >>"
                for (x0, y0, x1, y1), u in page_links
            )
            annots = f" /Annots [{dicts}]"
        add(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Contents {4 + 2 * i + 1} 0 R "
            f"/Resources << /Font << /F1 3 0 R >> >>{annots} >>".encode()
        )
        add(
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    info_ref = ""
    if info:
        entries = " ".join(f"/{k} {_pdf_string(v)}" for k, v in info.items())
        got = add(f"<< {entries} >>".encode("latin-1", errors="replace"))
        assert got == info_num
        info_ref = f" /Info {info_num} 0 R"

    if outline:
        # resolve the pre-order (title, page, depth) list into the
        # cross-linked sibling/child graph
        tops = [k for k, (_, _, d) in enumerate(outline) if d == 0]
        children: dict[int, list[int]] = {t: [] for t in tops}
        cur_top = None
        parent_of: dict[int, int] = {}
        for k, (_, _, d) in enumerate(outline):
            if d == 0:
                cur_top = k
            else:
                children[cur_top].append(k)
                parent_of[k] = cur_top
        got = add(
            f"<< /Type /Outlines /First {item_nums[tops[0]]} 0 R "
            f"/Last {item_nums[tops[-1]]} 0 R /Count {len(tops)} >>".encode()
        )
        assert got == root_num
        for k, (title, page_idx, d) in enumerate(outline):
            if d == 0:
                sibs = tops
                parent = root_num
            else:
                sibs = children[parent_of[k]]
                parent = item_nums[parent_of[k]]
            pos = sibs.index(k)
            parts = [
                f"/Title {_pdf_string(title)}",
                f"/Parent {parent} 0 R",
                f"/Dest [{page_obj_nums[page_idx]} 0 R /XYZ 72 720 0]",
            ]
            if pos > 0:
                parts.append(f"/Prev {item_nums[sibs[pos - 1]]} 0 R")
            if pos + 1 < len(sibs):
                parts.append(f"/Next {item_nums[sibs[pos + 1]]} 0 R")
            kids_k = children.get(k, [])
            if kids_k:
                parts.append(f"/First {item_nums[kids_k[0]]} 0 R")
                parts.append(f"/Last {item_nums[kids_k[-1]]} 0 R")
                parts.append(f"/Count {len(kids_k)}")
            add(("<< " + " ".join(parts) + " >>").encode("latin-1", "replace"))

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R{info_ref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


COL2_X = [MARGIN_X, 332.0]  # two-column origins; gutter >= 80pt at
# col_chars=30 (max line 180pt from x=72 ends at 252) — an order of
# magnitude wider than the 6pt word gap, so projection-based column
# detection has no spurious splits


def _wrap(words: list[str], col_chars: int) -> list[str]:
    """Greedy wrap to <= col_chars characters per line (counting single
    spaces), never splitting a word."""
    lines: list[str] = []
    cur: list[str] = []
    used = 0
    for w in words:
        add = len(w) + (1 if cur else 0)
        if cur and used + add > col_chars:
            lines.append(" ".join(cur))
            cur, used = [w], len(w)
        else:
            cur.append(w)
            used += add
    if cur:
        lines.append(" ".join(cur))
    return lines


def build_pdf_two_column(
    text: str,
    info: "dict[str, str] | None" = None,
    col_chars: int = 30,
) -> bytes:
    """Single-page TWO-COLUMN layout: text wraps to ``col_chars``-wide
    lines, the first half fills the left column top-to-bottom, the rest
    the right column — the newspaper reading order a naive y-then-x line
    clusterer garbles (it zips the columns line by line). Ground truth
    for the reading-order block extractor: left column then right column
    reconstructs ``text`` byte-identically."""
    words = text.split(" ")
    lines = _wrap(words, col_chars)
    half = (len(lines) + 1) // 2
    cols = [lines[:half], lines[half:]]
    ops = ["BT", f"/F1 {FONT_SIZE:g} Tf"]
    for x0, col_lines in zip(COL2_X, cols):
        y = TOP_Y
        for line in col_lines:
            x = x0
            for word in line.split(" "):
                ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
                ops.append(f"{_pdf_string(word)} Tj")
                x += len(word) * CHAR_W + WORD_GAP
            y -= LINE_H
    ops.append("ET")
    stream = zlib.compress("\n".join(ops).encode("latin-1"))

    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    add(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    add(b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>")  # 2
    add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # 3
    add(
        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
        f"/Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >>".encode()
    )  # 4
    add(
        f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
        + stream
        + b"\nendstream"
    )  # 5
    info_ref = ""
    if info:
        entries = " ".join(f"/{k} {_pdf_string(v)}" for k, v in info.items())
        info_num = add(f"<< {entries} >>".encode("latin-1", errors="replace"))
        info_ref = f" /Info {info_num} 0 R"
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R{info_ref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def append_incremental_update(
    payload: bytes, obj_num: int, body: bytes
) -> bytes:
    """Append a PDF incremental-update section (§7.5.6) redefining ONE
    object: the new object body, a one-entry classic xref subsection, and
    a trailer chaining to the previous xref via /Prev. Readers that honor
    update ordering must see the NEW definition; the body-scan document
    model's later-definition-overrides policy is exactly that contract."""
    m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", payload)
    prev_xref = int(m.group(1)) if m else 0
    sm = re.search(rb"/Size (\d+)", payload)
    size = int(sm.group(1)) if sm else obj_num + 1
    out = bytearray(payload)
    obj_at = len(out)
    out += f"{obj_num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n{obj_num} 1\n{obj_at:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R /Prev {prev_xref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
