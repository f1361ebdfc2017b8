"""PDF layout parser — the actor-pool re-expression of the reference's
pdfplumber text path (/root/reference/src/docscraper.py:188-205): per page
``extract_text(x_tolerance=1, y_tolerance=3)``, pages joined with ``" "``.

From-scratch implementation (pdfplumber is not a dependency). The document
model (stages/pdf_doc.py) resolves the page tree, per-page content streams
and font tables; this module interprets the content-stream text operators
(BT/ET, Tf, Tm, Td, TD, T*, TL, Tc, Tw, Tz, Tj, TJ, ', ", with q/Q/cm
graphics state) placing glyphs with the font's /Widths (or /W CID)
advances — char/word spacing and horizontal scaling applied per spec
§9.4.4 — then clusters glyphs pdfplumber-style: lines by y within
``y_tolerance``, words split on whitespace glyphs or horizontal gaps >
``x_tolerance``, words joined with single spaces, lines with newlines,
pages with a single space.

Fonts that declare no metric for a code (and payloads with no page tree,
e.g. raw fragments) fall back to the fixed 0.6 em advance the synthetic
writer uses (sources/pdf_write.py) — documented there as the shared
metric, which keeps synthetic round-trips byte-exact.
"""

from __future__ import annotations

import bisect
import re
import zlib

import pyarrow as pa

from sciscraper_ray.stages.pdf_doc import (
    FontInfo,
    PdfDocument,
    decode_text_string,
    unescape_literal,
)

_STREAM_KW_RE = re.compile(rb"(?<!end)stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")

X_TOLERANCE = 1.0
Y_TOLERANCE = 3.0
DEFAULT_CHAR_EM = 0.6


class _TextState:
    __slots__ = ("tm", "lm", "size", "leading", "tc", "tw", "hscale", "font")

    def __init__(self):
        self.tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]  # a b c d e f
        self.lm = list(self.tm)
        self.size = 12.0
        self.leading = 0.0
        self.tc = 0.0  # char spacing (Tc)
        self.tw = 0.0  # word spacing (Tw)
        self.hscale = 1.0  # horizontal scaling (Tz / 100)
        self.font: FontInfo | None = None

    def translate_line(self, tx: float, ty: float) -> None:
        """Td semantics: new line matrix = translate(tx, ty) x lm."""
        self.lm = [
            self.lm[0], self.lm[1], self.lm[2], self.lm[3],
            self.lm[4] + tx * self.lm[0] + ty * self.lm[2],
            self.lm[5] + tx * self.lm[1] + ty * self.lm[3],
        ]
        self.tm = list(self.lm)


_WS_RUN_RE = re.compile(rb"[\x00\t\n\x0c\r ]+")
_REG_TOK_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


def _tokenize(stream: bytes):
    """Content-stream tokens: numbers, names, (strings)/<hex> as raw BYTES
    (codes, not text — the font maps codes to unicode), [arrays],
    operators. Whitespace runs and regular-token spans scan via compiled
    regex (C), not per-char Python."""
    i, n = 0, len(stream)
    ws_match = _WS_RUN_RE.match
    tok_match = _REG_TOK_RE.match
    while i < n:
        m = ws_match(stream, i)
        if m is not None:
            i = m.end()
            if i >= n:
                break
        c = stream[i]
        if c == 0x25:  # % comment
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x28:  # (literal string)
            # fast path: next ')' with no escapes/nesting in between
            j = stream.find(b")", i + 1)
            if j < 0:
                break
            seg = stream[i + 1 : j]
            if b"\\" not in seg and b"(" not in seg:
                yield ("str", seg)
                i = j + 1
                continue
            depth, j = 1, i + 1
            while j < n and depth:
                ch = stream[j]
                if ch == 0x5C:
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            yield ("str", unescape_literal(stream[i + 1 : j]))
            i = j + 1
        elif c == 0x3C and not (i + 1 < n and stream[i + 1] == 0x3C):
            j = stream.find(b">", i + 1)
            if j == -1:
                break
            digits = b"".join(stream[i + 1 : j].split())
            if len(digits) % 2:  # PDF spec §7.3.4.3: odd final digit -> pad 0
                digits += b"0"
            try:
                raw = bytes.fromhex(digits.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                # real-world streams embed non-text <...> runs (inline
                # images, font programs); draw nothing rather than die
                raw = b""
            yield ("str", raw)
            i = j + 1
        elif c == 0x5B:
            yield ("arr_open", None)
            i += 1
        elif c == 0x5D:
            yield ("arr_close", None)
            i += 1
        elif c == 0x2F:
            m = tok_match(stream, i + 1)
            j = m.end() if m is not None else i + 1
            yield ("name", stream[i + 1 : j].decode("latin-1"))
            i = j
        else:
            m = tok_match(stream, i)
            j = m.end() if m is not None else i
            tok = stream[i:j]
            # numbers vastly outnumber operators in content streams;
            # a first-byte gate + float() beats a regex fullmatch
            if tok and tok[0] in b"+-.0123456789":
                try:
                    yield ("num", float(tok))
                except ValueError:
                    yield ("op", tok.decode("latin-1"))
            else:
                yield ("op", tok.decode("latin-1"))
            i = j if j > i else i + 1


def _default_decode(raw: bytes) -> list[tuple[int, str]]:
    """Code decode when no font table is known: UTF-16BE with BOM (the
    synthetic writer's non-Latin path), else byte-identity latin-1."""
    if raw[:2] == b"\xfe\xff":
        return [(ord(ch), ch) for ch in raw[2:].decode("utf-16-be", "replace")]
    return [(b, chr(b)) for b in raw]


def _extract_glyphs(
    stream: bytes, fonts: dict[str, FontInfo] | None = None
) -> list[tuple[str, float, float, float]]:
    """(char, x, y, advance) glyph placements from one content stream.

    x/y are device coordinates (text matrix composed with the q/Q/cm
    graphics state); advance is the full device-space displacement
    (glyph width + Tc/Tw, scaled) — what the line assembler needs to
    detect word gaps."""
    st = _TextState()
    ctm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
    ctm_stack: list[list[float]] = []
    glyphs: list[tuple[str, float, float, float]] = []
    stack: list = []

    def draw(raw: bytes) -> None:
        f = st.font
        # UTF-16BE BOM: the synthetic writer's non-Latin string convention
        # (sources/pdf_write.py) — not a font code sequence; a real 1-byte
        # code run can't start 0xFE 0xFF under any standard encoding
        trivial = f is None or f.trivial
        if trivial or raw[:2] == b"\xfe\xff":
            units = _default_decode(raw)
            trivial = True
        else:
            units = f.decode(raw)
        size, tc, tw, hscale = st.size, st.tc, st.tw, st.hscale
        tm = st.tm
        a, b, tx, ty = tm[0], tm[1], tm[4], tm[5]
        c0, c1, c2, c3, c4, c5 = ctm
        em = DEFAULT_CHAR_EM * size
        append = glyphs.append
        if trivial and tc == 0.0 and tw == 0.0 and b == 0.0 and c1 == 0.0:
            # batch fast path (the synthetic writer's shape: fixed metric,
            # no spacing params, unrotated matrices): constant advance,
            # positions by arithmetic progression
            adv = em * hscale
            dev = adv * a * c0
            x0 = tx * c0 + ty * c2 + c4
            y0 = tx * c1 + ty * c3 + c5
            glyphs.extend(
                (ch, x0 + k * dev, y0, dev)
                for k, (_, ch) in enumerate(units)
            )
            n_units = len(units)
            tm[4] = tx + adv * n_units * a
            tm[5] = ty + adv * n_units * b
            return
        width = f.width if (f is not None and not trivial) else None
        # §9.3.3: word spacing applies only to SINGLE-BYTE code 32 —
        # 2-byte Type0/CID code 32 must not pick up Tw
        tw_applies = trivial or (f is not None and f.code_bytes == 1)
        for code, text in units:
            if width is None:
                gw = em
            else:
                w1000 = width(code)
                gw = em if w1000 is None else w1000 * 0.001 * size
            # §9.4.4 glyph displacement in text space
            adv = (gw + tc + (tw if (code == 32 and tw_applies) else 0.0)) * hscale
            x = tx * c0 + ty * c2 + c4
            y = tx * c1 + ty * c3 + c5
            # full device-space advance: text-space (adv*a, adv*b) through
            # the CTM — both cross terms, plus the y component for rotated
            # or skewed Tm x CTM compositions
            dev_adv = adv * (a * c0 + b * c2)
            dev_adv_y = adv * (a * c1 + b * c3)
            for k, ch in enumerate(text):
                # ligature/multi-char mappings share one advance: the first
                # char carries it, the rest sit at the pen end with zero
                # width so word logic sees them adjacent
                append(
                    (
                        ch,
                        x if k == 0 else x + dev_adv,
                        y if k == 0 else y + dev_adv_y,
                        dev_adv if k == 0 else 0.0,
                    )
                )
            tx += adv * a
            ty += adv * b
        tm[4] = tx
        tm[5] = ty

    for kind, val in _tokenize(stream):
        if kind in ("num", "str", "name"):
            stack.append((kind, val))
            continue
        if kind == "arr_open":
            stack.append(("arr_open", None))
            continue
        if kind == "arr_close":
            arr = []
            while stack and stack[-1][0] != "arr_open":
                arr.append(stack.pop())
            if stack:
                stack.pop()
            stack.append(("arr", list(reversed(arr))))
            continue
        op = val
        if op == "BT":
            st.tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
            st.lm = list(st.tm)
        elif op == "q":
            ctm_stack.append(list(ctm))
        elif op == "Q":
            if ctm_stack:
                ctm = ctm_stack.pop()
        elif op == "cm" and len(stack) >= 6:
            a, b, c, d, e, f_ = (s[1] for s in stack[-6:])
            ctm = [
                a * ctm[0] + b * ctm[2],
                a * ctm[1] + b * ctm[3],
                c * ctm[0] + d * ctm[2],
                c * ctm[1] + d * ctm[3],
                e * ctm[0] + f_ * ctm[2] + ctm[4],
                e * ctm[1] + f_ * ctm[3] + ctm[5],
            ]
        elif op == "Tf" and len(stack) >= 2:
            if fonts and stack[-2][0] == "name":
                st.font = fonts.get(stack[-2][1])
            st.size = stack[-1][1]
        elif op == "Tc" and stack:
            st.tc = stack[-1][1]
        elif op == "Tw" and stack:
            st.tw = stack[-1][1]
        elif op == "Tz" and stack:
            st.hscale = stack[-1][1] / 100.0
        elif op == "Tm" and len(stack) >= 6:
            vals = [s[1] for s in stack[-6:]]
            st.tm = list(vals)
            st.lm = list(vals)
        elif op in ("Td", "TD") and len(stack) >= 2:
            tx, ty = stack[-2][1], stack[-1][1]
            if op == "TD":
                st.leading = -ty
            st.translate_line(tx, ty)
        elif op == "TL" and stack:
            st.leading = stack[-1][1]
        elif op == "T*":
            st.translate_line(0.0, -st.leading)
        elif op == "Tj" and stack and stack[-1][0] == "str":
            draw(stack[-1][1])
        elif op == "'" and stack and stack[-1][0] == "str":
            st.translate_line(0.0, -st.leading)
            draw(stack[-1][1])
        elif op == '"' and len(stack) >= 3 and stack[-1][0] == "str":
            st.tw = stack[-3][1]
            st.tc = stack[-2][1]
            st.translate_line(0.0, -st.leading)
            draw(stack[-1][1])
        elif op == "TJ" and stack and stack[-1][0] == "arr":
            for k, v in stack[-1][1]:
                if k == "str":
                    draw(v)
                elif k == "num":
                    tx = -v / 1000.0 * st.size * st.hscale
                    st.tm[4] += tx * st.tm[0]
                    st.tm[5] += tx * st.tm[1]
        stack = []  # operands are consumed by their operator
    return glyphs


def glyphs_to_text(
    glyphs: list[tuple[str, float, float, float]],
    x_tolerance: float = X_TOLERANCE,
    y_tolerance: float = Y_TOLERANCE,
) -> str:
    """pdfplumber-style assembly: cluster lines by y (within y_tolerance),
    split words on whitespace glyphs or x-gaps > x_tolerance (using each
    glyph's own advance), single-space words, newline lines."""
    if not glyphs:
        return ""
    arr = sorted(glyphs, key=lambda g: (-g[2], g[1]))
    lines: list[list[tuple[str, float, float, float]]] = []
    for g in arr:
        if lines and abs(lines[-1][0][2] - g[2]) <= y_tolerance:
            lines[-1].append(g)
        else:
            lines.append([g])
    out_lines = []
    for line in lines:
        line.sort(key=lambda g: g[1])
        words: list[str] = []
        cur: list[str] = []
        prev_end: float | None = None
        for ch, x, _, w in line:
            gap_break = prev_end is not None and (x - prev_end) > x_tolerance
            if ch.isspace() or gap_break:
                if cur:
                    words.append("".join(cur))
                    cur = []
            if not ch.isspace():
                cur.append(ch)
            prev_end = x + w
        if cur:
            words.append("".join(cur))
        out_lines.append(" ".join(words))
    return "\n".join(out_lines)


def split_columns(
    glyphs: list[tuple[str, float, float, float]], gutter_min: float = 24.0
) -> list[list[tuple[str, float, float, float]]]:
    """Cluster glyphs into COLUMN bands by projecting every glyph's
    x-interval onto the x-axis and splitting at empty gaps wider than
    ``gutter_min`` — a gutter must be empty across EVERY line of the
    page, so ragged right edges and ordinary word gaps (one em or less)
    can never fake one. Returns bands left-to-right; a page with no
    gutter comes back as a single band."""
    if not glyphs:
        return []
    iv = sorted((g[1], g[1] + g[3]) for g in glyphs)
    bands = [[iv[0][0], iv[0][1]]]
    for x0, x1 in iv[1:]:
        if x0 > bands[-1][1] + gutter_min:
            bands.append([x0, x1])
        elif x1 > bands[-1][1]:
            bands[-1][1] = x1
    if len(bands) == 1:
        return [list(glyphs)]
    starts = [b[0] for b in bands]
    out: list[list[tuple[str, float, float, float]]] = [[] for _ in bands]
    for g in glyphs:
        out[bisect.bisect_right(starts, g[1]) - 1].append(g)
    return out


def glyphs_to_reading_order(
    glyphs: list[tuple[str, float, float, float]],
    x_tolerance: float = X_TOLERANCE,
    y_tolerance: float = Y_TOLERANCE,
    gutter_min: float = 24.0,
) -> str:
    """pdfplumber-style word/box clustering into READING-ORDER text
    blocks (the north-star layout contract): glyphs split into column
    bands first (``split_columns``), each band runs the y-then-x line
    assembly independently, and blocks emit left column first, top to
    bottom, then the next column — the order a human reads a
    two-column paper. The naive page-wide y-cluster (``glyphs_to_text``)
    zips the columns line by line instead; this function exists because
    that garbling is byte-visible against the known main text. Output is
    single-space-joined words (the reference's ' '.join contract —
    docscraper.py:205), so a correctly ordered extraction reproduces the
    source text byte-identically."""
    cols = split_columns(glyphs, gutter_min)
    parts = [
        glyphs_to_text(c, x_tolerance, y_tolerance).replace("\n", " ")
        for c in cols
    ]
    return " ".join(p for p in parts if p)


def _scan_pages(payload: bytes) -> list[str]:
    """Legacy fallback for payloads with no parseable page tree (raw
    fragments, exotic writers): every Flate stream containing a BT block
    is treated as one page, glyphs placed with the default 0.6 em metric.

    Streams are sliced by the dict's /Length (never by scanning for
    ``endstream`` — compressed bytes can contain CR/LF sequences that a
    delimiter scan would truncate); /Length-less streams fall back to the
    next ``endstream`` with EOL trim."""
    pages: list[str] = []
    for m in _STREAM_KW_RE.finditer(payload):
        header = payload[max(0, m.start() - 256) : m.start()]
        lengths = _LENGTH_RE.findall(header)
        start = m.end()
        if lengths:
            data = payload[start : start + int(lengths[-1])]
        else:
            end = payload.find(b"endstream", start)
            if end < 0:
                continue
            data = payload[start:end].rstrip(b"\r\n")
        if b"FlateDecode" in header:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" not in data:
            continue
        try:
            pages.append(glyphs_to_text(_extract_glyphs(data)))
        except (ValueError, IndexError):
            # one exotic stream (unsupported filter chain, binary run that
            # happened to decode) must not take down the document
            continue
    return pages


def extract_pdf_pages(payload: bytes, assemble=glyphs_to_text) -> list[str]:
    """Per-page extracted text (pdfplumber extract_text analog per page).

    Primary path: the document model (pdf_doc.PdfDocument) resolves the
    page tree, joins each page's content-stream array, and supplies the
    page's font tables so glyph advances use real /Widths metrics. A
    payload with no parseable page tree degrades to the legacy
    stream-scan path.

    ``assemble`` maps a page's glyph list to text — the default is the
    single-flow line clusterer; pass ``glyphs_to_reading_order`` for
    column-aware block assembly (multi-column layouts)."""
    try:
        doc = PdfDocument(payload)
        page_nodes = doc.pages()
    except Exception:  # noqa: BLE001 — damaged file: fall back to scan
        page_nodes = []
        doc = None
    if doc is not None and page_nodes:
        pages = []
        for node in page_nodes:
            try:
                content = doc.page_content(node)
                if not content:
                    pages.append("")
                    continue
                fonts = doc.page_fonts(node)
                pages.append(assemble(_extract_glyphs(content, fonts)))
            except Exception:  # noqa: BLE001 — degrade per page, never die
                pages.append("")
        return pages
    return _scan_pages(payload)


_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_INFO_ENTRY_RE = re.compile(
    # /Name followed by a literal (...) string or a <hex> string
    rb"/([A-Za-z0-9_.\-#]+)\s*(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]+>)"
)


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"("):
        return decode_text_string(unescape_literal(raw[1:-1]))
    digits = b"".join(raw[1:-1].split())
    if len(digits) % 2:
        digits += b"0"
    return decode_text_string(bytes.fromhex(digits.decode("ascii")))


def extract_pdf_info(payload: bytes) -> dict[str, str]:
    """M10 analog (extract_metadata, /root/reference/src/doifrompdf.py:114-126):
    the document-information dictionary, from the trailer's /Info reference.

    Keys are returned WITHOUT the leading slash and values decoded to str —
    pdfplumber's ``pdf.metadata`` shape, which is what the reference's
    probe functions receive. Insertion order = the dict's on-disk entry
    order (the last-value-wins quirk of find_identifier_in_pdf_info
    depends on it). Missing/this-parser-unreadable Info -> {}."""
    m = None
    for m in _INFO_REF_RE.finditer(payload):
        pass  # last /Info reference wins (incremental updates append)
    if m is None:
        return {}
    obj_num = int(m.group(1))
    om = re.search(
        rb"(?<![0-9])" + str(obj_num).encode() + rb"\s+0\s+obj\s*<<(.*?)>>",
        payload,
        re.DOTALL,
    )
    out: dict[str, str] = {}
    if om is not None:
        for key, val in _INFO_ENTRY_RE.findall(om.group(1)):
            try:
                out[key.decode("latin-1")] = _decode_pdf_string(val)
            except ValueError:
                continue
    if out:
        return out
    # Fallback: the Info object lives inside an /ObjStm or carries nested
    # dict values the flat regex can't slice — resolve it through the
    # document model (dict insertion order = on-disk entry order there too)
    try:
        doc = PdfDocument(payload)
        d = doc.values.get(obj_num)
        if isinstance(d, dict):
            for key, val in d.items():
                if isinstance(val, bytes):
                    out[key] = decode_text_string(val)
    except Exception:  # noqa: BLE001 — metadata probe must never crash
        return out
    return out


def extract_pdf_text(payload: bytes) -> tuple[str, int]:
    """Full-document text (pages joined with ' ', docscraper.py:205) and
    the page count."""
    pages = extract_pdf_pages(payload)
    return " ".join(pages), len(pages)


class PdfParser:
    """Actor-pool map_batches stage over binary PDF payloads.

    Input: ``payload_col`` binary column (rows whose payload starts with
    %PDF-). Output: appends ``extracted_text`` (large_string), ``n_pages``
    int32, ``extract_status`` string ('ok' | 'error: ...') — errors degrade
    to null text instead of crashing the task (SURVEY §4 retry semantics).
    """

    SPAN_TYPE = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64())]))

    def __init__(self, payload_col: str = "html"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str | None] = []
        spans_col: list[list[dict] | None] = []
        n_pages: list[int] = []
        status: list[str] = []
        for payload in batch[self.payload_col].to_pylist():
            if payload is None or not payload.startswith(b"%PDF-"):
                texts.append(None)
                spans_col.append(None)
                n_pages.append(0)
                status.append("error: not a pdf")
                continue
            try:
                pages = extract_pdf_pages(payload)
                spans, pos = [], 0
                for p in pages:
                    spans.append({"start": pos, "end": pos + len(p)})
                    pos += len(p) + 1
                texts.append(" ".join(pages))
                spans_col.append(spans)
                n_pages.append(len(pages))
                status.append("ok")
            except Exception as exc:  # noqa: BLE001 — degrade, never crash
                texts.append(None)
                spans_col.append(None)
                n_pages.append(0)
                status.append(f"error: {type(exc).__name__}")
        return (
            batch.append_column("extracted_text", pa.array(texts, type=pa.large_string()))
            .append_column("spans", pa.array(spans_col, type=self.SPAN_TYPE))
            .append_column("n_pages", pa.array(n_pages, type=pa.int32()))
            .append_column("extract_status", pa.array(status, type=pa.string()))
        )
