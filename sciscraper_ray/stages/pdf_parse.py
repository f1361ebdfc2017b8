"""PDF layout parser — the actor-pool re-expression of the reference's
pdfplumber text path (/root/reference/src/docscraper.py:188-205): per page
``extract_text(x_tolerance=1, y_tolerance=3)``, pages joined with ``" "``.

From-scratch implementation (pdfplumber is not a dependency): scans body
objects, inflates Flate streams, interprets the content-stream text
operators (BT/ET, Tf, Tm, Td, TD, T*, TL, Tj, TJ, '), places glyphs with a
fixed 0.6em advance (the metric the synthetic writer uses — a font-metrics
table would replace it for real fonts), then clusters glyphs
pdfplumber-style: lines by y within ``y_tolerance``, words split on
horizontal gaps > ``x_tolerance``, words joined with single spaces, lines
with newlines, pages with a single space.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

_STREAM_KW_RE = re.compile(rb"(?<!end)stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_NUM_RE = re.compile(r"[-+]?\d*\.?\d+")

X_TOLERANCE = 1.0
Y_TOLERANCE = 3.0
DEFAULT_CHAR_EM = 0.6


class _TextState:
    __slots__ = ("tm", "lm", "size", "leading")

    def __init__(self):
        self.tm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]  # a b c d e f
        self.lm = list(self.tm)
        self.size = 12.0
        self.leading = 0.0


def _tokenize(stream: str):
    """Content-stream tokens: numbers, names, (strings), [arrays], operators."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            depth, j, out = 1, i + 1, []
            while j < n and depth:
                ch = stream[j]
                if ch == "\\" and j + 1 < n:
                    out.append(stream[j + 1])
                    j += 2
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        break
                out.append(ch)
                j += 1
            yield ("str", "".join(out))
            i = j + 1
        elif c == "<" and not (i + 1 < n and stream[i + 1] == "<"):
            j = stream.find(">", i + 1)
            if j == -1:
                break
            digits = "".join(stream[i + 1 : j].split())
            if len(digits) % 2:  # PDF spec §7.3.4.3: odd final digit -> pad 0
                digits += "0"
            try:
                raw = bytes.fromhex(digits)
            except ValueError:
                # real-world streams embed non-text <...> runs (inline
                # images, font programs); draw nothing rather than die
                raw = b""
            if raw[:2] == b"\xfe\xff":
                s = raw[2:].decode("utf-16-be", errors="replace")
            else:
                s = raw.decode("latin-1")
            yield ("str", s)
            i = j + 1
        elif c == "[":
            yield ("arr_open", None)
            i += 1
        elif c == "]":
            yield ("arr_close", None)
            i += 1
        elif c == "/":
            j = i + 1
            while j < n and not stream[j].isspace() and stream[j] not in "()[]<>/":
                j += 1
            yield ("name", stream[i + 1 : j])
            i = j
        else:
            j = i
            while j < n and not stream[j].isspace() and stream[j] not in "()[]<>/":
                j += 1
            tok = stream[i:j]
            if _NUM_RE.fullmatch(tok):
                yield ("num", float(tok))
            else:
                yield ("op", tok)
            i = j if j > i else i + 1


def _extract_glyphs(stream: str) -> list[tuple[str, float, float]]:
    """(char, x, y) glyph placements from one content stream."""
    st = _TextState()
    glyphs: list[tuple[str, float, float]] = []
    stack: list = []

    def draw(s: str) -> None:
        x, y = st.tm[4], st.tm[5]
        w = DEFAULT_CHAR_EM * st.size * st.tm[0]
        for ch in s:
            glyphs.append((ch, x, y))
            x += w
        st.tm[4] = x

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
        elif op == "Tf" and len(stack) >= 2:
            st.size = stack[-1][1]
        elif op == "Tm" and len(stack) >= 6:
            vals = [s[1] for s in stack[-6:]]
            st.tm = list(vals)
            st.lm = list(vals)
        elif op in ("Td", "TD") and len(stack) >= 2:
            tx, ty = stack[-2][1], stack[-1][1]
            if op == "TD":
                st.leading = -ty
            st.lm = [
                st.lm[0], st.lm[1], st.lm[2], st.lm[3],
                st.lm[4] + tx * st.lm[0] + ty * st.lm[2],
                st.lm[5] + tx * st.lm[1] + ty * st.lm[3],
            ]
            st.tm = list(st.lm)
        elif op == "TL" and stack:
            st.leading = stack[-1][1]
        elif op == "T*":
            st.lm[4] -= 0.0
            st.lm[5] -= st.leading
            st.tm = list(st.lm)
        elif op == "Tj" and stack and stack[-1][0] == "str":
            draw(stack[-1][1])
        elif op == "'" and stack and stack[-1][0] == "str":
            st.lm[5] -= st.leading
            st.tm = list(st.lm)
            draw(stack[-1][1])
        elif op == "TJ" and stack and stack[-1][0] == "arr":
            for k, v in stack[-1][1]:
                if k == "str":
                    draw(v)
                elif k == "num":
                    st.tm[4] -= v / 1000.0 * st.size * st.tm[0]
        stack = []  # operands are consumed by their operator
    return glyphs


def glyphs_to_text(
    glyphs: list[tuple[str, float, float]],
    x_tolerance: float = X_TOLERANCE,
    y_tolerance: float = Y_TOLERANCE,
    char_w_of=lambda ch, size: DEFAULT_CHAR_EM * size,
) -> str:
    """pdfplumber-style assembly: cluster lines by y (within y_tolerance),
    words by x-gap (> x_tolerance splits), single-space words, newline
    lines."""
    if not glyphs:
        return ""
    arr = sorted(glyphs, key=lambda g: (-g[2], g[1]))
    lines: list[list[tuple[str, float, float]]] = []
    for g in arr:
        if lines and abs(lines[-1][0][2] - g[2]) <= y_tolerance:
            lines[-1].append(g)
        else:
            lines.append([g])
    out_lines = []
    for line in lines:
        line.sort(key=lambda g: g[1])
        parts = [line[0][0]]
        prev_ch, prev_x = line[0][0], line[0][1]
        w = DEFAULT_CHAR_EM * 10.0  # glyph advance (matches writer metric)
        for ch, x, _ in line[1:]:
            gap = x - (prev_x + w)
            if gap > x_tolerance:
                parts.append(" ")
            parts.append(ch)
            prev_x = x
        out_lines.append("".join(parts))
    return "\n".join(out_lines)


def extract_pdf_pages(payload: bytes) -> list[str]:
    """Per-page extracted text (pdfplumber extract_text analog per page).

    Streams are sliced by the dict's /Length (never by scanning for
    ``endstream`` — compressed bytes can contain CR/LF sequences that a
    delimiter scan would truncate); /Length-less streams fall back to the
    next ``endstream`` with EOL trim.
    """
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
        try:
            text = data.decode("latin-1")
        except UnicodeDecodeError:
            continue
        if "BT" not in text:
            continue
        try:
            pages.append(glyphs_to_text(_extract_glyphs(text)))
        except (ValueError, IndexError):
            # one exotic stream (unsupported filter chain, binary run that
            # happened to decode) must not take down the document
            continue
    return pages


_INFO_REF_RE = re.compile(rb"/Info\s+(\d+)\s+\d+\s+R")
_INFO_ENTRY_RE = re.compile(
    # /Name followed by a literal (...) string or a <hex> string
    rb"/([A-Za-z0-9_.\-#]+)\s*(\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]+>)"
)


_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"("):
        body = raw[1:-1]
        out = []
        i = 0
        while i < len(body):
            if body[i : i + 1] == b"\\" and i + 1 < len(body):
                # PDF spec §7.3.4.2 literal-string escapes: named escapes,
                # octal \ddd (1-3 digits), line continuations (\<EOL>
                # disappears); any other escaped byte falls through as the
                # literal byte (ADVICE r2: \n used to decode to 'n').
                nxt = body[i + 1 : i + 2]
                if nxt in _PDF_ESCAPES:
                    out.append(_PDF_ESCAPES[nxt])
                    i += 2
                elif nxt.isdigit() and nxt < b"8":
                    j = i + 1
                    while j < len(body) and j < i + 4 and body[j : j + 1].isdigit() and body[j : j + 1] < b"8":
                        j += 1
                    out.append(bytes([int(body[i + 1 : j], 8) & 0xFF]))
                    i = j
                elif nxt in (b"\r", b"\n"):
                    i += 2
                    if nxt == b"\r" and body[i : i + 1] == b"\n":
                        i += 1
                else:
                    out.append(nxt)
                    i += 2
            else:
                out.append(body[i : i + 1])
                i += 1
        return b"".join(out).decode("latin-1")
    digits = b"".join(raw[1:-1].split())
    if len(digits) % 2:
        digits += b"0"
    data = bytes.fromhex(digits.decode("ascii"))
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace")
    return data.decode("latin-1")


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
    if om is None:
        return {}
    out: dict[str, str] = {}
    for key, val in _INFO_ENTRY_RE.findall(om.group(1)):
        try:
            out[key.decode("latin-1")] = _decode_pdf_string(val)
        except ValueError:
            continue
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
