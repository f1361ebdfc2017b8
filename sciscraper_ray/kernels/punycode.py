"""Punycode (RFC 3492) decoding from scratch — IDN hostname handling
for crawl URL normalization (Common-Crawl host tables carry xn-- labels;
comparing, deduping, or rate-limiting per registrable domain needs the
unicode form). Decode-only: the engine consumes crawled hostnames, it
does not mint them. Bootstring parameters are the RFC's (base 36,
tmin 1, tmax 26, skew 38, damp 700, initial bias 72, initial n 128).
"""

from __future__ import annotations

_BASE, _TMIN, _TMAX = 36, 1, 26
_SKEW, _DAMP = 38, 700
_INITIAL_BIAS, _INITIAL_N = 72, 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + (_BASE * delta) // (delta + _SKEW)


def punycode_decode(s: str) -> str:
    """Decode one punycode label body (no 'xn--' prefix)."""
    if "-" in s:
        cut = s.rindex("-")
        output = list(s[:cut])
        rest = s[cut + 1 :]
    else:
        output, rest = [], s
    n, i, bias = _INITIAL_N, 0, _INITIAL_BIAS
    pos = 0
    while pos < len(rest):
        oldi, w, k = i, 1, _BASE
        while True:
            if pos >= len(rest):
                raise ValueError("truncated punycode input")
            c = rest[pos]
            pos += 1
            if "a" <= c <= "z":
                digit = ord(c) - ord("a")
            elif "0" <= c <= "9":
                digit = ord(c) - ord("0") + 26
            elif "A" <= c <= "Z":
                digit = ord(c) - ord("A")
            else:
                raise ValueError(f"invalid punycode digit {c!r}")
            i += digit * w
            t = _TMIN if k <= bias + _TMIN else (_TMAX if k >= bias + _TMAX else k - bias)
            if digit < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def idn_to_unicode(hostname: str) -> str:
    """Decode every xn-- label of a hostname; ASCII labels pass through."""
    return ".".join(
        punycode_decode(lbl[4:]) if lbl.startswith("xn--") else lbl
        for lbl in hostname.split(".")
    )
