"""DOI / arXiv identifier mining and canonicalization.

Semantics pinned to the reference's ``doi_regex`` module
(/root/reference/src/doi_regex.py:5-82): an ordered pattern chain (DOI
patterns first, then arXiv), first match wins, then canonicalization to
``10.{registrant}/{suffix}`` or ``NNNN.NNNNN`` via named-group regexes over
the casefolded text. The chain's asymmetries are part of the contract and
golden-tested (tests/test_kernels.py), e.g.
``https://arxiv.org/abs/1234.5678`` -> None but ``...5678.pdf`` -> 1234.5678.
"""

from __future__ import annotations

import re

import numpy as np

_DOI_CHAIN = tuple(
    re.compile(p)
    for p in (
        r"doi[\s\.\:]{0,2}(10\.\d{4}[\d\:\.\-\/a-z]+)(?:[\s\n\"<]|$)",
        r"(10\.\d{4}[\d\:\.\-\/a-z]+)(?:[\s\n\"<]|$)",
        r"(10\.\d{4}[\:\.\-\/a-z]+[\:\.\-\d]+)(?:[\s\na-z\"<]|$)",
        r"https?://[ -~]*doi[ -~]*/(10\.\d{4,9}/[-._;()/:a-z0-9]+)(?:[\s\n\"<]|$)",
        r"^(10\.\d{4,9}/[-._;()/:a-z0-9]+)$",
    )
)

_ARXIV_CHAIN = tuple(
    re.compile(p)
    for p in (
        r"^(\d{4}\.\d+)(?:v\d+)?$",
        r"arxiv[\s]*\:[\s]*(\d{4}\.\d+)(?:v\d+)?(?:[\s\n\"<]|$)",
        r"(\d{4}\.\d+)(?:v\d+)?(?:\.pdf)",
        r"^(\d{4}\.\d+)(?:v\d+)?$",
    )
)

_DOI_CANON = re.compile(
    r"""(?xm)
  (?P<marker>   doi[:\/\s]{0,3})?
  (?P<prefix>
    (?P<namespace> 10)
    [.]
    (?P<registrant> \d{2,9})
  )
  (?P<sep>     [:\-\/\s\]])
  (?P<suffix>  [\-._;()\/:a-z0-9]+[a-z0-9])
  (?P<trailing> ([\s\n\"<.]|$))
"""
)

_ARXIV_CANON = re.compile(
    r"""(?x)
    (?P<marker>arxiv[:\/\s]{0,3})?
    (?P<identifier>\d{4}\.\d+)
    (?:v\d+)?
    (?P<trailing>\.pdf)?$
""",
    flags=re.IGNORECASE,
)


def standardize_identifier(identifier: str, kind: str) -> str | None:
    """Canonicalize a raw matched identifier.

    DOI -> ``10.{registrant}/{suffix}``; arXiv -> bare ``NNNN.NNNNN``.
    Mirrors the reference's last-match-wins ``finditer`` accumulation
    (doi_regex.py:51-67).
    """
    canon = _DOI_CANON if kind == "doi" else _ARXIV_CANON
    meta: dict[str, str | None] = {}
    for m in canon.finditer(identifier.casefold()):
        meta.update(m.groupdict())
    if kind == "doi":
        if "registrant" not in meta or "suffix" not in meta:
            return None
        return f"10.{meta['registrant']}/{meta['suffix']}"
    return meta.get("identifier")


def extract_identifier(text: str) -> str | None:
    """First-match-wins extraction over the DOI chain, then the arXiv chain."""
    folded = text.casefold()
    for pattern in _DOI_CHAIN:
        m = pattern.search(folded)
        if m and m.group(1):
            return standardize_identifier(m.group(1), "doi")
    for pattern in _ARXIV_CHAIN:
        m = pattern.search(folded)
        if m and m.group(0):
            return standardize_identifier(m.group(0), "arxiv")
    return None


def identifier_kind(text: str) -> str | None:
    """Which chain produced the identifier ('doi' / 'arxiv' / None)."""
    folded = text.casefold()
    for pattern in _DOI_CHAIN:
        m = pattern.search(folded)
        if m and m.group(1):
            return "doi" if standardize_identifier(m.group(1), "doi") else None
    for pattern in _ARXIV_CHAIN:
        m = pattern.search(folded)
        if m and m.group(0):
            return "arxiv" if standardize_identifier(m.group(0), "arxiv") else None
    return None


_METADATA_PROBE_ORDER = ("doi", "pdf2doi_identifier", "arxiv")


def find_identifier_in_metadata(
    metadata: dict[str, str],
) -> tuple[str, str] | None:
    """M8 analog (/root/reference/src/doifrompdf.py:55-82): probe the
    priority metadata keys; first present non-empty value wins, returned
    RAW (the reference does not normalize here) with the KEY as the
    identifier type.

    The reference iterates a ``set`` of keys — nondeterministic priority
    when several are present; this uses the fixed order (doi,
    pdf2doi_identifier, arxiv) per SURVEY §2.2 M8 and pins it with tests.
    """
    for key in _METADATA_PROBE_ORDER:
        value = metadata.get(key)
        if value:
            return value, key
    return None


def find_identifier_in_pdf_info(
    metadata: dict[str, str],
) -> tuple[str, str] | None:
    """M9 analog (/root/reference/src/doifrompdf.py:85-111): scan the
    document-information VALUES (except the '/wps-journaldoi' key) with
    the text identifier chain.

    Reference quirk replicated exactly: the loop overwrites ``result``
    every iteration, so only the LAST value's outcome survives — a valid
    identifier in an earlier value is discarded if a later value has none.
    (The exclusion key keeps the reference's leading slash even though
    pdfplumber-shaped metadata keys carry none, so it is effectively
    vacuous — also reference-faithful.)"""
    result: tuple[str, str] | None = None
    for key, value in metadata.items():
        if key == "/wps-journaldoi":
            continue
        ident = extract_identifier(value) if value else None
        if ident is not None:
            kind = identifier_kind(value)
            result = (ident, kind) if kind else None
        else:
            result = None
    return result


def identifier_from_pdf_metadata(
    metadata: dict[str, str],
) -> tuple[str | None, str | None]:
    """M7's metadata prefix of the doi_from_pdf chain
    (/root/reference/src/doifrompdf.py:30-52): metadata probe, then
    pdf-info value scan; (None, None) defers to the text step."""
    found = find_identifier_in_metadata(metadata)
    if found is None:
        found = find_identifier_in_pdf_info(metadata)
    return found if found is not None else (None, None)


def extract_identifiers_array(texts) -> tuple[np.ndarray, np.ndarray]:
    """Batch form: iterable of str|None -> (identifier, kind) object arrays.

    Regexes are compiled at module import (once per worker process); the
    per-row Python loop is bounded by the identifier stage's batch size.
    """
    n = len(texts)
    ids = np.empty(n, dtype=object)
    kinds = np.empty(n, dtype=object)
    for i, t in enumerate(texts):
        if t is None:
            ids[i] = None
            kinds[i] = None
            continue
        ident = extract_identifier(t)
        ids[i] = ident
        kinds[i] = identifier_kind(t) if ident is not None else None
    return ids, kinds
