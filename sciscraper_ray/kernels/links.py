"""Download-link rewriting and query-routing predicates.

- ``format_download_link``: rewrite scraped ``location.href='...'`` onclick
  fragments into absolute URLs. Reference: LINK_CLEANING_PATTERN +
  format/adjust/clean chain (/root/reference/src/downloaders.py:27-29,232-280).
  Golden vectors from tests/test_downloaders.py:87-108.
- ``search_field_for``: the Dimensions query router — ``doi`` iff the term
  starts with ``10.`` else ``text_search``
  (/root/reference/src/webscrapers.py:264-276).
"""

from __future__ import annotations

import re

LINK_CLEANING_PATTERN = re.compile(r"(?P<location>location\.href=\')(?P<sep>/+)?")


def format_download_link(download_link: str | None, base_url: str = "https://sci-hub.se") -> str | None:
    """Rewrite ``location.href='<path>`` to an absolute URL, else None.

    A ``//host/...`` separator becomes ``https://``; a single ``/`` is
    replaced by ``base_url`` + ``/`` (the reference's ``self.url`` carries a
    trailing slash via its config URL root).
    """
    if not isinstance(download_link, str):
        return None
    m = LINK_CLEANING_PATTERN.match(download_link)
    if not m:
        return None
    stripped = download_link.replace(m.group("location"), "")
    sep = m.group("sep")
    if sep == "//":
        return stripped.replace(sep, "https://", 1)
    return stripped.replace(sep, base_url + "/", 1)


def search_field_for(search_text: str) -> str:
    return "doi" if search_text.startswith("10.") else "text_search"


def format_filename(
    etag: str | None, ext: str, *, url: str = "", date_stamp: str = ""
) -> str:
    """M22 analog (/root/reference/src/downloaders.py:346-366): download
    filename ``{date}_{etag}_{id}.{ext}``.

    The reference draws ``id`` from ``random.randint(1, 255)``; a resumable
    distributed engine needs idempotent names, so ``id`` is the same 1..255
    range derived from a stable hash of the source url instead (the
    documented deterministic replacement, SURVEY §2.2 M22). ``date_stamp``
    (YYMMDD) is an explicit argument — the caller owns the clock, as in the
    CSV sink. Etag handling matches the reference: ``None`` becomes
    ``_NaN_`` and surrounding double-quotes are stripped.
    """
    import hashlib

    etag = (etag or "_NaN_").strip('"')
    file_id = (
        int.from_bytes(
            hashlib.blake2b(url.encode(), digest_size=2).digest(), "little"
        )
        % 255
        + 1
    )
    return f"{date_stamp}_{etag}_{file_id}.{ext}"


_URL_PARTS = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/:?#]+)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)

_DEFAULT_PORTS = {"https": "443", "http": "80"}


def canonicalize_urls(urls) -> tuple:
    """Vectorized URL canonicalization: ``(canonical, host)`` arrays.

    Rules (the standard crawl-frontier normal form): lowercase scheme and
    host, strip one leading ``www.``, drop the scheme's default port
    (keep any other), strip one trailing slash from a non-root path, drop
    every ``utm_*`` query parameter (drop the ``?`` if none survive),
    drop the fragment. Unparseable rows canonicalize to null — a filter
    stage downstream decides their fate. One ``pc.extract_regex`` plus a
    handful of Arrow kernels; no Python per row.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = pc.extract_regex(urls, pattern=_URL_PARTS)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.replace_substring_regex(
        pc.utf8_lower(pc.struct_field(parts, "host")), r"^www\.", ""
    )
    port = pc.struct_field(parts, "port")
    default_port = pc.or_(
        pc.equal(port, ""),
        pc.and_(
            pc.equal(scheme, "https"), pc.equal(port, _DEFAULT_PORTS["https"])
        ),
    )
    default_port = pc.or_(
        default_port,
        pc.and_(
            pc.equal(scheme, "http"), pc.equal(port, _DEFAULT_PORTS["http"])
        ),
    )
    port_part = pc.if_else(
        default_port,
        pa.scalar("", pa.string()),
        pc.binary_join_element_wise(pa.scalar(":"), port, ""),
    )
    path = pc.replace_substring_regex(
        pc.struct_field(parts, "path"), r"(.)/$", r"\1"
    )
    query = pc.replace_substring_regex(
        pc.struct_field(parts, "query"), r"(^|&)utm_[A-Za-z_]+=[^&]*", ""
    )
    query = pc.replace_substring_regex(query, r"^&", "")
    query_part = pc.if_else(
        pc.equal(query, ""),
        pa.scalar("", pa.string()),
        pc.binary_join_element_wise(pa.scalar("?"), query, ""),
    )
    canonical = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, port_part, path, query_part, ""
    )
    return canonical, host
