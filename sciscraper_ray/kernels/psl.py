"""Public-suffix (eTLD+1) resolution — the registrable-domain key every
crawl-politeness, per-site quota and host-dedup stage groups on.

Implements the PSL algorithm (publicsuffix.org/list: exception rules beat
everything, else the LONGEST matching rule, else the implicit ``*``
default) over an embedded rule subset covering all four rule classes —
plain TLDs, multi-label suffixes (co.uk-style and private-registry
github.io-style), a wildcard (``*.ck``) and its exception (``!www.ck``).
The rule table is a module constant loaded once per worker; swapping in
the full published list changes only the three frozensets.

Fully vectorized: label tails are three ``pc.extract_regex`` calls and
rule matching is ``pc.is_in`` against the rule sets — no Python per row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# rule subset: one frozenset per label count (normal rules), plus the
# wildcard bases (the labels under the '*') and the exception rules.
PSL_NORMAL_1 = frozenset({"com", "org", "net", "edu", "io", "uk", "au"})
PSL_NORMAL_2 = frozenset({"co.uk", "ac.uk", "com.au", "github.io"})
PSL_WILDCARD_BASE_1 = frozenset({"ck"})  # *.ck
PSL_EXCEPTION_2 = frozenset({"www.ck"})  # !www.ck

_IP_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def _tail(hosts, k: int):
    """Last-k-labels tail of each host (null when the host has < k labels)."""
    pat = r"(?:^|\.)(?P<t>" + r"\.".join([r"[^.]+"] * k) + r")$"
    return pc.struct_field(pc.extract_regex(hosts, pattern=pat), "t")


def psl_registrable(hosts) -> tuple:
    """``(public_suffix, registrable_domain, rule_type)`` arrays.

    ``rule_type`` in {normal, wildcard, exception, default}; IPv4
    literals yield all-null rows (the PSL is a DNS-name algorithm).
    ``registrable_domain`` is null when the host IS a public suffix.
    """
    if not isinstance(hosts, (pa.Array, pa.ChunkedArray)):
        hosts = pa.array(list(hosts), pa.string())
    t1 = _tail(hosts, 1)
    t2 = _tail(hosts, 2)
    t3 = _tail(hosts, 3)

    is_ip = pc.match_substring_regex(hosts, _IP_RE)
    exc = pc.coalesce(
        pc.is_in(t2, value_set=pa.array(sorted(PSL_EXCEPTION_2))),
        pa.scalar(False),
    )
    wild = pc.coalesce(
        pc.is_in(t1, value_set=pa.array(sorted(PSL_WILDCARD_BASE_1))),
        pa.scalar(False),
    )
    n2 = pc.coalesce(
        pc.is_in(t2, value_set=pa.array(sorted(PSL_NORMAL_2))),
        pa.scalar(False),
    )
    n1 = pc.coalesce(
        pc.is_in(t1, value_set=pa.array(sorted(PSL_NORMAL_1))),
        pa.scalar(False),
    )

    null_s = pa.scalar(None, pa.string())
    # precedence: exception > longest match (wildcard spans 2 labels,
    # ties with normal-2 cannot occur in a well-formed list) > normal-1
    # > the implicit '*' default.
    suffix = pc.if_else(
        is_ip,
        null_s,
        pc.if_else(
            exc,
            t1,  # exception: suffix is the rule minus its first label
            pc.if_else(wild, t2, pc.if_else(n2, t2, t1)),
        ),
    )
    registrable = pc.if_else(
        is_ip,
        null_s,
        pc.if_else(
            exc,
            t2,
            pc.if_else(wild, t3, pc.if_else(n2, t3, t2)),
        ),
    )
    rule_type = pc.if_else(
        is_ip,
        null_s,
        pc.if_else(
            exc,
            pa.scalar("exception", pa.string()),
            pc.if_else(
                wild,
                pa.scalar("wildcard", pa.string()),
                pc.if_else(
                    pc.or_(n2, n1),
                    pa.scalar("normal", pa.string()),
                    pa.scalar("default", pa.string()),
                ),
            ),
        ),
    )
    return suffix, registrable, rule_type
