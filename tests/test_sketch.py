"""HyperLogLog sketch: estimate accuracy and partial-merge associativity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _merge(tables):
    regs: dict[int, int] = {}
    for t in tables:
        for b, r in zip(t["bucket"].to_pylist(), t["rho"].to_pylist()):
            regs[b] = max(regs.get(b, 0), r)
    return regs


def test_hll_estimate_accuracy():
    """m=64 -> ~13% standard error; assert within 3 sigma for a few
    cardinalities, computed over batch-split partials (the merge path)."""
    from sciscraper_ray.stages.sketch import hll_estimate, hll_partial_batch

    for n in (100, 1_000, 20_000):
        vals = [f"user-{i}" for i in range(n)]
        parts = [
            hll_partial_batch(pa.table({"u": vals[i : i + 512]}), "u")
            for i in range(0, n, 512)
        ]
        est = hll_estimate(_merge(parts))
        assert abs(est - n) / n < 0.4, (n, est)


def test_hll_partials_order_independent():
    """Register merge is a max — any batch split/order gives the same
    registers (the property that makes the sketch distributable)."""
    from sciscraper_ray.stages.sketch import hll_partial_batch

    vals = [f"k{i}" for i in range(500)]
    one = _merge([hll_partial_batch(pa.table({"u": vals}), "u")])
    rng = np.random.default_rng(0)
    shuffled = [vals[i] for i in rng.permutation(500)]
    many = _merge(
        [
            hll_partial_batch(pa.table({"u": shuffled[i : i + 37]}), "u")
            for i in range(0, 500, 37)
        ]
    )
    assert one == many


def test_hll_nulls_skipped():
    from sciscraper_ray.stages.sketch import hll_partial_batch

    t = pa.table({"u": pa.array([None, None], pa.string())})
    assert hll_partial_batch(t, "u").num_rows == 0
