"""Relational building blocks: salted two-phase groupby under skew."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def test_salted_group_count_matches_plain_groupby(ray_session):
    import ray.data

    from sciscraper_ray.stages.relational import salted_group_count

    rng = np.random.default_rng(7)
    # one mega-hot key (~60% of rows) + a uniform tail — the skew shape
    # salting exists for
    keys = np.where(
        rng.random(20_000) < 0.6,
        "hot",
        np.char.add("k", rng.integers(0, 50, 20_000).astype(str)),
    )
    vals = rng.integers(0, 100, 20_000)
    t = pa.table({"host": keys, "v": vals.astype("int64")})

    out = (
        salted_group_count(
            ray.data.from_arrow(t), "host", salts=8, agg_cols={"v": "sum_v"}
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    expected = (
        pd.DataFrame({"host": keys, "v": vals})
        .groupby("host")
        .agg(cnt=("v", "size"), sum_v=("v", "sum"))
        .reset_index()
        .sort_values("host")
        .reset_index(drop=True)
    )
    assert out["host"].tolist() == expected["host"].tolist()
    assert out["cnt"].tolist() == expected["cnt"].tolist()
    assert out["sum_v"].tolist() == expected["sum_v"].tolist()
