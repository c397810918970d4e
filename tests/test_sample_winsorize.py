"""grouped_hash_sample / grouped_winsorize — determinism, partition
independence, exactness vs in-memory references."""

import numpy as np
import pandas as pd

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.relational import (
    grouped_hash_sample,
    grouped_weighted_sample,
    grouped_winsorize,
)

_KNUTH = np.uint64(2654435761)


def _ds(ray_session, df: pd.DataFrame, blocks: int = 3):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _docs(n=400, groups=5):
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": (np.arange(n, dtype=np.int64) * 7919) % groups,
        "v": np.sin(np.arange(n) * 0.37) * 100,
    })


def _sample_ref(df: pd.DataFrame, k: int) -> pd.DataFrame:
    prio = (df["id"].to_numpy(np.uint64) * _KNUTH) & np.uint64(0xFFFFFFFF)
    return (df.assign(__p=prio.astype(np.int64))
            .sort_values(["__p", "id"], kind="mergesort")
            .groupby("g", sort=False).head(k)
            .drop(columns="__p"))


def test_hash_sample_matches_reference(ray_session):
    df = _docs()
    got = grouped_hash_sample(_ds(ray_session, df), ["g"], 7, "id",
                              num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(_sample_ref(df, 7)))


def test_hash_sample_partition_independent(ray_session):
    df = _docs(n=250, groups=3)
    a = grouped_hash_sample(_ds(ray_session, df, 1), ["g"], 5, "id",
                            num_partitions=1).to_pandas()
    b = grouped_hash_sample(_ds(ray_session, df, 8), ["g"], 5, "id",
                            num_partitions=6).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))


def test_hash_sample_small_groups_keep_all_rows(ray_session):
    df = _docs(n=12, groups=4)  # 3 rows per group < k
    got = grouped_hash_sample(_ds(ray_session, df, 2), ["g"], 10, "id",
                              num_partitions=2).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(df))


def _weighted_ref(df: pd.DataFrame, k: int) -> pd.DataFrame:
    d = df[np.isfinite(df["w"]) & (df["w"] > 0)].copy()
    h = (d["id"].to_numpy(np.uint64) * _KNUTH) & np.uint64(0xFFFFFFFF)
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    d["__p"] = -np.log(u) / d["w"].to_numpy(np.float64)
    out = (d.sort_values(["__p", "id"], kind="mergesort")
           .groupby("g", sort=False).head(k).drop(columns="__p"))
    return out


def test_weighted_sample_matches_reference(ray_session):
    df = _docs()
    df["w"] = 1.0 + (df["id"].to_numpy() % 17).astype(np.float64)
    got = grouped_weighted_sample(_ds(ray_session, df), ["g"], 6, "id",
                                  "w", num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got),
                                  _sorted(_weighted_ref(df, 6)))


def test_weighted_sample_drops_nonpositive_weights(ray_session):
    df = _docs(n=60, groups=2)
    df["w"] = 1.0
    df.loc[df["id"] % 3 == 0, "w"] = 0.0
    df.loc[df["id"] % 5 == 0, "w"] = -2.0
    got = grouped_weighted_sample(_ds(ray_session, df), ["g"], 100, "id",
                                  "w", num_partitions=2).to_pandas()
    bad = set(df.loc[df["w"] <= 0, "id"])
    assert not (set(got["id"]) & bad)
    pd.testing.assert_frame_equal(_sorted(got),
                                  _sorted(df[df["w"] > 0]))


def test_weighted_sample_biases_toward_heavy_rows(ray_session):
    # one group, half the rows weight 100, half weight 1: the heavy
    # half should dominate a k=20 sample of 200 rows
    df = pd.DataFrame({
        "id": np.arange(200, dtype=np.int64),
        "g": 0,
        "w": np.where(np.arange(200) < 100, 100.0, 1.0),
    })
    got = grouped_weighted_sample(_ds(ray_session, df), ["g"], 20, "id",
                                  "w", num_partitions=2).to_pandas()
    assert (got["id"] < 100).sum() >= 15


def _winsor_ref(df, q_lo, q_hi):
    g = df.groupby("g")["v"]
    lo = np.round(g.transform(lambda s: s.quantile(q_lo)).to_numpy(), 6)
    hi = np.round(g.transform(lambda s: s.quantile(q_hi)).to_numpy(), 6)
    return df.assign(v_w=np.clip(df["v"].to_numpy(np.float64), lo, hi))


def test_winsorize_matches_reference(ray_session):
    df = _docs()
    got = grouped_winsorize(_ds(ray_session, df), ["g"], "v",
                            q_lo=0.1, q_hi=0.9,
                            num_partitions=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got),
                                  _sorted(_winsor_ref(df, 0.1, 0.9)))


def test_winsorize_interior_values_untouched(ray_session):
    df = _docs(n=200, groups=2)
    got = grouped_winsorize(_ds(ray_session, df), ["g"], "v",
                            q_lo=0.0, q_hi=1.0,
                            num_partitions=2).to_pandas()
    # bounds round to 6 digits, so the group extremes themselves may
    # move by up to 5e-7 — interior rows are bit-identical
    np.testing.assert_allclose(got["v_w"].to_numpy(),
                               got["v"].to_numpy(), rtol=0, atol=1e-6)


def test_winsorize_clips_planted_outliers(ray_session):
    df = pd.DataFrame({
        "g": ["a"] * 100,
        "v": np.r_[np.linspace(0, 1, 98), 1e9, -1e9],
    })
    got = grouped_winsorize(_ds(ray_session, df, 3), ["g"], "v",
                            q_lo=0.05, q_hi=0.95,
                            num_partitions=2).to_pandas()
    assert got["v_w"].max() < 2.0
    assert got["v_w"].min() > -1.0
