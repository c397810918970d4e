"""Distributed relational operators (pipelines/relational.py): anti-join,
as-of join, window top-k, distinct-count, grouped median — exactness vs
in-memory pandas references, including tie/empty/cross-batch edge cases."""

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.relational import (
    anti_join,
    asof_join,
    broadcast_range_join,
    distinct_count,
    grouped_median,
    window_topk,
)


def _ds(ray_session, df: pd.DataFrame, blocks: int = 3):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_anti_join_exact(ray_session):
    left = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                         "name": [f"c{i}" for i in range(20)]})
    right = pd.DataFrame({"rk": np.array([1, 3, 3, 5, 19], dtype=np.int64)})
    out = anti_join(_ds(ray_session, left), _ds(ray_session, right, 2),
                    "k", "rk", num_partitions=4).to_pandas()
    expected = left[~left["k"].isin(right["rk"])]
    pd.testing.assert_frame_equal(_sorted(out), _sorted(expected))


def test_anti_join_empty_right(ray_session):
    left = pd.DataFrame({"k": np.arange(5, dtype=np.int64)})
    right = pd.DataFrame({"rk": pd.Series([], dtype="int64")})
    out = anti_join(_ds(ray_session, left), _ds(ray_session, right, 1),
                    "k", "rk", num_partitions=4).to_pandas()
    assert sorted(out["k"]) == list(range(5))


def test_asof_join_strict_prior_and_ties(ray_session):
    ts = pd.to_datetime(
        ["2024-01-01 10:00:00", "2024-01-01 10:00:00",
         "2024-01-01 10:05:00", "2024-01-01 11:00:00"]
    ).astype("datetime64[us]")
    # two right rows share ts 10:00 — tie must break to larger event_id
    right = pd.DataFrame({"user": np.int64([1, 1, 1, 1]),
                          "ts": ts,
                          "event_id": np.int64([10, 11, 12, 13]),
                          "value": [0.1, 0.2, 0.3, 0.4]})
    left = pd.DataFrame({
        "user": np.int64([1, 1, 1]),
        "ts": pd.to_datetime(
            ["2024-01-01 10:00:00",   # no strictly-prior row -> dropped
             "2024-01-01 10:05:00",   # prior = ties at 10:00 -> id 11
             "2024-01-01 12:00:00"]   # prior = 11:00 -> id 13
        ).astype("datetime64[us]"),
        "event_id": np.int64([100, 101, 102]),
    })
    out = asof_join(
        _ds(ray_session, left, 2), _ds(ray_session, right, 2),
        by="user", right_by="user", on="ts",
        right_cols=["event_id", "value"], tie_col="event_id",
        num_partitions=4,
    ).to_pandas()
    got = out.set_index("event_id")["event_id_r"].to_dict()
    assert got == {101: 11, 102: 13}
    assert out.set_index("event_id")["value"].to_dict() == \
        pytest.approx({101: 0.2, 102: 0.4})


def test_window_topk_with_ties(ray_session):
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 5, 200).astype(np.int64),
        "id": np.arange(200, dtype=np.int64),
        # coarse scores force ties within keys
        "score": rng.randint(0, 4, 200).astype(np.float64),
    })
    out = window_topk(_ds(ray_session, df, 5), ["k"], "score", 3,
                      tie_col="id", num_partitions=4).to_pandas()
    expected = (
        df.sort_values(["score", "id"], ascending=[False, True],
                       kind="stable")
        .groupby("k", sort=False).head(3)
    )
    pd.testing.assert_frame_equal(_sorted(out), _sorted(expected))


def test_distinct_count_cross_batch(ray_session):
    # the same (k, v) pair appears in every block: local combiners dedup
    # per batch, the exchange must dedup across batches
    df = pd.DataFrame({
        "k": np.int64([1] * 30 + [2] * 30),
        "v": np.int64(list(range(10)) * 3 + [7] * 30),
    })
    out = distinct_count(_ds(ray_session, df, 6), ["k"], "v", "n",
                         num_partitions=4).to_pandas()
    got = out.set_index("k")["n"].to_dict()
    assert got == {1: 10, 2: 1}


def test_asof_join_random_vs_quadratic_reference(ray_session):
    """Seeded random streams, duplicate timestamps included: the
    distributed as-of join must equal the O(n²) definition (latest
    strictly-prior right row per (user, left row), ties → max id)."""
    rng = np.random.RandomState(11)
    n_l, n_r = 300, 400
    base = pd.Timestamp("2024-01-01").value // 1000
    left = pd.DataFrame({
        "user": rng.randint(0, 8, n_l).astype(np.int64),
        "ts": pd.to_datetime(
            base + rng.randint(0, 50, n_l) * 60_000_000, unit="us"),
        "event_id": np.arange(n_l, dtype=np.int64),
    })
    right = pd.DataFrame({
        "user": rng.randint(0, 8, n_r).astype(np.int64),
        "ts": pd.to_datetime(
            base + rng.randint(0, 50, n_r) * 60_000_000, unit="us"),
        "event_id": np.arange(1000, 1000 + n_r, dtype=np.int64),
        "value": rng.rand(n_r).round(6),
    })
    out = asof_join(
        _ds(ray_session, left, 4), _ds(ray_session, right, 5),
        by="user", right_by="user", on="ts",
        right_cols=["event_id", "value"], tie_col="event_id",
        num_partitions=4,
    ).to_pandas()
    got = out.set_index("event_id")["event_id_r"].to_dict()

    expected = {}
    for _, lrow in left.iterrows():
        prior = right[(right["user"] == lrow["user"])
                      & (right["ts"] < lrow["ts"])]
        if len(prior):
            best = prior.sort_values(["ts", "event_id"]).iloc[-1]
            expected[lrow["event_id"]] = best["event_id"]
    assert got == expected


def test_broadcast_range_join_overlapping_and_boundaries(ray_session):
    df = pd.DataFrame({"id": np.arange(6, dtype=np.int64),
                       "x": [0.0, 9.9, 10.0, 15.0, 20.0, 25.0]})
    iv = pa.table({"band": ["a", "b", "wide"],
                   "lo": [0.0, 10.0, 0.0],
                   "hi": [10.0, 20.0, 30.0]})
    out = broadcast_range_join(_ds(ray_session, df, 3), iv, "x") \
        .to_pandas()
    got = sorted(zip(out["id"], out["band"]))
    # [lo, hi): x=10 joins b not a; x=20 joins neither a nor b; every
    # row also joins the overlapping 'wide' band
    assert got == sorted(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")] +
        [(i, "wide") for i in range(6)]
    )


def test_grouped_median_interpolates_even_counts(ray_session):
    df = pd.DataFrame({
        "g": ["a", "a", "a", "a", "b", "b", "b"],
        "x": [1.0, 2.0, 10.0, 4.0, 5.0, 1.0, 3.0],
    })
    out = grouped_median(_ds(ray_session, df, 3), ["g"], "x", "m",
                         num_partitions=4).to_pandas()
    got = out.set_index("g")["m"].to_dict()
    assert got == pytest.approx({"a": 3.0, "b": 3.0})
