"""Count-Min sketch: never-underestimate guarantee, bounded
overestimate, merge = single pass, and the distributed operator."""

import numpy as np
import pandas as pd

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions import cms


def test_never_underestimates_and_bounded_over():
    rng = np.random.default_rng(7)
    vals = pd.Series(rng.zipf(1.5, 50_000) % 2000)
    counts = cms.update_counts(vals, depth=4, width=4096)
    true = vals.value_counts()
    probes = pd.Series(true.index[:200])
    est = cms.point_query(probes, counts)
    t = true.loc[probes].to_numpy()
    assert (est >= t).all()
    # e/width·N holds per query with prob 1-e^-depth (≈98% at d=4), so
    # assert the 90th percentile over the probe set, not the max
    bound = np.e / 4096 * len(vals)
    assert np.quantile(est - t, 0.9) <= bound


def test_merge_equals_single_pass():
    rng = np.random.default_rng(3)
    vals = pd.Series(rng.integers(0, 500, 20_000))
    one = cms.update_counts(vals, depth=4, width=1024)
    acc = cms.new_counts(4, 1024)
    for chunk in np.array_split(vals.to_numpy(), 7):
        acc = cms.merge_counts(
            acc, cms.update_counts(pd.Series(chunk), depth=4, width=1024))
    np.testing.assert_array_equal(one, acc)


def test_low_cardinality_exact():
    vals = pd.Series(["a", "b", "c", "a", "a", "b"] * 100)
    counts = cms.update_counts(vals, depth=4, width=4096)
    est = cms.point_query(pd.Series(["a", "b", "c"]), counts)
    np.testing.assert_array_equal(est, [300, 200, 100])


def test_distributed_approx_frequencies(ray_session):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.relational import (
        approx_frequencies,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"v": rng.choice(list("abcdef"), size=30_000,
                                       p=[.4, .3, .1, .1, .05, .05])})
    got = approx_frequencies(ray.data.from_pandas(df), "v",
                             list("abcdef")).to_pandas()
    true = df["v"].value_counts()
    for _, row in got.iterrows():
        assert row["est"] == true[row["value"]]
