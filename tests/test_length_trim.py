"""Percentile length trim (clean.length_trim): exact quantile_cont
thresholds from the bounded count histogram, numpy-pinned, and
partition-independent."""

import numpy as np
import pytest


def _trim_ids(ray, counts, lo, hi, parallelism):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.clean import (
        length_trim,
    )

    ds = ray.data.from_items(
        [{"doc_id": i, "ws_tokens": int(c)} for i, c in enumerate(counts)],
        override_num_blocks=parallelism,
    )
    out = length_trim(ds, lo=lo, hi=hi).to_pandas()
    return sorted(out["doc_id"].tolist()), out


@pytest.mark.parametrize("lo,hi", [(0.05, 0.95), (0.25, 0.75), (0.0, 1.0)])
def test_matches_numpy_quantile_cont(ray_session, lo, hi):
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 300, size=400)
    lo_v = np.quantile(counts, lo, method="linear")
    hi_v = np.quantile(counts, hi, method="linear")
    want = sorted(int(i) for i, c in enumerate(counts)
                  if lo_v <= c <= hi_v)
    got, out = _trim_ids(ray_session, counts, lo, hi, parallelism=8)
    assert got == want
    assert list(out.columns) == ["doc_id", "ws_tokens"]


def test_partition_independent(ray_session):
    rng = np.random.default_rng(11)
    counts = rng.integers(0, 50, size=200)  # heavy duplicate mass
    a, _ = _trim_ids(ray_session, counts, 0.1, 0.9, parallelism=1)
    b, _ = _trim_ids(ray_session, counts, 0.1, 0.9, parallelism=13)
    assert a == b and len(a) > 0


def test_keeps_band_inclusive(ray_session):
    # all-equal counts: thresholds collapse to the single value and
    # every row survives at any band
    got, _ = _trim_ids(ray_session, [5] * 20, 0.05, 0.95, parallelism=4)
    assert got == list(range(20))
