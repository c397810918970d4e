"""Perceptual dHash: invariance to small perturbations, sensitivity to
different content, and the distributed near-dup pair pipeline over real
PNG payloads (vendored codec — no PIL)."""

import numpy as np
import pyarrow as pa
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.media import (
    dhash64,
    encode_png,
    gray2d,
)


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_dhash_deterministic_and_64bit():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    h1, h2 = dhash64(img), dhash64(img)
    assert h1 == h2
    assert 0 <= h1 < 2**64


def test_dhash_noise_invariance_and_distinct_content():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    noisy = base.copy()
    mask = rng.random((48, 64)) < 0.01
    noisy[mask] = rng.integers(0, 256, int(mask.sum()), dtype=np.uint8)
    assert _hamming(dhash64(base), dhash64(noisy)) <= 6
    other = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    assert _hamming(dhash64(base), dhash64(other)) > 12


def test_dhash_channel_and_shape_handling():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    assert dhash64(gray) == dhash64(rgb)  # channel mean of equal planes
    tiny = rng.integers(0, 256, (3, 4), dtype=np.uint8)
    assert 0 <= dhash64(tiny) < 2**64  # upscales, no crash
    flat = rng.integers(0, 256, 100, dtype=np.uint8)
    assert 0 <= dhash64(flat) < 2**64  # 1-D payload tiles to square
    assert gray2d(tiny).shape[0] >= 8 and gray2d(tiny).shape[1] >= 9


def test_phash_pipeline_finds_planted_dups(ray_session):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.dedup import (
        hamming_pairs,
    )
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        image_phash,
    )

    n_base, n_dup = 30, 10
    rows = []
    for i in range(n_base):
        rng = np.random.default_rng(i)
        img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        rows.append({"media_id": f"img-{i:07d}", "kind": "image",
                     "payload": encode_png(img), "mime": "image/png",
                     "source_url": f"u{i}"})
    for i in range(n_dup):  # noisy copy of base i, id 1000+i
        rng = np.random.default_rng(i)
        img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        noise = np.random.default_rng(5000 + i)
        mask = noise.random((48, 64)) < 0.01
        img[mask] = noise.integers(0, 256, int(mask.sum()), dtype=np.uint8)
        rows.append({"media_id": f"img-{1000 + i:07d}", "kind": "image",
                     "payload": encode_png(img), "mime": "image/png",
                     "source_url": f"d{i}"})
    media = ray.data.from_arrow(pa.Table.from_pylist(rows,
                                                     schema=MEDIA_SCHEMA))
    hashes = image_phash(media).map_batches(
        lambda b: pa.table({
            "media_num": pa.array(
                [int(m[4:]) for m in b.column("media_id").to_pylist()],
                pa.int64()),
            "phash": b.column("phash"),
        }),
        batch_format="pyarrow",
    )
    pairs = hamming_pairs(hashes, max_hamming=6, id_col="media_num",
                          hash_col="phash").to_pandas()
    got = {tuple(sorted(p)) for p in
           zip(pairs["doc_a"], pairs["doc_b"])}
    expected = {(i, 1000 + i) for i in range(n_dup)}
    missed = expected - got
    assert len(missed) <= 1, f"missed planted dups: {missed}"
    false_pos = got - expected
    assert not false_pos, f"false positives: {false_pos}"


def test_hamming_pairs_recall_guarantee(ray_session):
    """Pigeonhole: any pair within hamming ≤3 of a 64-bit hash shares
    at least one exact 16-bit band, so (uncapped) recall is total."""
    import pandas as pd
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.dedup import (
        hamming_pairs,
    )

    rng = np.random.default_rng(31)
    bases = rng.integers(0, 2**63, 40, dtype=np.uint64)
    rows = []
    for i, b in enumerate(bases):
        rows.append((2 * i, np.int64(b.astype(np.int64))))
        flip = np.uint64(0)
        for bit in rng.choice(64, rng.integers(1, 4), replace=False):
            flip |= np.uint64(1) << np.uint64(bit)
        rows.append((2 * i + 1, np.int64((b ^ flip).astype(np.int64))))
    df = pd.DataFrame(rows, columns=["doc_id", "h"])
    pairs = hamming_pairs(
        ray.data.from_pandas(df), max_hamming=3, id_col="doc_id",
        hash_col="h").to_pandas()
    got = {tuple(sorted(p)) for p in zip(pairs["doc_a"], pairs["doc_b"])}
    expected = {(2 * i, 2 * i + 1) for i in range(40)}
    assert expected <= got  # total recall for planted ≤3-bit flips
