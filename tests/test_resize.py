"""Exact area-average resize: block-mean math vs a manual reduceat
reference, channel preservation, PNG roundtrip, and the actor stage."""

import numpy as np
import pyarrow as pa

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.media import (
    area_resize,
    decode_png,
    encode_png,
)


def test_area_resize_matches_manual_block_means():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    got = area_resize(img, 8, 12)  # 4x4 exact blocks
    manual = img.astype(np.float64).reshape(8, 4, 12, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(got, manual, atol=1e-9)


def test_area_resize_preserves_channels_and_upscales():
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    out = area_resize(rgb, 10, 10)
    assert out.shape == (10, 10, 3)
    # constant image stays constant through up- AND downscale
    const = np.full((3, 5), 77, np.uint8)
    np.testing.assert_allclose(area_resize(const, 16, 16), 77.0)


def test_resize_stage_roundtrips_png(ray_session):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rng = np.random.default_rng(7)
    rows = []
    imgs = {}
    for i in range(6):
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        mid = f"img-{i:07d}"
        imgs[mid] = img
        rows.append({"media_id": mid, "kind": "image",
                     "payload": encode_png(img), "mime": "image/png",
                     "source_url": f"u{i}"})
    media = ray.data.from_arrow(pa.Table.from_pylist(rows,
                                                     schema=MEDIA_SCHEMA))
    out = resize_images(media, out_h=8, out_w=8).take_all()
    assert len(out) == 6
    for r in out:
        assert (r["width"], r["height"]) == (8, 8)
        w, h, arr = decode_png(r["payload"])
        assert (w, h) == (8, 8)
        src = imgs[r["media_id"]]
        expected = np.clip(np.floor(
            src.astype(np.float64).reshape(8, 4, 8, 4).mean(axis=(1, 3))
            + 0.5), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(arr, expected)
