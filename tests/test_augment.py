"""AugmentImage — deterministic augmentation semantics, PNG roundtrip,
partition independence."""

import numpy as np
import pyarrow as pa
import zlib

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.media import (
    decode_png,
    encode_png,
)
from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    AugmentImage,
    augment_images,
)


def _img_row(mid: str, arr: np.ndarray):
    return {
        "media_id": mid, "kind": "image",
        "payload": encode_png(arr), "mime": "image/png",
        "source_url": f"https://fixture.test/{mid}",
    }


def _tbl(rows):
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _ref(mid: str, arr: np.ndarray, margin=8):
    h = zlib.crc32(mid.encode())
    if h & 1:
        arr = arr[:, ::-1]
    rot = (h >> 1) & 3
    if rot:
        arr = np.rot90(arr, rot)
    if margin and arr.shape[0] > margin and arr.shape[1] > margin:
        dy = (h >> 3) % (margin + 1)
        dx = (h >> 7) % (margin + 1)
        arr = arr[dy:arr.shape[0] - (margin - dy),
                  dx:arr.shape[1] - (margin - dx)]
    return arr


def test_matches_reference_pixels():
    rng = np.random.default_rng(5)
    rows, refs = [], {}
    for i in range(12):
        arr = rng.integers(0, 256, (40 + i, 50), dtype=np.uint8)
        mid = f"img-{i:03d}"
        rows.append(_img_row(mid, arr))
        refs[mid] = _ref(mid, arr)
    out = AugmentImage()(_tbl(rows))
    for mid, payload in zip(out.column("media_id").to_pylist(),
                            out.column("payload").to_pylist()):
        _w, _h, got = decode_png(payload)
        np.testing.assert_array_equal(got, refs[mid])


def test_deterministic_bytes():
    arr = np.arange(0, 2500, dtype=np.uint8).reshape(50, 50) % 256
    t = _tbl([_img_row("same-id", arr)])
    a = AugmentImage()(t).column("payload").to_pylist()[0]
    b = AugmentImage()(t).column("payload").to_pylist()[0]
    assert a == b


def test_small_image_skips_crop():
    arr = np.ones((6, 6), dtype=np.uint8)
    out = AugmentImage(crop_margin=8)(_tbl([_img_row("tiny", arr)]))
    assert out.column("aug").to_pylist()[0].endswith("c0,0")
    # 6x6 stays 6x6 (possibly transposed by rotation)
    assert {out.column("width").to_pylist()[0],
            out.column("height").to_pylist()[0]} == {6}


def test_crop_reduces_by_margin():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    out = AugmentImage(crop_margin=8)(_tbl([_img_row("big", arr)]))
    assert out.column("width").to_pylist()[0] == 56
    assert out.column("height").to_pylist()[0] == 56


def test_actor_pool_over_dataset(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    rows = [_img_row(f"d{i:03d}",
                     rng.integers(0, 256, (32, 48), dtype=np.uint8))
            for i in range(20)]
    media = ray.data.from_arrow(_tbl(rows)).repartition(3)
    out = augment_images(media).to_pandas()
    assert len(out) == 20
    assert (out["n_bytes"] > 0).all()
