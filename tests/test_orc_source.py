"""ORC source: multi-stripe streaming read, column projection, writer
atomicity — the format seam Ray Data doesn't ship."""

import os

import pyarrow as pa
import pyarrow.orc as orc


def _write(tmp_path, n=2000, stripes=True):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.orc import (
        write_orc_file,
    )

    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "txt": pa.array([f"row {i}" for i in range(n)], pa.string()),
        "val": pa.array([i * 0.5 for i in range(n)], pa.float64()),
    })
    p = os.path.join(tmp_path, "data.orc")
    # small stripe size forces multiple stripes
    write_orc_file(t, p, stripe_size=(4096 if stripes else 64 << 20))
    return t, p


def test_roundtrip_multi_stripe(ray_session, tmp_path):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.orc import read_orc

    t, p = _write(str(tmp_path))
    assert orc.ORCFile(p).nstripes > 1   # the streaming claim is real
    got = read_orc([p]).to_pandas().sort_values("id").reset_index(
        drop=True)
    assert len(got) == t.num_rows
    assert got["txt"].tolist() == t.column("txt").to_pylist()
    assert got["val"].tolist() == t.column("val").to_pylist()


def test_column_projection(ray_session, tmp_path):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.orc import read_orc

    _, p = _write(str(tmp_path), n=100)
    got = read_orc([p], columns=["id"]).to_pandas()
    assert list(got.columns) == ["id"]
    assert sorted(got["id"].tolist()) == list(range(100))


def test_writer_atomic_no_tmp_left(ray_session, tmp_path):
    _, p = _write(str(tmp_path), n=10)
    assert os.path.exists(p)
    assert not os.path.exists(p + ".tmp")
