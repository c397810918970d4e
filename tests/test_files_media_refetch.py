import pyarrow as pa
import pytest


def test_read_files_as_pages(ray_session, tmp_path):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.files import read_files_as_pages

    (tmp_path / "alpha.txt").write_text("Alice founded Acme. Bob leads Acme.")
    (tmp_path / "beta.html").write_bytes(
        b"<html><body><p>Hello paragraph.</p></body></html>"
    )
    (tmp_path / "cafe.txt").write_bytes("Café latin-1 ".encode("latin-1"))

    pages = {r["url"].rsplit("/", 1)[-1]: r
             for r in read_files_as_pages(str(tmp_path)).take_all()}
    assert set(pages) == {"alpha.txt", "beta.html", "cafe.txt"}

    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.html import extract_text

    # .txt: text carried through, html wrapper reproduces it byte-identically
    assert pages["alpha.txt"]["text"] == "Alice founded Acme. Bob leads Acme."
    assert extract_text(pages["alpha.txt"]["html"]) == pages["alpha.txt"]["text"]
    # .html: raw payload, extract stage pulls the paragraph
    assert extract_text(pages["beta.html"]["html"]) == "Hello paragraph."
    # latin-1 fallback (reference cli/main.py:139-143)
    assert "Café" in pages["cafe.txt"]["text"]


def test_pdf_stub_raises(ray_session, tmp_path):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.files import read_files_as_pages

    (tmp_path / "doc.pdf").write_bytes(b"%PDF-1.4 fake")
    with pytest.raises(Exception) as ei:
        read_files_as_pages(str(tmp_path)).take_all()
    assert "PyMuPDF" in str(ei.value)


def test_decode_audio(ray_session):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
        decode_audio,
        synth_media_dataset,
    )

    out = decode_audio(synth_media_dataset(16, "audio"), num_frames=8).take_all()
    assert len(out) == 16
    for r in out[:3]:
        assert r["sample_rate"] > 0 and r["n_samples"] > 0
        assert len(r["frames"]) == 8
        assert all(-1.0 <= v <= 1.0 for v in r["frames"])


def test_sample_video_frames(ray_session):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.multimodal import (
        SampleVideoFrames,
        sample_video_frames,
        synth_media_dataset,
    )

    out = sample_video_frames(synth_media_dataset(12, "video"),
                              num_frames=4, feature_dim=8).take_all()
    assert len(out) == 12
    for r in out[:3]:
        assert r["width"] >= 16 and r["height"] >= 16
        assert r["n_frames_total"] >= 1
        assert len(r["frame_features"]) == 4 * 8  # frames × feature_dim
    # alien payload without a real decoder → honest NotImplementedError
    import pytest as _pytest

    stage = SampleVideoFrames()
    if stage._av is None:
        with _pytest.raises(NotImplementedError):
            stage._sample(b"\x00\x01realvideobytes")


def test_resolve_chunk_texts_refetch(ray_session):
    import ray.data

    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.query import (
        resolve_chunk_texts,
    )

    long_text = "x" * 1500
    chunks = ray.data.from_items(
        [
            {"chunk_id": "a_chunk0", "text": long_text},
            {"chunk_id": "b_chunk0", "text": "short full text"},
        ]
    )
    hits = [
        {"chunk_id": "a_chunk0", "payload_text": long_text[:1000], "score": 1.0},
        {"chunk_id": "b_chunk0", "payload_text": "short full text", "score": 0.5},
    ]
    out = resolve_chunk_texts(hits, chunks)
    assert out[0]["text"] == long_text          # truncated → refetched
    assert out[1]["text"] == "short full text"  # short → payload used


def test_edges_pred_embedding(ray_session, tmp_path):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.kg import build_kg
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.pages import pages_dataset

    out = build_kg(lambda: pages_dataset(30, "pe"), str(tmp_path / "kg"),
                   resume=False, lineage=False)
    rows = out["edges"].take(5)
    import numpy as np

    from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.embed import HashingEmbedder

    emb = HashingEmbedder(768, "hash-e5-double")
    for r in rows:
        v = np.asarray(r["pred_embedding"], dtype=np.float32)
        want = emb.encode([r["pred"]], prefix="passage:")[0]
        assert np.allclose(v, want, atol=1e-6)
