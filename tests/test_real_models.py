"""Opt-in REAL-WEIGHTS smoke path (VERDICT r3 item 6).

Run with ``GRAFT_REAL_MODELS=1 python -m pytest tests/test_real_models.py``
on a machine with network/weights (sentence-transformers e5-base-v2 +
the T5/PEFT triplet adapter, the reference's production pair —
/root/reference/graphrag/utils/common.py:50-98, core/triplets.py:96-123).
Offline/sandbox runs skip cleanly: the hermetic doubles (hash embedder,
grammar triplet model) carry the P/R contract in the normal suite.
"""

from __future__ import annotations

import os

import pytest

_ENABLED = os.environ.get("GRAFT_REAL_MODELS") == "1"


def _deps_available() -> bool:
    try:  # pragma: no cover - heavyweight optional deps
        import sentence_transformers  # noqa: F401
        import transformers  # noqa: F401

        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not (_ENABLED and _deps_available()),
    reason="real-model smoke path needs GRAFT_REAL_MODELS=1 plus "
    "sentence-transformers/transformers (weights + network); the "
    "hermetic doubles cover these semantics in the normal suite",
)

_FIXTURES = ["/root/reference/escaflowne.txt",
             "/root/reference/lensman.txt",
             "/root/reference/robotech.txt"]


@pytest.fixture(scope="module")
def fixture_pages():
    import ray.data

    rows = []
    for path in _FIXTURES:
        if not os.path.exists(path):  # pragma: no cover
            pytest.skip(f"reference fixture {path} missing")
        with open(path, encoding="utf-8") as f:
            rows.append({"url": f"file://{os.path.basename(path)}",
                         "html": f.read()})
    return lambda: ray.data.from_items(rows)


def test_real_weights_end_to_end(ray_session, fixture_pages, tmp_path):
    """Full ingest through REAL models; triples scored against the
    hermetic grammar double's output on the same fixtures (the golden
    set the normal suite pins). Weak-form assertion by design: real
    model output is not bit-stable across weight revisions, so the gate
    is structural (non-empty, sane schema) plus a recorded P/R."""
    from nlp_graphrag_with_qdrant_and_neo4j_ray.config import PipelineConfig
    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.kg import build_kg

    real_cfg = PipelineConfig(
        embedding_model="intfloat/e5-base-v2",
        triplet_model="bew/t5_sentence_to_triplet_xl",
    )
    golden_cfg = PipelineConfig()  # hermetic doubles

    # the T5 path must be REAL here, not the marker-echo fallback
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.tripletstage import _model

    model = _model(real_cfg.triplet_model)
    assert model.name.startswith("t5:"), (
        f"expected a real T5 adapter, got fallback {model.name!r} — "
        "weights unavailable?")

    real = build_kg(fixture_pages, str(tmp_path / "real"), real_cfg,
                    resume=False, lineage=False)
    golden = build_kg(fixture_pages, str(tmp_path / "golden"), golden_cfg,
                      resume=False, lineage=False)

    real_triples = {(r["subj"].lower(), r["obj"].lower())
                    for r in real["triples"].take_all()}
    golden_triples = {(r["subj"].lower(), r["obj"].lower())
                      for r in golden["triples"].take_all()}
    assert real_triples, "real model extracted zero triples"

    inter = len(real_triples & golden_triples)
    precision = inter / len(real_triples)
    recall = inter / max(len(golden_triples), 1)
    # record for STATUS.md; structural floor only (entity overlap with
    # the grammar double is expected to be partial, not identical)
    print(f"real-vs-golden subj/obj pairs: P={precision:.3f} "
          f"R={recall:.3f} real={len(real_triples)} "
          f"golden={len(golden_triples)}")
    assert len(real_triples) >= 3

    # embeddings: unit-norm rows of the configured width
    import numpy as np

    vec = real["chunk_vectors"].take(1)[0]["embedding"]
    assert len(vec) == real_cfg.vector_size
    assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-3
