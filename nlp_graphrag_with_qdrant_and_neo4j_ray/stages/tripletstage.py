"""chunks → triples: sentence fan-out + triplet model actor pool.

The reference loops one sentence per ``model.generate`` call
(core/triplets.py:421-425, 146-147); here all sentences of a batch go
through ``TripletModel.extract`` in one call. The hermetic default model
is the deterministic grammar extractor; a T5/PEFT actor is a drop-in
behind the same protocol (``extract(list[str]) -> list[list[(s,p,o)]]``,
SURVEY.md T2). Output subj/pred/obj are lowercased — the reference's
``toLower`` entity normalization (core/triplets.py:355-363) applied at
the table boundary so every downstream key is canonical-case.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.tokenize import sent_tokenize
from ..functions.triples import GrammarTripletModel
from ..schemas import TRIPLES
from ..state.lineage import LineageRecorder, first_fragment


# process-global model cache for stateless-task mode
_MODELS: dict = {}


def _model(name: str):
    if name not in _MODELS:
        from ..functions.triples import MarkerEchoTripletModel, T5TripletModel

        if name == "marker-echo":
            _MODELS[name] = MarkerEchoTripletModel()
        elif name == "grammar":
            _MODELS[name] = GrammarTripletModel()
        else:
            # any other name = a HF PEFT adapter id, loaded T5-style like
            # the reference (core/triplets.py:28-132). Same pattern as the
            # embedder's sentence-transformers drop-in (functions/embed.py):
            # missing transformers/peft → deterministic fallback through
            # the SAME decode→parse path (marker-echo), never a crash.
            try:
                _MODELS[name] = T5TripletModel(adapter_name=name)
            except Exception:
                _MODELS[name] = MarkerEchoTripletModel()
    return _MODELS[name]


def _extract_batch(batch: pa.Table, cfg: PipelineConfig,
                   lineage: LineageRecorder | None) -> pa.Table:
    t0 = time.perf_counter()
    frag = first_fragment(batch, "chunk_id")
    model = _model(cfg.triplet_model)
    chunk_ids = batch.column("chunk_id").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()

    # flatten: one sentence list across the whole batch → one model call
    sentences: list[str] = []
    owners: list[tuple[int, int]] = []  # (row_index, sent_index)
    for ri, text in enumerate(texts):
        for si, sent in enumerate(sent_tokenize(text)):
            sentences.append(sent)
            owners.append((ri, si))

    per_sentence = model.extract(sentences)

    cid, did, sidx, subj, pred, obj = [], [], [], [], [], []
    for (ri, si), triples in zip(owners, per_sentence):
        for s, p, o in triples:
            cid.append(chunk_ids[ri])
            did.append(doc_ids[ri])
            sidx.append(si)
            subj.append(s.lower())
            pred.append(p.lower())
            obj.append(o.lower())
    out = pa.table(
        {
            "chunk_id": pa.array(cid, pa.string()),
            "doc_id": pa.array(did, pa.string()),
            "sent_index": pa.array(sidx, pa.int32()),
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
        },
        schema=TRIPLES,
    )
    if lineage is not None:
        lineage.record(
            frag,
            batch.num_rows,
            out.num_rows,
            out.num_rows,
            (time.perf_counter() - t0) * 1e3,
        )
    return out


class ExtractTriples:
    """Actor-pool stage (model state loaded once per actor) — for real
    sequence-to-sequence triplet models (GPU placement, weight load).
    ``quarantine`` enables row-level skip-and-record on poisoned input
    (reference skip-and-continue, cli/main.py:150-154)."""

    def __init__(self, cfg: PipelineConfig, lineage: LineageRecorder | None = None,
                 quarantine=None):
        self.cfg = cfg
        self.lineage = lineage
        _model(cfg.triplet_model)  # eager load, once per actor
        fn = lambda b: _extract_batch(b, cfg, lineage)  # noqa: E731
        if quarantine is not None:
            from ..state.quarantine import quarantined

            fn = quarantined(fn, "chunk_id", TRIPLES, quarantine)
        self._fn = fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._fn(batch)


def make_triplet_fn(cfg: PipelineConfig, lineage: LineageRecorder | None = None):
    """Stateless-task variant for the hermetic grammar model (see
    stages/embedding.py on actor cold-start cost)."""

    def extract(batch: pa.Table) -> pa.Table:
        return _extract_batch(batch, cfg, lineage)

    return extract


def wants_actor_pool(cfg: PipelineConfig) -> bool:
    # hermetic models are stateless-cheap → task mode
    return cfg.triplet_model not in ("grammar", "marker-echo")

