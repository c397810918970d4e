"""fastText-style hashed-feature logistic regression
(pipelines/textstats.logreg_train_predict): distributed full-batch GD
must match a single-process numpy reference, separate a separable
corpus, and be partition-robust."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.textstats import (
    _hash_tokens_md5,
    logreg_train_predict,
)

DIM = 64


def _mk_docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.large_string()),
    })


def _is_train(i):
    return int(hashlib.md5(str(i).encode()).hexdigest()[-1], 16) < 8


def _reference(rows, pos_label, dim, iters, lr, l2):
    """Plain-numpy reimplementation of the same spec (hash, L1-norm,
    full-batch GD, md5-slot train split)."""
    X = np.zeros((len(rows), dim))
    y = np.zeros(len(rows))
    ids = np.array([r[0] for r in rows])
    for i, (_, lab, text) in enumerate(rows):
        toks = [t for t in text.split(" ") if t]
        y[i] = 1.0 if lab == pos_label else 0.0
        for t in toks:
            h = int.from_bytes(
                hashlib.md5(t.encode()).digest()[:8], "big") % dim
            X[i, h] += 1.0
        if toks:
            X[i] /= X[i].sum()
    train = np.array([_is_train(i) for i in ids])
    w = np.zeros(dim + 1)
    for _ in range(iters):
        z = X @ w[:dim] + w[dim]
        p = 1.0 / (1.0 + np.exp(-z))
        err = np.where(train, p - y, 0.0)
        g = np.zeros(dim + 1)
        g[:dim] = X.T @ err
        g[dim] = err.sum()
        g /= max(int(train.sum()), 1)
        g[:dim] += l2 * w[:dim]
        w = w - lr * g
    z = X @ w[:dim] + w[dim]
    p = 1.0 / (1.0 + np.exp(-z))
    return {int(i): float(pi) for i, pi in zip(ids[~train], p[~train])}


def _corpus():
    rows = []
    for i in range(48):
        lab = "en" if i % 2 == 0 else "de"
        text = ("good clean prose here" if lab == "en"
                else "schlecht unklar text hier")
        rows.append((i, lab, f"{text} filler{i % 3}"))
    # both classes must appear on both sides of the md5 split
    tr = [r for r in rows if _is_train(r[0])]
    te = [r for r in rows if not _is_train(r[0])]
    assert {r[1] for r in tr} == {"en", "de"}
    assert {r[1] for r in te} == {"en", "de"}
    return rows


def test_hash_is_stable_and_bounded():
    h = _hash_tokens_md5(["alpha", "beta", "alpha"], 16)
    assert h[0] == h[2]
    assert ((h >= 0) & (h < 16)).all()
    # pinned literal so any hashing change is loud
    assert _hash_tokens_md5(["alpha"], 1024)[0] == int.from_bytes(
        hashlib.md5(b"alpha").digest()[:8], "big") % 1024


def test_separable_corpus_classified_perfectly(ray_session):
    rows = _corpus()
    out = logreg_train_predict(
        ray_session.data.from_arrow(_mk_docs(rows)), "en",
        dim=DIM, iters=40, lr=2.0).take_all()
    assert len(out) == sum(1 for r in rows if not _is_train(r[0]))
    for r in out:
        assert r["pred_y"] == r["true_y"], r


def test_matches_numpy_reference(ray_session):
    rows = _corpus()
    want = _reference(rows, "en", DIM, iters=25, lr=1.5, l2=1e-4)
    out = logreg_train_predict(
        ray_session.data.from_arrow(_mk_docs(rows)), "en",
        dim=DIM, iters=25, lr=1.5, l2=1e-4).take_all()
    assert len(out) == len(want)
    for r in out:
        assert r["p"] == pytest.approx(round(want[r["doc_id"]], 6), abs=1e-9)


def test_partition_independent_predictions(ray_session):
    rows = _corpus()
    ds = ray_session.data.from_arrow(_mk_docs(rows))
    a = logreg_train_predict(ds, "en", dim=DIM, iters=15).take_all()
    b = logreg_train_predict(
        ds.repartition(7), "en", dim=DIM, iters=15).take_all()
    am = {r["doc_id"]: r for r in a}
    bm = {r["doc_id"]: r for r in b}
    assert set(am) == set(bm)
    for k in am:
        assert am[k]["pred_y"] == bm[k]["pred_y"]
        assert am[k]["p"] == pytest.approx(bm[k]["p"], abs=1e-6)


def test_empty_text_gets_bias_only_score(ray_session):
    rows = [(i, ("en" if i % 2 == 0 else "de"),
             ("" if i == 5 else ("good stuff" if i % 2 == 0 else "bad")))
            for i in range(12)]
    out = {r["doc_id"]: r for r in logreg_train_predict(
        ray_session.data.from_arrow(_mk_docs(rows)), "en",
        dim=DIM, iters=5).take_all()}
    assert set(out) == {i for i in range(12) if not _is_train(i)}
    assert all(0.0 <= r["p"] <= 1.0 for r in out.values())


def test_binary_presence_mode_recovers_planted_markers(ray_session):
    # a few marker tokens diluted in long docs: binary features make
    # the marker worth 1.0 instead of tf/len, so GD converges fast
    filler = " ".join(f"w{j % 17}" for j in range(60))
    rows = []
    for i in range(60):
        spam = i % 3 == 0
        text = filler + (" winfree prizeclaim" if spam else "")
        rows.append((i, "spam" if spam else "ham", text))
    out = logreg_train_predict(
        ray_session.data.from_arrow(_mk_docs(rows)), "spam",
        label_col="lang", dim=DIM, iters=20, lr=2.0,
        binary=True).take_all()
    assert len(out) == sum(1 for r in rows if not _is_train(r[0]))
    assert out and all(r["pred_y"] == r["true_y"] for r in out)
