"""Vectorized hot-path stages must match their scalar reference loops
bit-for-bit (ngram explode: /root/reference/graphrag/core/nlp_graph.py:35-58
row semantics; embedder: the pre-vectorization per-token accumulation)."""

from __future__ import annotations

import random
import string

import numpy as np
import pyarrow as pa

from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.chunk import extract_ngrams
from nlp_graphrag_with_qdrant_and_neo4j_ray.functions.embed import (
    HashingEmbedder,
    apply_e5_prefix,
)
from nlp_graphrag_with_qdrant_and_neo4j_ray.schemas import TERMS
from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.ngram import ngram_table


def _scalar_ngram_table(chunk_ids, texts, remove_stopwords=True) -> pa.Table:
    cid, term, ttype, pos = [], [], [], []
    for chunk_id_, text in zip(chunk_ids, texts):
        uni, bi, tri = extract_ngrams(text, remove_stopwords)
        for type_name, grams in (("unigram", uni), ("bigram", bi), ("trigram", tri)):
            cid.extend([chunk_id_] * len(grams))
            term.extend(grams)
            ttype.extend([type_name] * len(grams))
            pos.extend(range(len(grams)))
    return pa.table(
        {
            "chunk_id": pa.array(cid, pa.string()),
            "term": pa.array(term, pa.string()),
            "term_type": pa.array(ttype, pa.string()),
            "position": pa.array(pos, pa.int32()),
        },
        schema=TERMS,
    )


def _random_text(rng: random.Random) -> str:
    words = []
    for _ in range(rng.randrange(0, 60)):
        kind = rng.random()
        if kind < 0.25:
            words.append(rng.choice(["the", "a", "of", "and", "in", "is"]))
        elif kind < 0.4:
            words.append(rng.choice(["Graph", "Ray", "data", "node", "edge"]))
        elif kind < 0.5:
            words.append(rng.choice(["naïve", "café", "Ünïcode", "ÅNGSTRÖM"]))
        elif kind < 0.6:
            words.append(rng.choice(["42", "3.14", "x-y", "a_b", "#tag", "!!"]))
        else:
            words.append(
                "".join(
                    rng.choice(string.ascii_letters + string.digits + ".,!?")
                    for _ in range(rng.randrange(1, 9))
                )
            )
        if rng.random() < 0.12:
            words.append(rng.choice([".", "?", "!"]))
    return " ".join(words)


def test_ngram_table_matches_scalar_loop():
    rng = random.Random(7)
    texts = [_random_text(rng) for _ in range(80)]
    texts += ["", "   ", "the of and", "one", "a b", "x y z w"]
    cids = [f"c{i}" for i in range(len(texts))]
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.ngram import decode_terms

    for remove_stop in (True, False):
        vec = ngram_table(cids, texts, remove_stop)
        # physical layout is dict-encoded (TERMS_DICT); values must be
        # byte-identical to the scalar loop after the per-block decode
        assert all(pa.types.is_dictionary(vec.schema.field(c).type)
                   for c in ("chunk_id", "term", "term_type"))
        vec = decode_terms(vec).cast(TERMS)
        ref = _scalar_ngram_table(cids, texts, remove_stop)
        assert vec.schema.equals(ref.schema)
        assert vec.equals(ref), "vectorized ngram explode diverged from scalar"


def _scalar_encode(emb: HashingEmbedder, texts, prefix=None, normalize=True):
    out = np.zeros((len(texts), emb.dim), dtype=np.float32)
    for i, text in enumerate(texts):
        text = apply_e5_prefix(text, emb.model_name, prefix)
        toks = text.split()
        if not toks:
            continue
        row = out[i]
        for tok in toks:
            j, sign = emb._slot(tok)
            row[j] += sign
        if normalize:
            nrm = float(np.sqrt(np.dot(row, row)))
            if nrm > 0:
                row /= nrm
    return out


def test_hashing_embedder_matches_scalar_loop():
    rng = random.Random(11)
    texts = [_random_text(rng) for _ in range(64)]
    texts += ["", "   ", "query: what is ray", "passage: already prefixed", "tok"]
    for dim in (32, 768):
        emb = HashingEmbedder(dim=dim)
        for prefix, normalize in ((None, True), (None, False), ("query:", True)):
            got = emb.encode(texts, prefix=prefix, normalize=normalize)
            want = _scalar_encode(
                HashingEmbedder(dim=dim), texts, prefix=prefix, normalize=normalize
            )
            assert got.dtype == np.float32
            np.testing.assert_array_equal(got, want)


def test_hashing_embedder_cache_and_empty():
    emb = HashingEmbedder(dim=16)
    assert emb.encode([]).shape == (0, 16)
    a = emb.encode(["hello world"])
    b = emb.encode(["hello world"])  # second call hits the token cache
    np.testing.assert_array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_partial_distinct_names_matches_scalar_fold():
    """stages/link.partial_distinct_names (pc.unique over subj+obj) must
    equal the scalar set-fold it replaced, on single- and multi-chunk
    batches (reference distinct-name semantics: core/triplets.py MERGE
    per distinct entity name)."""
    from nlp_graphrag_with_qdrant_and_neo4j_ray.stages.link import (
        partial_distinct_names,
    )

    rng = random.Random(7)
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=5)) for _ in range(40)]
    subj = [rng.choice(vocab) for _ in range(500)]
    obj = [rng.choice(vocab) for _ in range(500)]

    def scalar(subj_, obj_):
        return sorted(set(subj_) | set(obj_))

    # single-chunk
    t = pa.table({"subj": subj, "obj": obj})
    assert partial_distinct_names(t).column("name").to_pylist() == scalar(subj, obj)
    # multi-chunk (concat preserves chunking)
    t2 = pa.concat_tables(
        [pa.table({"subj": subj[:200], "obj": obj[:200]}),
         pa.table({"subj": subj[200:], "obj": obj[200:]})]
    )
    assert partial_distinct_names(t2).column("name").to_pylist() == scalar(subj, obj)
    # empty batch
    e = pa.table({"subj": pa.array([], pa.string()), "obj": pa.array([], pa.string())})
    out = partial_distinct_names(e)
    assert out.num_rows == 0 and out.schema.field("name").type == pa.string()
