"""Embedding protocol + deterministic hash-projection test double.

The reference embeds with ``SentenceTransformer('intfloat/e5-base-v2')``
(/root/reference/graphrag/utils/common.py:50-98): 768-d, L2-normalized,
with E5 prefix rules. Model weights can't ship with the engine, so the
*contract* (dim, unit norm, prefix semantics, zero-vector-on-empty) is held
by a deterministic feature-hashing embedder; a real sentence-transformers
actor is a drop-in behind the same protocol (SURVEY.md §2.10, §7.5 item 2).

Divergence note: the reference's E5 prefix decision is batch-dependent —
``any('query:' in t ...)`` over the whole ``encode`` batch
(utils/common.py:76-82) means one text containing "query:" suppresses the
"passage: " prefix for every other text in that batch. Under Ray Data the
batching is an execution detail, so the engine applies the rule PER TEXT,
making output invariant to re-batching (recorded divergence).
"""

from __future__ import annotations

import hashlib

import numpy as np


def apply_e5_prefix(text: str, model_name: str, prefix: str | None = None) -> str:
    """Prefix rules of utils/common.py:73-82, per-text (see module note).

    Explicit ``prefix`` wins (space-joined, matching ``f"{prefix} {t}"``);
    else e5-family models get ``"passage: "`` unless the text already
    mentions ``query:`` / ``passage:`` (case-insensitive containment, as in
    the reference).
    """
    if prefix:
        return f"{prefix} {text}"
    if "e5" in model_name.lower():
        low = text.lower()
        if "query:" in low or "passage:" in low:
            return text
        return f"passage: {text}"
    return text


class HashingEmbedder:
    """Deterministic unit-norm feature-hashing embedder.

    token → blake2b-64 → (bucket, sign); accumulate token counts into a
    ``dim``-vector; L2-normalize. Empty/whitespace text → zero vector (the
    reference's error fallback, utils/common.py:92-98). A per-instance
    token cache makes repeated vocab cheap (built once per actor).
    """

    def __init__(self, dim: int = 768, model_name: str = "hash-e5-double"):
        self.dim = dim
        self.model_name = model_name
        self._cache: dict[str, tuple[int, float]] = {}

    def _slot(self, token: str) -> tuple[int, float]:
        hit = self._cache.get(token)
        if hit is None:
            h = int.from_bytes(
                hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big"
            )
            hit = (h % self.dim, 1.0 if (h >> 63) & 1 else -1.0)
            if len(self._cache) < 1_000_000:
                self._cache[token] = hit
        return hit

    def encode(
        self, texts: list[str], prefix: str | None = None, normalize: bool = True
    ) -> np.ndarray:
        """Vectorized: tokens factorize to a per-batch vocabulary (one
        blake2b per UNIQUE token, cached across batches), occurrences
        accumulate via one bincount. Bit-identical to the per-token
        reference loop: ±1 sums are exact integers ≪ 2^24 in float32,
        and the norm is taken as a float32 sqrt of that exact sum of
        squares — the same value the scalar path produced."""
        import pandas as pd

        n = len(texts)
        tok_lists = [
            apply_e5_prefix(t, self.model_name, prefix).split() for t in texts
        ]
        lengths = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=n
        )
        if n == 0 or int(lengths.sum()) == 0:
            return np.zeros((n, self.dim), dtype=np.float32)
        flat = np.asarray(
            [tok for toks in tok_lists for tok in toks], dtype=object
        )
        codes, uniques = pd.factorize(flat)
        n_u = len(uniques)
        slots = np.empty(n_u, dtype=np.int64)
        signs = np.empty(n_u, dtype=np.float64)
        for u in range(n_u):
            j, s = self._slot(uniques[u])
            slots[u] = j
            signs[u] = s
        rows = np.repeat(np.arange(n, dtype=np.int64), lengths)
        idx = rows * self.dim + slots[codes]
        sums = np.bincount(idx, weights=signs[codes],
                           minlength=n * self.dim).reshape(n, self.dim)
        out = sums.astype(np.float32)
        if normalize:
            sumsq = (sums * sums).sum(axis=1)  # exact in float64
            nrm = np.sqrt(sumsq.astype(np.float32))
            nz = nrm > 0
            out[nz] /= nrm[nz][:, None]
        return out


def get_embedder(model_name: str, dim: int):
    """Embedder factory (the reference's process-global model cache,
    utils/common.py:20-48, becomes per-actor construction). Unknown /
    unavailable real models fall back to the deterministic double."""
    if model_name.startswith("hash-"):
        return HashingEmbedder(dim=dim, model_name=model_name)
    try:  # pragma: no cover - heavyweight optional dependency
        from sentence_transformers import SentenceTransformer  # type: ignore

        class _STEmbedder:
            def __init__(self) -> None:
                self.model = SentenceTransformer(model_name)
                self.model_name = model_name
                self.dim = dim

            def encode(self, texts, prefix=None, normalize=True):
                texts = [apply_e5_prefix(t, model_name, prefix) for t in texts]
                try:
                    return self.model.encode(texts, normalize_embeddings=normalize)
                except Exception:
                    # reference failure policy: zero vectors, keep going
                    # (utils/common.py:92-98)
                    return np.zeros((len(texts), dim), dtype=np.float32)

        return _STEmbedder()
    except Exception:
        return HashingEmbedder(dim=dim, model_name=f"hash-{model_name}")
