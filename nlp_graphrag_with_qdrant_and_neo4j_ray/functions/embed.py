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
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            text = apply_e5_prefix(text, self.model_name, prefix)
            toks = text.split()
            if not toks:
                continue
            row = out[i]
            for tok in toks:
                j, sign = self._slot(tok)
                row[j] += sign
            if normalize:
                nrm = float(np.sqrt(np.dot(row, row)))
                if nrm > 0:
                    row /= nrm
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
