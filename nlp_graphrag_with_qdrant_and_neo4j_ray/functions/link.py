"""Entity canonicalization semantics (deterministic replacement for the
reference's order-dependent similar-node merge).

The reference resolves each triplet entity against the LIVE Neo4j Entity
table — exact lowercase-name match ∪ vector top-10 cosine ≥ 0.96 — and
mutates the table as it reads (core/triplets.py:252-343), so its entity
graph depends on document processing order. Not reproducible under
parallelism (SURVEY.md §7.5 item 3). The engine replaces it with:

1. a pure normalization key (lowercase — the reference's ``toLower`` —
   plus whitespace collapse, edge punctuation strip, leading-article and
   corporate-suffix strip), and
2. a deterministic embedding-similarity merge over the DISTINCT name set
   (threshold 0.96, mirroring the reference's threshold), resolved with
   lexicographically-smallest-key union-find so output is run-order
   independent.
"""

from __future__ import annotations

import re

import numpy as np

_ARTICLES = ("the ", "a ", "an ")
_SUFFIXES = ("inc", "ltd", "llc", "corp")
_WS = re.compile(r"\s+")
_EDGE_PUNCT = re.compile(r"^[^\w]+|[^\w]+$")


def canonical_key(name: str) -> str:
    """Deterministic canonical key for an entity surface form.

    Idempotent by construction (hypothesis found the one-shot article
    strip wasn't: 'the a b' → 'a b' → 'b'): normalization runs to a
    fixpoint, bounded by the token count."""
    k = _WS.sub(" ", name.lower()).strip()
    while True:
        prev = k
        for art in _ARTICLES:
            if k.startswith(art) and len(k) > len(art):
                k = k[len(art) :]
                break
        toks = [t for t in (_EDGE_PUNCT.sub("", t) for t in k.split(" ")) if t]
        while len(toks) > 1 and toks[-1] in _SUFFIXES:
            toks.pop()
        k = " ".join(toks)
        if k == prev:
            return k


def entity_id_for(key: str) -> str:
    return f"e:{key}"


def merge_similar_keys(
    keys: list[str],
    embeddings: np.ndarray,
    threshold: float = 0.96,
    max_bucket: int = 512,
) -> dict[str, str]:
    """Deterministic ≥threshold cosine merge over distinct canonical keys.

    Keys are bucketed by first token (blocking); within a bucket every
    pair (in sorted order) with cosine ≥ threshold is unioned; each
    group's representative is its lexicographically smallest key. Returns
    {key → representative} for merged keys only. Buckets larger than
    ``max_bucket`` are skipped (scale guard — a head token like "united"
    cannot trigger quadratic work).
    """
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    parent: dict[str, str] = {}

    def find(k: str) -> str:
        root = k
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(k, k) != k:
            parent[k], k = root, parent[k]
        return root

    buckets: dict[str, list[int]] = {}
    for i in order:
        first = keys[i].split(" ", 1)[0]
        buckets.setdefault(first, []).append(i)

    for _, idxs in sorted(buckets.items()):
        if len(idxs) < 2 or len(idxs) > max_bucket:
            continue
        sub = embeddings[idxs]  # unit-norm rows → dot = cosine
        sims = sub @ sub.T
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                if sims[a, b] >= threshold:
                    ka, kb = keys[idxs[a]], keys[idxs[b]]
                    ra, rb = find(ka), find(kb)
                    if ra != rb:
                        lo, hi = sorted((ra, rb))
                        parent[hi] = lo
    return {k: find(k) for k in parent}


def build_alias_dict(
    names: list[str],
    embedder,
    threshold: float = 0.96,
) -> dict[str, tuple[str, str]]:
    """{surface name → (entity_id, canonical key)} for a distinct-name set.

    Exact-key merge via :func:`canonical_key`, then embedding-similarity
    merge of the keys themselves (the reference's ≥0.96 rule, J1/T3).
    The result is a small read-only dict for ``ray.put`` broadcast.
    """
    names = sorted(set(names))
    keys = sorted({canonical_key(n) for n in names})
    # embed ONLY keys that share a blocking bucket with another key —
    # singleton buckets can never merge, and embedding every key would
    # make the (driver-side) dictionary build linear in vocabulary size
    buckets: dict[str, list[str]] = {}
    for k in keys:
        buckets.setdefault(k.split(" ", 1)[0], []).append(k)
    candidates = sorted(
        k for b in buckets.values() if len(b) > 1 for k in b
    )
    remap: dict[str, str] = {}
    if candidates:
        emb = embedder.encode(candidates, prefix="passage:")
        remap = merge_similar_keys(candidates, np.asarray(emb), threshold)
    out: dict[str, tuple[str, str]] = {}
    for n in names:
        k = canonical_key(n)
        k = remap.get(k, k)
        out[n] = (entity_id_for(k), k)
    return out
