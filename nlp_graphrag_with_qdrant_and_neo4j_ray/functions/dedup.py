"""Deduplication sketches: shingles, MinHash, SimHash, n-gram Jaccard.

Pure deterministic functions; the distributed pipelines around them live
in ``pipelines/dedup.py``. Techniques are the standard public ones:
MinHash resemblance sketches (Broder 1997, "On the resemblance and
containment of documents"), banded LSH (Leskovec/Rajaraman/Ullman,
*Mining of Massive Datasets* ch. 3), SimHash (Charikar STOC 2002) with
the 16-bit-band near-duplicate trick (Manku/Jain/Das Sarma, WWW 2007).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def _hash64(s: str, seed: int = 0) -> int:
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "big"))
    return int.from_bytes(h.digest(), "big")


def shingles(text: str, k: int = 5) -> set[int]:
    """Hashed k-token shingles of whitespace-lowercased text."""
    toks = text.lower().split()
    if not toks:
        return set()
    if len(toks) < k:
        return {_hash64(" ".join(toks))}
    return {_hash64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


class MinHasher:
    """num_perm-permutation MinHash over hashed shingles (a*x+b mod p)."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_set: set[int]) -> np.ndarray:
        if not shingle_set:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(shingle_set, dtype=np.uint64, count=len(shingle_set))
        # (a*x + b) mod p, per permutation; min over shingles
        vals = (np.outer(self.a, x) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)

    def bands(self, sig: np.ndarray, num_bands: int = 16) -> list[int]:
        """LSH band keys: hash of each band's rows."""
        rows = self.num_perm // num_bands
        out = []
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows]
            out.append(_hash64(band.tobytes().hex(), seed=b + 1))
        return out


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace-lowercased tokens."""
    toks = text.lower().split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _hash64(t)
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table (numpy<2 has
    no ``bitwise_count``)."""
    x = x.astype(np.uint64, copy=False)
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in (0, 16, 32, 48):
        out += _POP16[((x >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def group_salt(key) -> int:
    """Deterministic 64-bit salt from a bucket's group key (an int or
    string, or a tuple of them) — FNV-1a over the parts, no
    PYTHONHASHSEED dependence. String parts fold in their UTF-8
    bytes."""
    parts = key if isinstance(key, tuple) else (key,)
    s = 1469598103934665603
    for p in parts:
        if isinstance(p, str):
            for byte in p.encode("utf-8"):
                s = ((s ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        else:
            s = ((s ^ (int(p) & 0xFFFFFFFFFFFFFFFF)) * 1099511628211) \
                & 0xFFFFFFFFFFFFFFFF
    return s


def capped_subgroups(g, id_col: str, max_bucket: int = 512, salt: int = 0):
    """Yield deterministic sub-buckets of a (pandas) LSH bucket, each
    ≤ ~max_bucket rows, by a secondary hash of the id column salted with
    the BUCKET key (pass ``salt=group_salt(bucket_key)``).

    This is the scale guard missing from r1's bucket verification
    (VERDICT finding 3; same pattern as ``link.merge_similar_keys``):
    one degenerate bucket (boilerplate web text, empty docs) can no
    longer trigger O(n²) pair work — recall degrades predictably (a
    pair split across sub-buckets is missed in THIS band but can still
    fire in another band) instead of wall-time exploding. The salt makes
    the split independent across bands: identical-text duplicates
    produce same-size buckets (same k) in EVERY band, so an unsalted
    split would miss the same pairs deterministically in all of them
    (ADVICE r2)."""
    import math

    import numpy as np
    import pandas as pd

    if len(g) <= max_bucket:
        yield g
        return
    k = math.ceil(len(g) / max_bucket)
    h = pd.util.hash_pandas_object(g[id_col], index=False).to_numpy()
    sub = np.bitwise_xor(h.astype(np.uint64), np.uint64(salt)) % np.uint64(k)
    for _, part in g.groupby(sub, sort=True):
        yield part


def char_ngrams(text: str, n: int = 3) -> set[str]:
    t = " ".join(text.lower().split())
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def edit1_mask(a_vals, b_vals):
    """Vectorized ``levenshtein(a, b) <= 1`` over two parallel string
    arrays — the verify kernel of the fuzzy self-join. No DP loop:
    equal-length pairs need exactly ≤1 mismatching position; pairs
    whose lengths differ by 1 need the longer string to equal the
    shorter with one character inserted (prefix match up to the first
    mismatch, then a one-shifted suffix match). Everything runs on
    padded UTF-32 code-point matrices."""
    import numpy as np

    a = np.asarray(list(a_vals), dtype="U")
    b = np.asarray(list(b_vals), dtype="U")
    n = len(a)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    la = np.char.str_len(a)
    lb = np.char.str_len(b)
    wa = max(a.dtype.itemsize // 4, 1)
    wb = max(b.dtype.itemsize // 4, 1)
    w = max(wa, wb) + 1  # one pad column so the +1 shift stays in range
    A = np.zeros((n, w), np.uint32)
    B = np.zeros((n, w), np.uint32)
    if a.dtype.itemsize:
        A[:, :wa] = np.ascontiguousarray(a).view(np.uint32).reshape(n, wa)
    if b.dtype.itemsize:
        B[:, :wb] = np.ascontiguousarray(b).view(np.uint32).reshape(n, wb)

    same = la == lb
    if same.any():
        out[same] = (A[same] != B[same]).sum(axis=1) <= 1

    diff1 = np.abs(la - lb) == 1
    if diff1.any():
        idx = np.flatnonzero(diff1)
        S, L = A[idx].copy(), B[idx].copy()  # S short, L long
        swap = la[idx] > lb[idx]
        S[swap], L[swap] = L[swap], S[swap]
        ls = np.minimum(la[idx], lb[idx])
        neq = S != L
        first = np.where(neq.any(axis=1), neq.argmax(axis=1), ls)
        cols = np.arange(w - 1)
        within = (cols[None, :] >= first[:, None]) \
            & (cols[None, :] < ls[:, None])
        shifted_eq = S[:, :-1] == L[:, 1:]
        out[idx] = np.all(shifted_eq | ~within, axis=1)
    return out
