"""Distributed deduplication pipelines over a documents table
(``doc_id:int64, text:string`` — the driver testdata shape).

Five operators, each a Dataset pipeline:

- exact            : content-hash partition → per-group min-id keeper
- minhash_lsh      : shingle → minhash → band → bucket groupby → verified pairs
- simhash          : 64-bit simhash → 16-bit band buckets → hamming≤k pairs
- ngram_jaccard    : character-n-gram Jaccard verification of LSH candidates
- embedding cosine : near-dup pairs over an embedding column (see
                     ``similarity.py`` for the shared LSH bucketing)

Scale notes (100 TB design): every pipeline shuffles *sketches/keys*, not
documents — per-batch combiners emit (key, doc_id[, signature]) rows; the
only all-to-all moves fixed-width rows. Signature lookup for pair
verification is a broadcast when the candidate set is small and falls back
to carrying signatures through the band explode (bounded by
bands × sig_bytes) otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.dedup import MinHasher, char_ngrams, hamming64, jaccard, shingles, simhash64
from ..functions.textstats import content_hash


# --------------------------- exact dedup -----------------------------------

def exact_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact duplicate groups: hash-partition by content hash, keep the
    min id per group. Returns (keeper, dup_count) — one row per distinct
    text. Oracle-equivalent SQL: GROUP BY text / MIN(id) / COUNT(*)."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [content_hash(t) for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                "content_hash": pa.array(hashes, pa.string()),
                id_col: batch.column(id_col),
            }
        )

    return (
        docs_ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keeper"), Count(alias_name="dup_count"))
        .select_columns(["keeper", "dup_count"])
    )


# --------------------------- MinHash + LSH ---------------------------------

def minhash_signatures(docs_ds, num_perm: int = 128, shingle_k: int = 5,
                       id_col: str = "doc_id", text_col: str = "text"):
    """doc → (doc_id, sig:binary). Stateful hasher built once per actor."""

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            sigs = [
                self.mh.signature(shingles(t, shingle_k)).tobytes()
                for t in batch.column(text_col).to_pylist()
            ]
            return pa.table(
                {id_col: pa.array(ids), "sig": pa.array(sigs, pa.binary())}
            )

    return docs_ds.map_batches(
        Signer, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )


def minhash_lsh_pairs(docs_ds, num_perm: int = 128, num_bands: int = 16,
                      shingle_k: int = 5, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Near-dup pairs via MinHash-LSH.

    sig → band explode (band_id, band_hash, doc_id, sig) →
    groupby(band_id, band_hash) → within-bucket candidate pairs →
    estimated Jaccard from signature agreement ≥ threshold →
    distinct pairs. Returns Dataset (doc_a, doc_b, est_jaccard)."""

    class Bander:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, bids, bhash, sigs = [], [], [], []
            for i, t in zip(
                batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
            ):
                sig = self.mh.signature(shingles(t, shingle_k))
                raw = sig.tobytes()
                for b, h in enumerate(self.mh.bands(sig, num_bands)):
                    ids.append(i)
                    bids.append(b)
                    bhash.append(np.int64(h - (1 << 63)))
                    sigs.append(raw)
            return pa.table(
                {
                    "band_id": pa.array(bids, pa.int32()),
                    "band_hash": pa.array(bhash, pa.int64()),
                    id_col: pa.array(ids),
                    "sig": pa.array(sigs, pa.binary()),
                }
            )

    bands = docs_ds.map_batches(
        Bander, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        sigs = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        a_l, b_l, j_l = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                est = float(np.mean(sigs[x] == sigs[y]))
                if est >= threshold:
                    a_l.append(ids[x])
                    b_l.append(ids[y])
                    j_l.append(est)
        return pd.DataFrame({"doc_a": a_l, "doc_b": b_l, "est_jaccard": j_l})

    from ..stages.shuffle import grouped_map

    pairs = grouped_map(bands, ["band_id", "band_hash"], bucket_pairs,
                        num_partitions=64)
    # distinct pairs (a pair can fire in several bands): max estimate wins
    from ray.data.aggregate import Max

    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    )


# ------------------------------ SimHash ------------------------------------

def simhash_table(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """doc → (doc_id, simhash:int64 (bit-preserving signed view))."""

    def sh(batch: pa.Table) -> pa.Table:
        vals = [
            np.int64(np.uint64(simhash64(t)).astype(np.int64))
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {id_col: batch.column(id_col), "simhash": pa.array(vals, pa.int64())}
        )

    return docs_ds.map_batches(sh, batch_format="pyarrow", batch_size=8192)


def simhash_pairs(docs_ds, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Near-dup pairs with hamming distance ≤ max_hamming, candidate-
    generated by 4×16-bit band buckets (any pair within hamming 3 shares
    at least one exact 16-bit band)."""
    sh = simhash_table(docs_ds, id_col, text_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids, bands, keys, hashes = [], [], [], []
        for i, h in zip(
            batch.column(id_col).to_pylist(), batch.column("simhash").to_pylist()
        ):
            u = np.uint64(h).item() & 0xFFFFFFFFFFFFFFFF
            for b in range(4):
                ids.append(i)
                bands.append(b)
                keys.append((u >> (16 * b)) & 0xFFFF)
                hashes.append(h)
        return pa.table(
            {
                "band": pa.array(bands, pa.int32()),
                "key": pa.array(keys, pa.int32()),
                id_col: pa.array(ids),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        hs = [np.uint64(h).item() & 0xFFFFFFFFFFFFFFFF for h in g["simhash"]]
        a_l, b_l, d_l = [], [], []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = hamming64(hs[x], hs[y])
                if d <= max_hamming:
                    a_l.append(ids[x])
                    b_l.append(ids[y])
                    d_l.append(d)
        return pd.DataFrame({"doc_a": a_l, "doc_b": b_l, "hamming": d_l})

    from ray.data.aggregate import Min

    from ..stages.shuffle import grouped_map

    exploded = sh.map_batches(explode, batch_format="pyarrow")
    pairs = grouped_map(exploded, ["band", "key"], bucket_pairs,
                        num_partitions=64)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


# --------------------------- n-gram Jaccard --------------------------------

def ngram_jaccard_verify(docs_ds, candidate_pairs: list[tuple], n: int = 3,
                         threshold: float = 0.6,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Verify candidate near-dup pairs with exact character-n-gram Jaccard.

    The candidate id set is broadcast; texts stream past once; the final
    pairwise verification happens on the (small) gathered candidates."""
    import ray

    wanted = sorted({i for p in candidate_pairs for i in p})
    wanted_arr = pa.array(wanted)

    import pyarrow.compute as pc

    rows = docs_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column(id_col), value_set=wanted_arr)),
        batch_format="pyarrow",
    ).take_all()
    grams = {r[id_col]: char_ngrams(r[text_col], n) for r in rows}
    out = []
    for a, b in sorted(set(tuple(sorted(p)) for p in candidate_pairs)):
        if a in grams and b in grams:
            j = jaccard(grams[a], grams[b])
            if j >= threshold:
                out.append({"doc_a": a, "doc_b": b, "jaccard": j})
    return pa.Table.from_pylist(
        out or [],
        schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
        ),
    )
