"""Partition-wise grouped execution — the engine's core shuffle pattern.

``Dataset.groupby(keys).map_groups(fn)`` invokes ``fn`` once per DISTINCT
key: per-group Python/pandas overhead (~2-3 ms) dominates when groups are
small and numerous (measured: 8k MinHash-LSH buckets → ~30 s of pure
group-dispatch overhead on 500 docs). The scalable shape is:

    add __part = stable_hash(keys) % num_partitions        (map_batches)
    groupby(__part)                                        (one shuffle)
    per partition: ONE vectorized local groupby over keys  (map_groups)

One shuffle, ``num_partitions`` function calls total, local group logic
fully vectorized. Skew note: a hot KEY still lands in one partition, but
per-key work here is per-row-linear (the combiners upstream cap per-key
row counts), so partitions stay balanced; key-salting (see
stages/link.py) handles the head-key case before this exchange.

The EXCHANGE is always zero-copy Arrow (blocks ship as Arrow through the
object store; a pandas-block exchange pickles per block and was measured
~25% slower with higher variance on string-heavy keys — BASELINE.md
round-3/4 A/Bs). ``batch_format`` only selects what ``partition_fn``
receives: ``"pyarrow"`` hands it the partition ``pa.Table`` directly;
``"pandas"`` converts once per partition on both sides, for local logic
that needs pandas kernels (``merge_asof``-style windows).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_PART = "__part"


def _stable_part(df: pd.DataFrame, keys: list[str], num_partitions: int) -> pd.Series:
    # hash_pandas_object is deterministic for a fixed hash_key across
    # processes and runs (no PYTHONHASHSEED dependence) and vectorized;
    # hashing the key-column DataFrame combines columns per row in C
    h = pd.util.hash_pandas_object(df[keys], index=False)
    return (h % num_partitions).astype("int64")


def arrow_out(fn):
    """Wrap a pandas ``map_batches`` fn so its OUTPUT blocks are Arrow —
    for stages whose result unions with Arrow-block datasets (one block
    type per batcher; grouped_apply outputs are always Arrow now)."""

    def wrapped(pdf: pd.DataFrame):
        out = fn(pdf)
        if isinstance(out, pa.Table):
            return out
        return pa.Table.from_pandas(out, preserve_index=False)

    return wrapped


def grouped_apply(ds, keys: list[str], partition_fn, num_partitions: int = 64,
                  batch_size: int = 65536, batch_format: str = "pyarrow"):
    """Hash-partition ``ds`` on ``keys`` and hand each WHOLE partition to
    ``partition_fn`` (which does its own local groupby over ``keys``) —
    for logic that vectorizes across groups (aggregations, windowing).

    The partition column is computed from a pandas view of the KEY
    columns only (same ``hash_pandas_object`` everywhere) and appended to
    the Arrow batch; blocks ride the exchange as Arrow regardless of
    ``batch_format``. The DEFAULT hands ``partition_fn`` a zero-copy
    ``pyarrow.Table`` (the builder's A/B showed ~25% faster and
    lower-variance on string-heavy keys — BASELINE.md r3/r4);
    ``batch_format="pandas"`` is the opt-in for partition logic that
    needs pandas kernels (``merge_asof``-style, ``ngroup`` folds) and
    converts once on partition entry and once on exit.
    """

    def add_part_arrow(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(_PART, pa.array([], pa.int64()))
        part = _stable_part(batch.select(keys).to_pandas(), keys,
                            num_partitions)
        return batch.append_column(_PART, pa.array(part.to_numpy()))

    if batch_format == "pyarrow":
        def per_partition(batch: pa.Table) -> pa.Table:
            return partition_fn(batch.drop_columns([_PART]))
    else:
        def per_partition(batch: pa.Table) -> pa.Table:
            out = partition_fn(batch.drop_columns([_PART]).to_pandas())
            if isinstance(out, pa.Table):
                return out
            return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(add_part_arrow, batch_format="pyarrow",
                       batch_size=batch_size)
        .groupby(_PART)
        .map_groups(per_partition, batch_format="pyarrow")
    )
