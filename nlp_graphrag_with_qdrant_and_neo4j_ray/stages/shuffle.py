"""Partition-wise grouped execution — the engine's core shuffle pattern.

``Dataset.groupby(keys).map_groups(fn)`` invokes ``fn`` once per DISTINCT
key: per-group Python/pandas overhead (~2-3 ms) dominates when groups are
small and numerous (measured: 8k MinHash-LSH buckets → ~30 s of pure
group-dispatch overhead on 500 docs). The scalable shape is:

    add __part = stable_hash(keys) % num_partitions        (map_batches)
    groupby(__part)                                        (one shuffle)
    per partition: ONE vectorized pandas groupby over keys (map_groups)

One shuffle, ``num_partitions`` function calls total, local group logic
fully vectorized. Skew note: a hot KEY still lands in one partition, but
per-key work here is per-row-linear (the combiners upstream cap per-key
row counts), so partitions stay balanced; key-salting (see
stages/link.py) handles the head-key case before this exchange.
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


def grouped_map(ds, keys: list[str], group_fn, num_partitions: int = 64,
                batch_size: int = 65536):
    """Apply ``group_fn(pdf) -> DataFrame`` to every distinct ``keys``
    group, dispatched partition-wise. ``group_fn`` receives one group's
    rows (a pandas DataFrame, like Dataset.map_groups) and returns a
    DataFrame."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df[_PART] = pd.Series([], dtype="int64")
            return df
        df = df.copy()
        df[_PART] = _stable_part(df, keys, num_partitions)
        return df

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=[_PART])
        outs = [
            group_fn(g)
            for _, g in pdf.groupby(keys, sort=True, dropna=False)
        ]
        outs = [o for o in outs if o is not None and len(o)]
        if not outs:
            return pdf.iloc[0:0]
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(add_part, batch_format="pandas", batch_size=batch_size)
        .groupby(_PART)
        .map_groups(per_partition, batch_format="pandas")
    )


def grouped_apply(ds, keys: list[str], partition_fn, num_partitions: int = 64,
                  batch_size: int = 65536, batch_format: str = "pandas"):
    """Like :func:`grouped_map` but hands the WHOLE partition to
    ``partition_fn`` (which does its own local groupby over ``keys``) —
    for logic that vectorizes across groups (aggregations, windowing).

    ``batch_format="pyarrow"`` keeps BOTH sides of the exchange
    zero-copy Arrow: the partition column is computed from a pandas view
    of the KEY columns only (same ``hash_pandas_object`` everywhere) and
    appended to the Arrow batch, and ``partition_fn`` receives/returns a
    ``pa.Table`` — no full-table Arrow→pandas→Arrow round-trip for
    string-heavy tables (VERDICT r2 finding 6; measurement in
    BASELINE.md)."""

    if batch_format == "pyarrow":
        def add_part_arrow(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column(
                    _PART, pa.array([], pa.int64())
                )
            part = _stable_part(batch.select(keys).to_pandas(), keys,
                                num_partitions)
            return batch.append_column(_PART, pa.array(part.to_numpy()))

        def per_partition_arrow(batch: pa.Table) -> pa.Table:
            return partition_fn(batch.drop_columns([_PART]))

        return (
            ds.map_batches(add_part_arrow, batch_format="pyarrow",
                           batch_size=batch_size)
            .groupby(_PART)
            .map_groups(per_partition_arrow, batch_format="pyarrow")
        )

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df[_PART] = pd.Series([], dtype="int64")
            return df
        df = df.copy()
        df[_PART] = _stable_part(df, keys, num_partitions)
        return df

    def per_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        return partition_fn(pdf.drop(columns=[_PART]))

    return (
        ds.map_batches(add_part, batch_format="pandas", batch_size=batch_size)
        .groupby(_PART)
        .map_groups(per_partition, batch_format="pandas")
    )
