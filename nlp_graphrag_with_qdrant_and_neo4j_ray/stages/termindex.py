"""Serving-path term index: the terms edge list re-materialized
hash-partitioned by ``term``, each bucket file sorted by term.

r1's ``term_search`` scanned the ENTIRE terms table per query (16.7 s at
sf0.1 — VERDICT finding 7) because the build-order layout (partitioned by
chunk) prunes nothing for a term lookup. The layout contract (SURVEY.md
S7: "partitioned + sorted Parquet replaces indexes") is satisfied by this
second materialization: a query hashes its few terms to buckets, reads
ONLY those bucket files, and pushes a ``term IN (...)`` filter into
``read_parquet`` so row-group statistics (sorted by term) prune within
the bucket. Built once per KG dir, lazily, checkpoint-style (atomic
publish + _SUCCESS, resume skips)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SUCCESS = "_SUCCESS"


def term_buckets(terms: list[str], num_buckets: int) -> list[int]:
    """Deterministic bucket of each term — the same vectorized hash the
    shuffle layer uses, so write side and query side always agree."""
    h = pd.util.hash_pandas_object(pd.Series(terms, dtype="object"),
                                   index=False)
    return [int(v) for v in (h % num_buckets)]


class TermIndex:
    """Handle to a built index directory; ``matched(terms)`` returns a
    Dataset of exactly the edge rows whose term is in the query set,
    reading only the needed bucket files."""

    def __init__(self, path: str, num_buckets: int):
        self.path = path
        self.num_buckets = num_buckets

    def bucket_file(self, bucket: int) -> str:
        return os.path.join(self.path, f"bucket-{bucket}.parquet")

    def matched(self, terms: list[str]):
        import pyarrow.compute as pc
        import ray.data

        terms = sorted(set(terms))
        files = [
            f
            for f in (self.bucket_file(b)
                      for b in sorted(set(term_buckets(terms,
                                                       self.num_buckets))))
            if os.path.exists(f)
        ]
        if not terms or not files:
            from ..schemas import TERMS

            return ray.data.from_arrow(TERMS.empty_table())
        return ray.data.read_parquet(
            files, filter=pc.field("term").isin(terms)
        )


def ensure_term_index(out_dir: str, terms_ds, num_buckets: int = 64,
                      resume: bool = True) -> TermIndex:
    """Build (or load) the by-term index for a KG dir."""
    path = os.path.join(out_dir, "terms_by_term")
    marker = os.path.join(path, SUCCESS)
    if resume and os.path.exists(marker):
        return TermIndex(path, num_buckets)

    from .shuffle import grouped_map

    tmp = path + ".__tmp__"
    for stale in (tmp, path):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    os.makedirs(tmp, exist_ok=True)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df["bucket"] = pd.Series([], dtype="int64")
            return df
        df = df.copy()
        df["bucket"] = (
            pd.util.hash_pandas_object(df["term"], index=False) % num_buckets
        ).astype("int64")
        return df

    def write_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        out = pdf.sort_values(["term", "chunk_id"]).drop(columns=["bucket"])
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False),
            os.path.join(tmp, f"bucket-{b}.parquet"),
            row_group_size=32768,  # sorted → per-row-group min/max prune
        )
        return pd.DataFrame({"bucket": [b], "rows": [len(out)]})

    grouped_map(
        terms_ds.map_batches(add_bucket, batch_format="pandas",
                             batch_size=262144),
        ["bucket"],
        write_bucket,
        num_partitions=num_buckets,
    ).materialize()
    os.rename(tmp, path)
    with open(marker, "w") as f:
        f.write("ok")
    return TermIndex(path, num_buckets)
