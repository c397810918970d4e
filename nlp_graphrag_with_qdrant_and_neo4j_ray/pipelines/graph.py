"""Distributed graph algorithms over edge-list Datasets — the analysis
layer on top of the KG the engine materializes (entity importance,
degree structure).  The reference stops at writing edges
(/root/reference/graphrag/core/triplets.py); these are beyond-reference
operators in the same iterative-exchange style as
``pipelines/dedup.connected_components``: edges materialize once, each
round is a constant number of co-partitioned ``grouped_apply``
exchanges, and per-round state (the rank vector) is one row per node —
never the edge payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.shuffle import grouped_apply

# row kinds on the shared exchange schema (key, dst, val, kind)
_EDGE = 0    # key = src, dst = neighbor, val = 1/outdeg(src)
_RANK = 1    # key = node, val = current rank


def out_degrees(edges_ds, src_col: str = "src", dst_col: str = "dst",
                num_partitions: int = 16):
    """(node, out_degree) — per-batch count combiner, one exchange."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by([src_col]).aggregate([([], "count_all")])
        return g.rename_columns([src_col, "out_degree"])

    def final(b: pa.Table) -> pa.Table:
        g = b.group_by([src_col]).aggregate([("out_degree", "sum")])
        return pa.table({
            src_col: g.column(src_col),
            "out_degree": pc.cast(g.column("out_degree_sum"), pa.int64()),
        })

    slim = edges_ds.map_batches(lambda b: b.select([src_col]),
                                batch_format="pyarrow")
    return grouped_apply(slim.map_batches(partial, batch_format="pyarrow"),
                         [src_col], final, num_partitions=num_partitions,
                         batch_format="pyarrow")


def pagerank(edges_ds, src_col: str = "src", dst_col: str = "dst",
             weight_col: str | None = None,
             iters: int = 5, damping: float = 0.85,
             rank_col: str = "pr", ndigits: int = 6,
             num_partitions: int = 16):
    """Fixed-iteration PageRank (the standard simplified recurrence
    ``r(v) = (1-d) + d·Σ_{u→v} r(u)/outdeg(u)``, ranks initialized to
    1.0, dangling mass dropped — Page et al. 1999's original per-node
    form).  A FIXED iteration count keeps the result deterministic and
    SQL-oracle-able (the oracle unrolls the same ``iters`` joins).
    With ``weight_col``, a source's rank splits proportionally to edge
    weight (``w(u→v)/Σ_w(u→·)``) instead of uniformly — the natural
    mode for KG edges whose weight is mention count.

    Skew note: the scatter exchange keys by src, so a hub node's entire
    out-edge list lands in one partition; per-row work there is linear
    and the contribution rows pre-aggregate by dst before the gather,
    but a node with ~10^8 out-edges would need salted rank-row
    replication (split its edges across salt sub-keys, copy the rank
    row to each) — the same head-key treatment stages/link.py applies
    to entity canonicalization.

    Node ids may be any hashable Arrow type (int ids, entity-name
    strings).  Shape per round: one exchange keyed by src co-locates
    edges with their source's rank row (contribution scatter), one
    exchange keyed by node sums contributions (gather) — rank rows ride
    both so every node, even in-degree-0, gets the (1-d) base.  Edges
    carry ``1/outdeg`` precomputed once and materialized; per-round
    state is one float per node.
    """
    def to_edges(b: pa.Table) -> pa.Table:
        w = (pc.cast(b.column(weight_col), pa.float64()) if weight_col
             else pa.array(np.ones(b.num_rows), pa.float64()))
        return pa.table({
            "key": b.column(src_col),
            "dst": b.column(dst_col),
            "val": w,
            "kind": pa.array(
                np.full(b.num_rows, _EDGE, np.int8)
            ),
        })

    raw = edges_ds.map_batches(to_edges, batch_format="pyarrow")

    # normalize each edge to its source's share (w/Σw; uniform 1/outdeg
    # when unweighted): one exchange on src, share computed in-partition
    def inv_deg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["val"] = pdf["val"].to_numpy() / pdf.groupby(
            "key", sort=False
        )["val"].transform("sum").to_numpy()
        return pdf

    edges = grouped_apply(raw, ["key"], inv_deg,
                          num_partitions=num_partitions).materialize()

    # rank rows: every distinct node (src ∪ dst), rank 1.0
    def node_rows(b: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([
            b.column("key").combine_chunks().cast(
                b.schema.field("key").type),
            b.column("dst").combine_chunks().cast(
                b.schema.field("key").type),
        ])
        return pa.table({
            "key": nodes,
            "dst": nodes,
            "val": pa.array(np.ones(len(nodes)), pa.float64()),
            "kind": pa.array(np.full(len(nodes), _RANK, np.int8)),
        })

    def distinct_nodes(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.drop_duplicates(subset=["key"])

    ranks = grouped_apply(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        ["key"], distinct_nodes, num_partitions=num_partitions,
    ).materialize()

    def scatter(pdf: pd.DataFrame) -> pd.DataFrame:
        """Partition keyed by src: edge contribution rows
        (dst, rank(src)·inv_deg) plus zero rows keeping every node
        alive for the gather."""
        rank = pdf[pdf["kind"] == _RANK]
        lut = dict(zip(rank["key"], rank["val"]))
        edge = pdf[pdf["kind"] == _EDGE]
        contrib = edge["val"].to_numpy() \
            * edge["key"].map(lut).to_numpy(np.float64)
        out = pd.DataFrame({
            "node": pd.concat([edge["dst"], rank["key"]],
                              ignore_index=True),
            "c": np.concatenate([contrib, np.zeros(len(rank))]),
        })
        # pre-aggregate before the gather exchange
        return out.groupby("node", sort=False, as_index=False)["c"].sum()

    def gather(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("node", sort=False, as_index=False)["c"].sum()
        g["c"] = (1.0 - damping) + damping * g["c"]
        return g

    for _ in range(iters):
        contribs = grouped_apply(ranks.union(edges), ["key"], scatter,
                                 num_partitions=num_partitions)
        new_ranks = grouped_apply(contribs, ["node"], gather,
                                  num_partitions=num_partitions)

        def as_rank_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "key": pdf["node"],
                "dst": pdf["node"],
                "val": pdf["c"],
                "kind": np.full(len(pdf), _RANK, np.int8),
            })

        ranks = new_ranks.map_batches(
            as_rank_rows, batch_format="pandas"
        ).materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("key"),
            rank_col: pc.round(b.column("val"), ndigits,
                               round_mode="half_towards_infinity"),
        })

    return ranks.map_batches(finish, batch_format="pyarrow")
