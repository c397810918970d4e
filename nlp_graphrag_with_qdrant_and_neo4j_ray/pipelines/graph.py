"""Distributed graph algorithms over edge-list Datasets — the analysis
layer on top of the KG the engine materializes (entity importance,
degree structure).  The reference stops at writing edges
(/root/reference/graphrag/core/triplets.py); these are beyond-reference
operators in the same iterative-exchange style as
``pipelines/dedup.connected_components``: edges materialize once, each
round is ONE fused co-partitioned ``grouped_apply`` exchange, and
per-round state is one row per node — never the edge payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.shuffle import grouped_apply

# row kinds on the shared exchange schema (key, dst, val, kind)
_EDGE = 0     # key = src, dst = neighbor, val = src's weight share
_CONTRIB = 1  # key = node, val = an incoming rank contribution


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
    ``r(v) = (1-d) + d·Σ_{u→v} r(u)·share(u→v)``, ranks initialized to
    1.0, dangling mass dropped — Page et al. 1999's original per-node
    form).  A FIXED iteration count keeps the result deterministic and
    SQL-oracle-able (the oracle unrolls the same ``iters`` joins).
    ``share(u→v)`` is ``1/outdeg(u)``, or ``w(u→v)/Σ_w(u→·)`` with
    ``weight_col`` — the natural mode for KG edges whose weight is
    mention count.

    Fused round: the gather key (contribution's destination node) and
    the next scatter key (edge source) are the SAME key, so each round
    is ONE exchange — a partition sums its nodes' incoming
    contributions into ranks, then immediately multiplies its
    co-located out-edges by those ranks, emitting next-round
    contribution rows (pre-aggregated by destination) plus a zero
    keep-alive row per node.  Seeding each node with one contribution
    of 1.0 makes round one reproduce rank 1.0 under the same formula
    (``(1-d) + d·1 = 1``).  ``iters`` rounds + one final gather =
    ``iters+1`` exchanges total; rounds chain LAZILY into one streaming
    execution (no per-round convergence check to materialize for,
    unlike the CC loop) — only the reused edge table is pinned.

    Node ids may be any hashable Arrow type (int ids, entity-name
    strings).  Skew note: a hub's out-edges co-locate on its partition;
    per-row work is linear and contributions pre-aggregate before the
    exchange, but a node with ~10^8 out-edges would need salted
    rank replication (split its edges across salt sub-keys, copy the
    rank row to each) — the same head-key treatment stages/link.py
    applies to entity canonicalization.
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

    # seed: every distinct node (src ∪ dst) gets one 1.0 contribution
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
            "kind": pa.array(np.full(len(nodes), _CONTRIB, np.int8)),
        })

    def distinct_nodes(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.drop_duplicates(subset=["key"])

    state = grouped_apply(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        ["key"], distinct_nodes, num_partitions=num_partitions,
    )

    def ranks_of(pdf: pd.DataFrame) -> pd.Series:
        c = pdf[pdf["kind"] == _CONTRIB]
        r = c.groupby("key", sort=False)["val"].sum()
        return (1.0 - damping) + damping * r

    def fused_round(pdf: pd.DataFrame) -> pd.DataFrame:
        r = ranks_of(pdf)
        edge = pdf[pdf["kind"] == _EDGE]
        contrib = edge["val"].to_numpy() \
            * edge["key"].map(r).to_numpy(np.float64)
        out = pd.DataFrame({
            "key": pd.concat(
                [edge["dst"], pd.Series(r.index)], ignore_index=True
            ),
            "val": np.concatenate([contrib, np.zeros(len(r))]),
        })
        agg = out.groupby("key", sort=False, as_index=False)["val"].sum()
        agg["dst"] = agg["key"]
        agg["kind"] = np.full(len(agg), _CONTRIB, np.int8)
        return agg[["key", "dst", "val", "kind"]]

    for _ in range(iters):
        state = grouped_apply(state.union(edges), ["key"], fused_round,
                              num_partitions=num_partitions)

    def final_rank(pdf: pd.DataFrame) -> pd.DataFrame:
        r = ranks_of(pdf)
        return pd.DataFrame({"node": r.index, rank_col: r.to_numpy()})

    ranks = grouped_apply(state, ["key"], final_rank,
                          num_partitions=num_partitions)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            rank_col: pc.round(b.column(rank_col), ndigits,
                               round_mode="half_towards_infinity"),
        })

    return ranks.map_batches(finish, batch_format="pyarrow")
