"""triples → entity_nodes + edges: broadcast-dict linking, salted
canonicalization, weighted edge materialization.

Decomposition of the reference's per-triplet ``process_triplet``
(core/triplets.py:220-403: 3 embeds + similar-node lookup + Entity MERGE ×2
+ RELATES_TO MERGE, 4-7 Cypher round-trips each) into:

1. distinct-name aggregate (per-batch combiner → groupby) — small side;
2. alias dictionary built once on the driver, ``ray.put`` broadcast;
3. stateless linker ``map_batches`` annotating src/dst entity ids;
4. entity canonicalization: per-batch partials with an explicit
   ``salt = hash(chunk_id) % S`` column → level-1
   ``groupby(entity_id, salt)`` → level-2 ``groupby(entity_id)`` — the
   two-level salt-key skew split the north_rule requires (head entities
   like country names dominate web text);
5. edge weighting: per-batch combiner → ``groupby(src,dst,pred)`` with
   Sum/Min aggregates (the Cypher MERGE collapse, multiplicity preserved
   as ``weight`` — SURVEY.md A5) plus min-chunk provenance (fixing the
   reference's always-null ``r.source``, retrieval.py:283).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.embed import get_embedder
from ..functions.link import build_alias_dict, canonical_key, entity_id_for
from ..state.broadcast import BroadcastLookup, broadcast

# process-global read-only embedder cache for map_groups workers (the
# reference's utils/common.py:20 cache, but immutable)
_EMBEDDERS: dict = {}


def _embedder(model: str, dim: int):
    key = (model, dim)
    if key not in _EMBEDDERS:
        _EMBEDDERS[key] = get_embedder(model, dim)
    return _EMBEDDERS[key]


def partial_distinct_names(batch: pa.Table) -> pa.Table:
    """Combiner: distinct (name) per batch from subj+obj columns."""
    names = set(batch.column("subj").to_pylist())
    names.update(batch.column("obj").to_pylist())
    return pa.table({"name": pa.array(sorted(names), pa.string())})


def collect_alias_dict(triples_ds, cfg: PipelineConfig, max_names: int = 2_000_000):
    """Distinct names (small side) → alias dict → broadcast ref.

    The distinct-name set is bounded: per-batch combiner, then
    ``groupby(name)`` dedup, then a guarded driver collect. Above
    ``max_names`` the embedding-merge pass is skipped and linking falls
    back to the pure canonical key (documented scale path — the dict is
    an accuracy enhancement, not a correctness dependency).
    """
    distinct = (
        triples_ds.map_batches(
            partial_distinct_names, batch_format="pyarrow", batch_size=65536
        )
        .groupby("name")
        .count()
    )
    names: list[str] = []
    too_big = False
    for batch in distinct.iter_batches(batch_size=65536, batch_format="pyarrow"):
        names.extend(batch.column("name").to_pylist())
        if len(names) > max_names:
            too_big = True
            break
    if too_big:
        alias = None  # too big to broadcast-merge; pure-key fallback
    else:
        alias = build_alias_dict(names, _embedder(cfg.embedding_model, cfg.vector_size))
    return BroadcastLookup(broadcast(alias))


def make_linker_fn(alias_lookup: BroadcastLookup, cfg: PipelineConfig):
    """triples → triples + src/dst entity ids + salt column."""
    salt_buckets = cfg.salt_buckets

    def link(batch: pa.Table) -> pa.Table:
        alias = alias_lookup.get()

        def resolve(name: str) -> str:
            if alias is not None:
                hit = alias.get(name)
                if hit is not None:
                    return hit[0]
            return entity_id_for(canonical_key(name))

        src = [resolve(n) for n in batch.column("subj").to_pylist()]
        dst = [resolve(n) for n in batch.column("obj").to_pylist()]
        salts = [
            int.from_bytes(
                hashlib.blake2b(c.encode(), digest_size=2).digest(), "big"
            )
            % salt_buckets
            for c in batch.column("chunk_id").to_pylist()
        ]
        return (
            batch.append_column("src_entity_id", pa.array(src, pa.string()))
            .append_column("dst_entity_id", pa.array(dst, pa.string()))
            .append_column("salt", pa.array(salts, pa.int32()))
        )

    return link


# --------------------------- entity_nodes ---------------------------------


def partial_entities(batch: pa.Table) -> pd.DataFrame:
    """Combiner: ≤1 row per (entity_id, salt) per batch. Alias sets are
    serialized as '|'-joined sorted strings (merged again at each level)."""
    df = batch.select(
        ["src_entity_id", "dst_entity_id", "subj", "obj", "salt", "chunk_id"]
    ).to_pandas()
    halves = []
    for id_col, name_col, part in (
        ("src_entity_id", "subj", "subject"),
        ("dst_entity_id", "obj", "object"),
    ):
        h = df[[id_col, name_col, "salt", "chunk_id"]].copy()
        h.columns = ["entity_id", "name", "salt", "chunk_id"]
        h["part"] = part
        halves.append(h)
    both = pd.concat(halves, ignore_index=True)
    agg = (
        both.groupby(["entity_id", "salt"], sort=True)
        .agg(
            names=("name", lambda s: "|".join(sorted(set(s)))),
            parts=("part", lambda s: "|".join(sorted(set(s)))),
            mention_count=("name", "size"),
            chunk_id=("chunk_id", "min"),
        )
        .reset_index()
    )
    return agg


def _merge_pipe_sets(series: pd.Series) -> str:
    return "|".join(sorted(set("|".join(series).split("|"))))


def merge_salted_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    """Level-1 merge, vectorized across one hash partition: combine
    partials per (entity_id, salt)."""
    return (
        pdf.groupby(["entity_id", "salt"], sort=True)
        .agg(
            names=("names", _merge_pipe_sets),
            parts=("parts", _merge_pipe_sets),
            mention_count=("mention_count", "sum"),
            chunk_id=("chunk_id", "min"),
        )
        .reset_index()
    )


def make_final_entity_partition(cfg: PipelineConfig):
    model, dim = cfg.embedding_model, cfg.vector_size

    def final(pdf: pd.DataFrame) -> pa.Table:
        merged = (
            pdf.groupby("entity_id", sort=True)
            .agg(
                names=("names", _merge_pipe_sets),
                parts=("parts", _merge_pipe_sets),
                mention_count=("mention_count", "sum"),
            )
            .reset_index()
        )
        aliases = [sorted(n.split("|")) for n in merged["names"]]
        displays = [a[0] for a in aliases]
        part = [
            "both" if "|" in p else p for p in merged["parts"]
        ]
        # one batched encode for the whole partition's display names
        emb = _embedder(model, dim).encode(displays, prefix="passage:")
        import numpy as np

        return pa.table(
            {
                "entity_id": pa.array(merged["entity_id"], pa.string()),
                "name": pa.array(displays, pa.string()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.asarray(emb, dtype=np.float32).reshape(-1),
                             type=pa.float32()),
                    dim,
                ),
                "triplet_part": pa.array(part, pa.string()),
                "aliases": pa.array(aliases, pa.list_(pa.string())),
                "mention_count": pa.array(
                    merged["mention_count"].astype("int64"), pa.int64()
                ),
            }
        )

    return final


def entity_nodes(linked_ds, cfg: PipelineConfig, num_partitions: int = 64):
    """Two-level salted canonicalization → entity_nodes table.

    Both levels run partition-wise (stages/shuffle.py): the salt column
    spreads a head entity's partials over ``salt_buckets`` level-1 groups;
    level-2 sees ≤ salt_buckets rows per entity regardless of skew."""
    from .shuffle import grouped_apply

    partials = linked_ds.map_batches(
        partial_entities, batch_format="pyarrow", batch_size=65536
    )
    level1 = grouped_apply(
        partials, ["entity_id", "salt"], merge_salted_partition, num_partitions
    )
    return grouped_apply(
        level1, ["entity_id"], make_final_entity_partition(cfg), num_partitions
    )


# ------------------------------ edges --------------------------------------


def partial_edges(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch (src, dst, pred) → count + min chunk_id."""
    return (
        batch.select(["src_entity_id", "dst_entity_id", "pred", "chunk_id"])
        .group_by(["src_entity_id", "dst_entity_id", "pred"])
        .aggregate([("chunk_id", "count"), ("chunk_id", "min")])
        .rename_columns(
            ["src_entity_id", "dst_entity_id", "pred", "weight", "chunk_id"]
        )
    )


def edges(linked_ds, cfg: PipelineConfig):
    """Weighted, provenance-carrying, sorted edge list."""
    from ray.data.aggregate import Min, Sum

    partials = linked_ds.map_batches(
        partial_edges, batch_format="pyarrow", batch_size=65536
    )
    agg = partials.groupby(["src_entity_id", "dst_entity_id", "pred"]).aggregate(
        Sum("weight", alias_name="weight"),
        Min("chunk_id", alias_name="chunk_id"),
    )
    # sorted edge-list materialization (north_star)
    return agg.sort(["src_entity_id", "dst_entity_id", "pred"]).select_columns(
        ["src_entity_id", "dst_entity_id", "pred", "chunk_id", "weight"]
    )
