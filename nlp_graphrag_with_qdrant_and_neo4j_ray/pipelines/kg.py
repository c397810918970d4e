"""The flagship KG-construction pipeline (SURVEY.md §3.1 engine DAG).

    pages ─ extract+lang-filter ─ documents ─ chunker ─ chunks
      chunks ─ n-grams ──────────────→ terms, term_nodes
      chunks ─ embedder actor pool ──→ chunk_vectors
      chunks ─ triplet actor pool ───→ triples
      triples ─ broadcast-linker ─ salted canonicalize → entity_nodes
              └─ edge combiner ─ groupby(src,dst,pred) → edges (sorted)

Each table is a per-stage Parquet checkpoint (atomic publish + _SUCCESS;
resume skips completed stages); every stage appends per-partition lineage
rows. The reference runs the same logic as three sequential in-memory
passes per document (cli/main.py:86-104).
"""

from __future__ import annotations

import json
import os

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages import embedding as emb_stage
from ..stages import tripletstage as tri_stage
from ..stages.chunking import make_chunk_fn
from ..stages.embedding import EmbedChunks
from ..stages.extract import make_extract_fn
from ..stages.link import collect_alias_dict, edges, entity_nodes, link_triples
from ..stages.ngram import make_ngram_fn, term_nodes
from ..stages.tripletstage import ExtractTriples
from ..schemas import CHUNKS, DOCUMENTS, TRIPLES
from ..state.checkpoint import checkpointed, checkpointed_passthrough
from ..state.lineage import LineageRecorder
from ..state.quarantine import QuarantineRecorder, quarantined


def build_kg(
    pages_ds_factory,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    lineage: bool = True,
    parallel_branches: bool = True,
):
    """Run (or resume) the full KG build; returns {table_name: Dataset}.

    ``pages_ds_factory`` is a zero-arg callable returning the input pages
    Dataset (a callable so a resumed run doesn't even construct the read).
    """
    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)

    # actor-pool sizing: never reserve every CPU or the pool starves the
    # read/write tasks and the pipeline deadlocks (observed at num_cpus=4
    # with a fixed pool of 4). Autoscale from 1 up to a cap below the
    # cluster CPU count.
    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    embed_pool = (1, max(1, min(cfg.embed_concurrency, total_cpus - 2)))
    triplet_pool = (1, max(1, min(cfg.triplet_concurrency, total_cpus - 2)))

    def rec(stage: str) -> LineageRecorder | None:
        return LineageRecorder(out_dir, stage, cfg.versioned(stage)) if lineage else None

    # row-failure policy (reference skip-and-continue, cli/main.py:150-154,
    # at row granularity): poisoned rows are skipped + recorded, never
    # batch-fatal
    def qrec(stage: str) -> QuarantineRecorder:
        return QuarantineRecorder(out_dir, stage)

    # per-stage wall clock (thread-safe: one entry per unique table name),
    # recorded into the manifest for observability
    import time as _time

    stage_wall: dict[str, float] = {}

    def checkpointed_timed(out_dir_, name, compute, resume=True):
        t0 = _time.perf_counter()
        ds = checkpointed(out_dir_, name, compute, resume=resume)
        stage_wall[name] = round(_time.perf_counter() - t0, 3)
        return ds

    # interior stages (consumed downstream in the same run) hand their
    # object-store blocks straight to consumers and publish the Parquet
    # checkpoint on a background thread — the write/read-back round-trip
    # leaves the critical path (VERDICT r2 task 2). finalizers are
    # joined before build_kg returns; the returned tables are the
    # disk-backed reads so no object-store pin outlives the build.
    finalizers: dict = {}
    # "0" = synchronous everywhere; "1" (default) = handoff for the
    # bounded interior tables; "all" = also handoff the terms table.
    # terms is the n-gram explosion (~15 rows per chunk, the largest
    # table in the build): pinning it in the object store pushes the
    # store into spill at large corpus sizes (measured at 1 M pages:
    # 32-CPU wall 76 s streaming vs 122 s pinned), and its consumer
    # (term_nodes) is off the critical path, so it streams by default.
    handoff_mode = os.environ.get("GRAFT_CHECKPOINT_HANDOFF", "1")

    def checkpointed_handoff(name, compute):
        if handoff_mode == "0" or (name == "terms"
                                   and handoff_mode != "all"):
            return checkpointed_timed(out_dir, name, compute, resume=resume)
        t0 = _time.perf_counter()
        ds, fin = checkpointed_passthrough(out_dir, name, compute,
                                           resume=resume)
        stage_wall[name] = round(_time.perf_counter() - t0, 3)
        finalizers[name] = fin
        return ds

    # slot A: the documents table and the chunks table both derive from
    # extract(pages); running them as parallel branches (chunks re-runs
    # the cheap extract instead of reading the documents checkpoint back)
    # costs a little recompute and removes one sequential barrier
    def _documents_branch():
        return checkpointed_timed(
            out_dir,
            "documents",
            lambda: pages_ds_factory().map_batches(
                quarantined(make_extract_fn(cfg, rec("extract")), "url",
                            DOCUMENTS, qrec("extract")),
                batch_format="pyarrow",
                batch_size=cfg.chunk_batch_size,
            ),
            resume,
        )

    def _chunks_branch():
        return checkpointed_handoff(
            "chunks",
            lambda: pages_ds_factory()
            .map_batches(
                quarantined(make_extract_fn(cfg, None), "url", DOCUMENTS,
                            qrec("extract")),
                batch_format="pyarrow",
                batch_size=cfg.chunk_batch_size,
            )
            .map_batches(
                quarantined(make_chunk_fn(cfg, rec("chunk")), "doc_id",
                            CHUNKS, qrec("chunk")),
                batch_format="pyarrow",
                batch_size=cfg.chunk_batch_size,
            ),
        )

    from concurrent.futures import ThreadPoolExecutor

    if parallel_branches:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_docs = pool.submit(_documents_branch)
            f_chunks = pool.submit(_chunks_branch)
            documents = f_docs.result()
            chunks = f_chunks.result()
    else:
        documents = _documents_branch()
        chunks = _chunks_branch()

    # the three chunk-fed branches are independent: run them on separate
    # driver threads so the streaming executors overlap (the n-gram task
    # stage fills CPUs the actor pools leave idle)
    def _terms_branch():
        from ..schemas import TERMS, TERMS_DICT
        from ..stages.ngram import _dict_out

        terms_schema = TERMS_DICT if _dict_out() else TERMS
        return checkpointed_handoff(
            "terms",
            lambda: chunks.map_batches(
                quarantined(make_ngram_fn(cfg, rec("ngram")), "chunk_id",
                            terms_schema, qrec("ngram")),
                batch_format="pyarrow",
                batch_size=cfg.chunk_batch_size,
            ),
        )

    # stage compute mode: heavy models (weights / GPU) → actor pool with
    # state in __init__; cheap deterministic doubles → stateless tasks on
    # the warm worker pool (an actor is always a fresh process — ~2 s
    # cold-start each, which only amortizes for heavyweight state)
    def _vectors_branch():
        if emb_stage.wants_actor_pool(cfg):
            mk = lambda: chunks.map_batches(  # noqa: E731
                EmbedChunks,
                fn_constructor_kwargs={"cfg": cfg, "lineage": rec("embed")},
                batch_format="pyarrow",
                batch_size=cfg.embed_batch_size,
                concurrency=embed_pool,
                num_gpus=cfg.embed_num_gpus or None,
            )
        else:
            mk = lambda: chunks.map_batches(  # noqa: E731
                emb_stage.make_embed_fn(cfg, rec("embed")),
                batch_format="pyarrow",
                batch_size=cfg.embed_batch_size,
            )
        return checkpointed_timed(out_dir, "chunk_vectors", mk, resume=resume)

    def _triples_branch():
        if tri_stage.wants_actor_pool(cfg):
            mk = lambda: chunks.map_batches(  # noqa: E731
                ExtractTriples,
                fn_constructor_kwargs={"cfg": cfg, "lineage": rec("triplets"),
                                       "quarantine": qrec("triplets")},
                batch_format="pyarrow",
                batch_size=cfg.triplet_batch_size,
                concurrency=triplet_pool,
                num_gpus=cfg.triplet_num_gpus or None,
            )
        else:
            mk = lambda: chunks.map_batches(  # noqa: E731
                quarantined(tri_stage.make_triplet_fn(cfg, rec("triplets")),
                            "chunk_id", TRIPLES, qrec("triplets")),
                batch_format="pyarrow",
                batch_size=cfg.triplet_batch_size,
            )
        return checkpointed_handoff("triples", mk)

    if parallel_branches:
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_terms = pool.submit(_terms_branch)
            f_vectors = pool.submit(_vectors_branch)
            f_triples = pool.submit(_triples_branch)
            terms = f_terms.result()
            chunk_vectors = f_vectors.result()
            triples = f_triples.result()
    else:
        terms = _terms_branch()
        chunk_vectors = _vectors_branch()
        triples = _triples_branch()

    # linking: broadcast alias dict (small side) + annotated triples;
    # an oversized dict spills to partitioned Parquet and linking becomes
    # a partition-aligned map-side join (never a silent semantics drop)
    def linked():
        alias = collect_alias_dict(
            triples, cfg,
            spill_dir=os.path.join(out_dir, "_alias_spill"),
            lineage=rec("alias"),
        )
        return link_triples(triples, alias, cfg)

    # tail: the term-node aggregate only needs the terms table, so it
    # runs concurrently with the whole linking chain
    def _link_chain():
        linked_ds = checkpointed_handoff("linked_triples", linked)
        if parallel_branches:
            with ThreadPoolExecutor(max_workers=2) as pool:
                f_ents = pool.submit(
                    checkpointed_timed, out_dir, "entity_nodes",
                    lambda: entity_nodes(linked_ds, cfg), resume,
                )
                f_edges = pool.submit(
                    checkpointed_timed, out_dir, "edges",
                    lambda: edges(linked_ds, cfg), resume,
                )
                return linked_ds, f_ents.result(), f_edges.result()
        ents = checkpointed_timed(
            out_dir, "entity_nodes", lambda: entity_nodes(linked_ds, cfg),
            resume,
        )
        edgs = checkpointed_timed(
            out_dir, "edges", lambda: edges(linked_ds, cfg), resume=resume
        )
        return linked_ds, ents, edgs

    def _term_nodes_branch():
        return checkpointed_timed(
            out_dir, "term_nodes", lambda: term_nodes(terms, cfg), resume=resume
        )

    if parallel_branches:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_link = pool.submit(_link_chain)
            f_tn = pool.submit(_term_nodes_branch)
            linked_ds, entity_nodes_ds, edges_ds = f_link.result()
            term_nodes_ds = f_tn.result()
    else:
        linked_ds, entity_nodes_ds, edges_ds = _link_chain()
        term_nodes_ds = _term_nodes_branch()

    # join the background checkpoint publishes (re-raises any publish
    # failure) and swap the in-memory handoff datasets for their
    # disk-backed reads so no object-store pin outlives the build
    published = {name: fin() for name, fin in finalizers.items()}
    chunks = published.get("chunks", chunks)
    terms = published.get("terms", terms)
    triples = published.get("triples", triples)
    linked_ds = published.get("linked_triples", linked_ds)

    manifest = {
        "engine": "nlp_graphrag_with_qdrant_and_neo4j_ray",
        "stage_version": cfg.stage_version,
        "config": {
            "max_tokens_per_chunk": cfg.max_tokens_per_chunk,
            "remove_stopwords": cfg.remove_stopwords,
            "embedding_model": cfg.embedding_model,
            "vector_size": cfg.vector_size,
            "salt_buckets": cfg.salt_buckets,
            "languages": list(cfg.languages),
        },
        "tables": [
            "documents",
            "chunks",
            "terms",
            "term_nodes",
            "chunk_vectors",
            "triples",
            "linked_triples",
            "entity_nodes",
            "edges",
        ],
        "stage_wall_s": stage_wall,
        "layout": {
            "edges": "sorted by (src_entity_id, dst_entity_id, pred)",
            "chunks": "chunk chain as prev/next columns; sort key (doc_id, chunk_index)",
            "chunk_vectors": "UUIDv5 point ids, cosine/unit-norm vectors",
        },
    }
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    return {
        "documents": documents,
        "chunks": chunks,
        "terms": terms,
        "term_nodes": term_nodes_ds,
        "chunk_vectors": chunk_vectors,
        "triples": triples,
        "linked_triples": linked_ds,
        "entity_nodes": entity_nodes_ds,
        "edges": edges_ds,
    }


def merge_kg(tables_a: dict, tables_b: dict) -> dict:
    """INCREMENTAL KG update: merge a new corpus increment's KG tables
    into an existing KG without rebuilding — the periodic-crawl
    production path (build the increment alone, then one additive
    merge; full re-canonicalization stays an offline batch job).

    Merge rules per table (all exact because the aggregates are
    associative):
    - ``chunks`` / ``terms`` / ``triples`` / ``chunk_vectors`` /
      ``documents`` / ``linked_triples``: plain union — rows are keyed
      by doc/chunk ids, disjoint across corpora by construction.
    - ``term_nodes``: one exchange on (term, term_type), chunk_count
      sums (chunk sets are disjoint).
    - ``entity_nodes``: one exchange on entity_id — mention_count
      sums, aliases union (sorted distinct), name/embedding are
      id-determined (first), triplet_part joins to "both" when the
      sides disagree.
    - ``edges``: one exchange on (src, dst, pred) — weight sums,
      provenance chunk_id takes the min (deterministic
      representative), pred_embedding is pred-determined (first).

    EXACTNESS CONTRACT (documented divergence from a full rebuild):
    the increment is canonicalized with its OWN alias dictionary, so
    a merge equals a full rebuild exactly iff no ≥similarity-threshold
    alias pair BRIDGES the two corpora (tested equality on stable
    corpora in tests/test_kg_merge.py). A bridging alias yields two
    entity ids a rebuild would merge — the standard
    incremental-vs-recanonicalize trade-off."""
    import pandas as pd

    from ..stages.shuffle import grouped_apply

    out: dict = {}
    for name in ("documents", "chunks", "terms", "triples",
                 "chunk_vectors", "linked_triples"):
        if name in tables_a and name in tables_b:
            out[name] = tables_a[name].union(tables_b[name])

    def merge_term_nodes(tbl: pa.Table) -> pa.Table:
        agg = tbl.group_by(["term", "term_type"]).aggregate(
            [("chunk_count", "sum")]
        )
        return agg.rename_columns(["term", "term_type", "chunk_count"])

    out["term_nodes"] = grouped_apply(
        tables_a["term_nodes"].union(tables_b["term_nodes"]),
        ["term", "term_type"], merge_term_nodes,
        num_partitions=16, batch_format="pyarrow",
    )

    def merge_entities(pdf: pd.DataFrame) -> pd.DataFrame:
        def fold(g: pd.DataFrame) -> pd.Series:
            parts = set(g["triplet_part"])
            part = (g["triplet_part"].iloc[0] if len(parts) == 1
                    else "both")
            aliases = sorted({a for al in g["aliases"] for a in al})
            return pd.Series({
                "name": g["name"].iloc[0],
                "embedding": g["embedding"].iloc[0],
                "triplet_part": part,
                "aliases": aliases,
                "mention_count": int(g["mention_count"].sum()),
            })

        return (pdf.groupby("entity_id", sort=False)
                .apply(fold, include_groups=False).reset_index())

    out["entity_nodes"] = grouped_apply(
        tables_a["entity_nodes"].union(tables_b["entity_nodes"]),
        ["entity_id"], merge_entities, num_partitions=16,
                      batch_format="pandas")

    def merge_edges(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = ["src_entity_id", "dst_entity_id", "pred"]
        pdf = pdf.sort_values(keys + ["chunk_id"], kind="stable")
        agg = pdf.groupby(keys, sort=False, as_index=False).agg(
            chunk_id=("chunk_id", "first"),
            weight=("weight", "sum"),
            pred_embedding=("pred_embedding", "first"),
        )
        return agg

    out["edges"] = grouped_apply(
        tables_a["edges"].union(tables_b["edges"]),
        ["src_entity_id", "dst_entity_id", "pred"], merge_edges,
        num_partitions=16,
                      batch_format="pandas")
    return out
