"""Incremental KG update: merging the KGs of two disjoint page halves
must equal the full-corpus build exactly on every keyed table.

merge_kg's exactness contract requires no cross-half alias bridge;
this corpus is made alias-stable by disabling near-merges
(alias_threshold > 1 → exact-name canonicalization only, stable under
any split). With the default 0.96 the same corpus DOES bridge
("macross consortium" near-merges a cross-half alias) — that is the
documented incremental-vs-recanonicalize divergence, asserted below."""

import pandas as pd
import pytest

from nlp_graphrag_with_qdrant_and_neo4j_ray.config import PipelineConfig

N_PAGES = 50
CORPUS = "mergefix"
CFG = PipelineConfig(alias_threshold=1.01)


def _half_filter(keep_even: bool):
    def fn(batch):
        import hashlib

        import pyarrow as pa

        # deterministic split on the url (stable across runs/processes)
        keep = [
            (hashlib.md5(u.encode()).digest()[0] % 2 == 0) == keep_even
            for u in batch.column("url").to_pylist()
        ]
        return batch.filter(pa.array(keep))

    return fn


@pytest.fixture(scope="module")
def merged_vs_full(ray_session, tmp_path_factory):
    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.kg import (
        build_kg,
        merge_kg,
    )
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.pages import (
        pages_dataset,
    )

    def build(name, flt):
        out = str(tmp_path_factory.mktemp(name))
        return build_kg(
            lambda: (pages_dataset(N_PAGES, CORPUS)
                     if flt is None else
                     pages_dataset(N_PAGES, CORPUS).map_batches(
                         flt, batch_format="pyarrow")),
            out, CFG, resume=False, lineage=False)

    full = build("kgfull", None)
    a = build("kga", _half_filter(True))
    b = build("kgb", _half_filter(False))
    return merge_kg(a, b), full


def _df(ds):
    df = ds.to_pandas()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple))).any() or \
                str(df[c].dtype) == "object" and len(df) and \
                hasattr(df[c].iloc[0], "__len__") and \
                not isinstance(df[c].iloc[0], str):
            df[c] = df[c].map(
                lambda v: tuple(v) if not isinstance(v, str) else v)
    return df


def _cmp(merged, full, keys):
    m = _df(merged).sort_values(keys).reset_index(drop=True)
    f = _df(full).sort_values(keys).reset_index(drop=True)
    m = m[sorted(m.columns)]
    f = f[sorted(f.columns)]
    pd.testing.assert_frame_equal(m, f, check_dtype=False)


def test_term_nodes_merge_equals_full(merged_vs_full):
    merged, full = merged_vs_full
    _cmp(merged["term_nodes"], full["term_nodes"],
         ["term", "term_type"])


def test_entity_nodes_merge_equals_full(merged_vs_full):
    merged, full = merged_vs_full
    _cmp(merged["entity_nodes"], full["entity_nodes"], ["entity_id"])


def test_edges_merge_equals_full(merged_vs_full):
    merged, full = merged_vs_full
    m = _df(merged["edges"])
    f = _df(full["edges"])
    keys = ["src_entity_id", "dst_entity_id", "pred"]
    # chunk provenance representative may legitimately differ between
    # a merge and a rebuild (both deterministic within their own run);
    # weights and structure must be identical
    m = m.drop(columns=["chunk_id"]).sort_values(keys).reset_index(
        drop=True)
    f = f.drop(columns=["chunk_id"]).sort_values(keys).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(m[sorted(m.columns)],
                                  f[sorted(f.columns)],
                                  check_dtype=False)


def test_union_tables_row_counts(merged_vs_full):
    merged, full = merged_vs_full
    for t in ("documents", "chunks", "terms", "triples",
              "chunk_vectors"):
        assert merged[t].count() == full[t].count(), t


def test_alias_bridge_divergence_is_real(ray_session, tmp_path_factory):
    """The exactness contract's boundary: with the default 0.96
    near-merge threshold this corpus DOES contain a cross-half alias
    bridge, so merge != rebuild (one extra entity) — the documented
    incremental-vs-recanonicalize trade-off, pinned so the contract
    in merge_kg's docstring stays honest."""
    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.kg import (
        build_kg,
        merge_kg,
    )
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.pages import (
        pages_dataset,
    )

    cfg = PipelineConfig()  # default alias_threshold=0.96

    def build(name, flt):
        out = str(tmp_path_factory.mktemp(name))
        return build_kg(
            lambda: (pages_dataset(N_PAGES, CORPUS)
                     if flt is None else
                     pages_dataset(N_PAGES, CORPUS).map_batches(
                         flt, batch_format="pyarrow")),
            out, cfg, resume=False, lineage=False)

    full = build("bfull", None)
    merged = merge_kg(build("ba", _half_filter(True)),
                      build("bb", _half_filter(False)))
    ids_m = {r["entity_id"]
             for r in merged["entity_nodes"].take_all()}
    ids_f = {r["entity_id"] for r in full["entity_nodes"].take_all()}
    assert ids_f < ids_m  # rebuild merged strictly more aliases
