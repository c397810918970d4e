"""chunks → terms edge list (+ distinct Term node aggregate).

Stateless fan-out map_batches: each chunk explodes into
(chunk_id, term, term_type, position) rows — the HAS_TERM edge list
(/root/reference/graphrag/core/nlp_graph.py:60-104). ``position`` is the
0-based occurrence index within that chunk's n-gram stream of the same
type (engine addition; the reference's Cypher MERGE collapses repeats).

The distinct Term node table (Cypher ``MERGE (t:Term {text,type})``,
nlp_graph.py:93) is a two-level aggregate: per-batch partial distinct
(combiner) → groupby((term, term_type)) sum of per-chunk-distinct counts —
high-cardinality, roughly uniform keys, plain hash shuffle (SURVEY.md §7.4).
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..config import PipelineConfig
from ..functions.chunk import extract_ngrams
from ..schemas import TERMS
from ..state.lineage import LineageRecorder, first_fragment


def make_ngram_fn(cfg: PipelineConfig, lineage: LineageRecorder | None = None):
    remove_stopwords = cfg.remove_stopwords

    def ngram(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        frag = first_fragment(batch, "chunk_id")
        cid, term, ttype, pos = [], [], [], []
        for chunk_id_, text in zip(
            batch.column("chunk_id").to_pylist(), batch.column("text").to_pylist()
        ):
            uni, bi, tri = extract_ngrams(text, remove_stopwords)
            for type_name, grams in (("unigram", uni), ("bigram", bi), ("trigram", tri)):
                cid.extend([chunk_id_] * len(grams))
                term.extend(grams)
                ttype.extend([type_name] * len(grams))
                pos.extend(range(len(grams)))
        out = pa.table(
            {
                "chunk_id": pa.array(cid, pa.string()),
                "term": pa.array(term, pa.string()),
                "term_type": pa.array(ttype, pa.string()),
                "position": pa.array(pos, pa.int32()),
            },
            schema=TERMS,
        )
        if lineage is not None:
            lineage.record(
                frag, batch.num_rows, out.num_rows, 0, (time.perf_counter() - t0) * 1e3
            )
        return out

    return ngram


def partial_distinct_terms(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch (term, term_type) → count of DISTINCT chunks
    (matches the Cypher MERGE edge semantics). Emits ≤1 row per key per
    batch so the following groupby shuffles partials, not the edge list."""
    seen = (
        batch.select(["term", "term_type", "chunk_id"])
        .group_by(["term", "term_type", "chunk_id"])
        .aggregate([])
    )
    return seen.group_by(["term", "term_type"]).aggregate([("chunk_id", "count")]).rename_columns(
        ["term", "term_type", "chunk_count"]
    )


def term_nodes(terms_ds, cfg: PipelineConfig, num_partitions: int = 256):
    """terms edge list → distinct Term node table with chunk_count.

    Partition-wise (stages/shuffle.py) rather than
    ``groupby([term, term_type]).aggregate``: a sort-based shuffle keyed on
    ~10M short STRINGS is the pipeline's most expensive exchange (~28 s at
    8 CPUs); hashing keys to an int partition column and doing the string
    groupby locally per partition cuts the exchange to an int sort. Both
    sides of the exchange stay Arrow (zero-copy from the object store;
    the local aggregate is ``pa.Table.group_by`` — measured against the
    pandas round-trip in BASELINE.md, VERDICT r2 finding 6)."""
    from .shuffle import grouped_apply

    partials = terms_ds.map_batches(
        partial_distinct_terms, batch_format="pyarrow", batch_size=262144
    )

    def agg_partition(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["term", "term_type"])
            .aggregate([("chunk_count", "sum")])
            .rename_columns(["term", "term_type", "chunk_count"])
        )

    return grouped_apply(partials, ["term", "term_type"], agg_partition,
                         num_partitions=num_partitions,
                         batch_format="pyarrow")
