"""Per-group unigram KL drift (pipelines/textstats.unigram_kl_drift):
matches a direct full-vocabulary-grid reimplementation, is
partition-independent, and ranks a vocabulary-disjoint group as the
most drifted."""

import math
from collections import Counter, defaultdict

import pyarrow as pa
import ray.data as rd

from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.textstats import (
    unigram_kl_drift,
)


def py_kl(docs: list[tuple[str, str]]) -> dict[str, tuple[int, float]]:
    """Independent reimplementation: explicit Laplace-smoothed P_g over
    the full corpus vocabulary vs the corpus MLE Q, no factoring."""
    tok_all: list[str] = []
    groups: dict[str, list[str]] = defaultdict(list)
    for g, t in docs:
        toks = [x for x in t.split(" ") if x]
        tok_all += toks
        groups[g] += toks
    n = len(tok_all)
    c = Counter(tok_all)
    v = len(c)
    out = {}
    for g, toks in groups.items():
        cg = Counter(toks)
        d = len(toks) + v
        kl = sum(
            ((cg.get(tok, 0) + 1) / d)
            * math.log(((cg.get(tok, 0) + 1) / d) / (c[tok] / n))
            for tok in c
        )
        out[g] = (len(toks), round(kl, 6))
    return out


DOCS = [
    ("a", "x x y z w"),
    ("a", "x y"),
    ("b", "z z q q q"),
    ("b", "q w"),
    ("c", "x y z q w w y"),
    ("d", "omega omega psi psi psi omega"),
]


def _ds(docs):
    return rd.from_arrow(pa.table({
        "source": [d[0] for d in docs],
        "text": [d[1] for d in docs],
    }))


def test_matches_grid_reimplementation(ray_session):
    got = unigram_kl_drift(_ds(DOCS), num_partitions=5).to_pandas()
    want = py_kl(DOCS)
    assert len(got) == len(want)
    for _, row in got.iterrows():
        n, kl = want[row["source"]]
        assert row["n_tokens"] == n
        assert row["kl"] == kl


def test_partition_independent(ray_session):
    a = (unigram_kl_drift(_ds(DOCS).repartition(1), num_partitions=1)
         .to_pandas().sort_values("source").reset_index(drop=True))
    b = (unigram_kl_drift(_ds(DOCS).repartition(7), num_partitions=11)
         .to_pandas().sort_values("source").reset_index(drop=True))
    assert a.equals(b)


def test_disjoint_vocab_group_most_drifted(ray_session):
    got = (unigram_kl_drift(_ds(DOCS), num_partitions=4)
           .to_pandas().set_index("source")["kl"])
    # 'd' shares no token with the rest of the corpus: largest KL.
    assert got["d"] == got.max()
    assert got["d"] > 2 * got[["a", "b", "c"]].max()
