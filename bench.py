"""Benchmark harness.

    python bench.py              # headline KG-construct over $GRAFT_SF_DIR
                                 # (default /root/testdata/sf0.1) + per-query
                                 # timings; prints ONE JSON line
    python bench.py --scaling    # same headline at num_cpus=8 and 32 in
                                 # fresh processes; prints throughputs +
                                 # scaling efficiency (sandbox stand-in for
                                 # the N- vs 4N-node cluster run)

Headline metric: end-to-end KG construction (extract → chunk → ngram →
embed → triples → link → canonicalize → materialize, with checkpoints and
lineage) over the sf documents table mapped into the pages schema
(deterministic entity-rich augmentation so the triple path does real
work). Reported as seconds + docs/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from nlp_graphrag_with_qdrant_and_neo4j_ray.pipelines.kg import build_kg
    from nlp_graphrag_with_qdrant_and_neo4j_ray.sources.pages import pages_from_documents

    # warm the OS page cache so we measure compute+shuffle, not first read
    n_docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).num_rows

    # fresh headline build into the query-layer cache dir (queries resume
    # from it afterwards instead of rebuilding)
    out_dir = E._kg_dir(sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    tables = build_kg(
        lambda: pages_from_documents(sf_dir, augment=True),
        out_dir,
        E.CFG,
        resume=True,
        lineage=True,
    )
    n_edges = tables["edges"].count()
    headline = time.perf_counter() - t0

    qtimes: dict[str, float] = {}
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            if hasattr(res, "iter_batches"):
                n = sum(
                    b.num_rows
                    for b in res.iter_batches(batch_size=65536, batch_format="pyarrow")
                )
            else:
                n = len(res)
            qtimes[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            qtimes[name] = -1.0
            print(f"query {name} failed: {e}", file=sys.stderr)

    result = {
        "metric": "e2e_kg_construct_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs": n_docs,
        "edges": n_edges,
        "docs_per_sec": round(n_docs / headline, 2),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, "bench.py"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    lo = run(lo_cpus)
    hi = run(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
