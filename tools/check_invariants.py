#!/usr/bin/env python
"""Cross-table invariant audit of a built KG directory (DuckDB, no Ray).

    python tools/check_invariants.py /tmp/kgcache-<tag>

Checks conservation laws that hold BY CONSTRUCTION between sibling
checkpoints — the class of check that caught the r4 term_nodes
chunk_count overcount (a per-batch distinct-count combiner double
counting chunks split across batch boundaries), which no unit fixture
was large enough to trigger and no SQL oracle covered. Run it at bench
scale (sf0.1) after touching any combiner on the KG spine.
"""

from __future__ import annotations

import os
import sys

import duckdb


def main(base: str) -> int:
    con = duckdb.connect()
    q = lambda s: con.execute(s).fetchone()  # noqa: E731
    failures = 0

    def check(name: str, ok: bool, detail: str) -> None:
        nonlocal failures
        print(f"{'OK  ' if ok else 'FAIL'} {name}: {detail}")
        failures += 0 if ok else 1

    lt = q(f"SELECT count(*) FROM read_parquet('{base}/linked_triples/*.parquet')")[0]

    w = q(f"SELECT sum(weight) FROM read_parquet('{base}/edges/*.parquet')")[0]
    check("edge weight conservation", w == lt,
          f"sum(weight)={w} vs linked rows={lt}")

    bad = q(f"""
        SELECT count(*) FROM (
          SELECT src_entity_id, dst_entity_id, pred,
                 count(*) c, min(chunk_id) mc
          FROM read_parquet('{base}/linked_triples/*.parquet')
          GROUP BY 1, 2, 3) t
        JOIN read_parquet('{base}/edges/*.parquet') e
          USING (src_entity_id, dst_entity_id, pred)
        WHERE t.c != e.weight OR t.mc != e.chunk_id""")[0]
    check("edge weight/provenance per key", bad == 0, f"{bad} mismatches")

    m = q(f"SELECT sum(mention_count) FROM read_parquet('{base}/entity_nodes/*.parquet')")[0]
    check("entity mention conservation", m == 2 * lt,
          f"sum(mention_count)={m} vs 2x linked={2 * lt}")

    tn = q(f"""
        SELECT count(*), sum(chunk_count)
        FROM read_parquet('{base}/term_nodes/*.parquet')""")
    truth = q(f"""
        SELECT count(*), count(DISTINCT (term, term_type, chunk_id))
        FROM (SELECT DISTINCT term, term_type, chunk_id
              FROM read_parquet('{base}/terms/*.parquet'))""")
    keys = q(f"""
        SELECT count(DISTINCT (term, term_type))
        FROM read_parquet('{base}/terms/*.parquet')""")[0]
    check("term_nodes row count", tn[0] == keys,
          f"rows={tn[0]} vs distinct keys={keys}")
    check("term_nodes chunk_count exactness", tn[1] == truth[0],
          f"sum(chunk_count)={tn[1]} vs distinct triples={truth[0]}")

    posbad = q(f"""
        SELECT count(*) FROM (
          SELECT chunk_id, term_type, count(*) n,
                 min(position) mn, max(position) mx
          FROM read_parquet('{base}/terms/*.parquet') GROUP BY 1, 2)
        WHERE mn != 0 OR mx != n - 1""")[0]
    check("term positions dense per (chunk, type)", posbad == 0,
          f"{posbad} non-dense groups")

    cv = q(f"""
        SELECT count(*), count(DISTINCT chunk_id)
        FROM read_parquet('{base}/chunk_vectors/*.parquet')""")
    ch = q(f"SELECT count(*) FROM read_parquet('{base}/chunks/*.parquet')")[0]
    check("chunk_vectors 1:1 with chunks",
          cv[0] == cv[1] == ch, f"vectors={cv[0]} distinct={cv[1]} chunks={ch}")

    print(f"FAILURES: {failures}")
    return failures


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else None
    if not base or not os.path.isdir(base):
        print(__doc__)
        sys.exit(2)
    sys.exit(1 if main(base.rstrip("/")) else 0)
