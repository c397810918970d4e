"""Driver-mimic: run entry(), every queries() callable, and compare each
against oracle_sql() via DuckDB (row count + order-insensitive value
comparison), the way the graft driver does. Usage:

    python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    t0 = time.time()
    res = E.entry()
    n = res.count() if hasattr(res, "count") else len(res)
    print(f"entry(): {n} rows in {time.time()-t0:.1f}s")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"RAY ERROR {type(e).__name__}: {e}"))
            print(f"  {name}: RAY ERROR {e}")
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"  {name}: rows-only {len(got)} rows ({dt:.1f}s)")
            continue
        want = canon(con.sql(sqls[name]).df())
        status = "OK"
        if len(got) != len(want):
            status = f"ROWCOUNT {len(got)} vs {len(want)}"
        elif list(got.columns) != list(want.columns):
            status = f"COLS {list(got.columns)} vs {list(want.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False, rtol=1e-9
                )
            except AssertionError as e:
                status = "VALUES differ: " + str(e).split("\n")[0]
        if status != "OK":
            failures.append((name, status))
        print(f"  {name}: {status} ({len(got)} rows, {dt:.1f}s)")

    # Cross-table invariant audit of the KG checkpoints this run built
    # (VERDICT r4 task 7): the conservation-law class of check that
    # caught the r4 term_nodes chunk_count overcount — no SQL oracle
    # covers combiner bugs that only fire at batch boundaries, so the
    # audit is part of every contract run, not a one-off.
    from check_invariants import main as invariants_main

    kg_dir = E._kg_dir(sf_dir)
    if os.path.isdir(kg_dir):
        print(f"\ninvariant audit of {kg_dir}:")
        inv_failures = invariants_main(kg_dir)
        if inv_failures:
            failures.append(("kg_invariants", f"{inv_failures} violations"))
    else:
        print(f"\ninvariant audit skipped: {kg_dir} not built this run")

    print("\nFAILURES:", len(failures))
    for name, why in failures:
        print(" ", name, "->", why[:300])
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
