"""Driver-mimic oracle parity for the closing-session queries: each
runs at sf0.001 and must match its own oracle_sql() in DuckDB
(row count + sorted-column value equality), the comparison the graft
driver applies."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

NEW_ORACLED = [
    "events_gap_sessions",
    "events_session_ids",
    "events_session_error_windows",
    "events_session_conversions",
    "events_late_arrivals",
    "docs_reservoir_per_source",
    "docs_weighted_sample_per_source",
    "lineitem_price_winsorized",
    "docs_novelty_by_batch",
    "docs_skipgram_pairs",
    "docs_skipgram_negatives",
    "embedding_hard_negatives",
    "embedding_dim_truncation_recall",
    "embedding_knn_ndcg",
    "docs_readability",
    "docs_lang_temperature_weights",
    "customer_rfm_segments",
    "docs_containment_pairs",
    "events_burstiness",
    "docs_trigram_entropy",
    "events_interarrival_quantiles",
    "docs_hapax_ratio",
    "docs_mixing_schedule",
    "docs_type_token_ratio",
    "orders_mom_growth",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", NEW_ORACLED)
def test_matches_oracle(ray_session, oracle_con, name):
    import __ray_entry__ as E

    got = _canon(E.queries()[name](SF).to_pandas())
    want = _canon(oracle_con.sql(E.oracle_sql()[name]).df())
    assert len(got) == len(want), (len(got), len(want))
    assert list(got.columns) == list(want.columns)
    if len(got):
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=False, rtol=1e-9)
