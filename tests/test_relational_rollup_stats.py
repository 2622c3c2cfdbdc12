"""Rollup / moment-stats / pivot operators vs in-process DuckDB oracles
on a small synthetic frame (the sf-dir queries get the same treatment from
tools/check_correctness.py; these tests pin the semantics standalone)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(5)
    n = 2000
    return pd.DataFrame({
        "event_type": rng.choice(["click", "view", "purchase"], n),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "value": np.round(rng.random(n) * 100, 3),
    })


def test_stats_partials_match_duckdb(events_df, tmp_path):
    from miekki_ray import relational as R

    p = tmp_path / "events.parquet"
    events_df.to_parquet(p)
    out = R.events_stats_by_type(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT event_type, COUNT(*) AS n,
               ROUND(AVG(value), 6) AS avg_value,
               ROUND(STDDEV_POP(value), 6) AS stddev_value,
               ROUND(CORR(value, user_id), 6) AS corr_value_user
        FROM read_parquet('{p}') GROUP BY event_type ORDER BY event_type
    """).df()
    assert list(out["event_type"]) == list(want["event_type"])
    assert list(out["n"]) == list(want["n"])
    for c in ("avg_value", "stddev_value", "corr_value_user"):
        assert np.allclose(out[c], want[c], atol=2e-6), c


def test_pivot_matches_duckdb(events_df, tmp_path):
    from miekki_ray import relational as R

    p = tmp_path / "events.parquet"
    events_df.to_parquet(p)
    out = R.events_pivot_by_type(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT user_id,
               ROUND(COALESCE(SUM(value) FILTER (event_type='click'),0),6)
                 AS sum_click,
               ROUND(COALESCE(SUM(value) FILTER (event_type='purchase'),0),6)
                 AS sum_purchase,
               ROUND(COALESCE(SUM(value) FILTER (event_type='view'),0),6)
                 AS sum_view
        FROM read_parquet('{p}') GROUP BY user_id ORDER BY user_id
    """).df()
    assert list(out["user_id"]) == list(want["user_id"])
    for c in ("sum_click", "sum_purchase", "sum_view"):
        assert np.allclose(out[c], want[c], atol=2e-6), c
    # types never seen in the frame still appear, all-zero
    assert float(out["sum_error"].abs().sum()) == 0.0
    assert float(out["sum_signup"].abs().sum()) == 0.0


def test_rollup_levels_and_nulls(tmp_path):
    from miekki_ray import relational as R

    df = pd.DataFrame({
        "l_returnflag": ["A", "A", "N", "N", "N"],
        "l_linestatus": ["F", "O", "F", "F", "O"],
        "l_quantity": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    df.to_parquet(tmp_path / "lineitem.parquet")
    out = R.lineitem_rollup(str(tmp_path)).to_pandas()
    # 4 finest groups + 2 per-flag subtotals + grand total
    assert len(out) == 7
    grand = out[out["l_returnflag"].isna()]
    assert len(grand) == 1
    assert float(grand["sum_qty"].iloc[0]) == 31.0
    assert int(grand["n"].iloc[0]) == 5
    sub_n = out[(out["l_returnflag"] == "N") & out["l_linestatus"].isna()]
    assert float(sub_n["sum_qty"].iloc[0]) == 28.0
    assert int(sub_n["n"].iloc[0]) == 3
