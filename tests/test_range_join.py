"""Range (interval) join: count/sum right rows in (left_ts, left_ts+W]."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from miekki_ray.stages.range_join import range_join_agg

MIN = 60 * 1_000_000  # one minute in microseconds


def _run(left_df, right_df, hi_us=10 * MIN, num_partitions=4):
    return range_join_agg(
        ray.data.from_pandas(left_df), ray.data.from_pandas(right_df),
        key="user_id", left_ts="ts", right_key="user_id", right_ts="ts",
        lo_us=0, hi_us=hi_us,
        left_cols={"event_id": pa.int64()}, sum_col="value",
        num_partitions=num_partitions,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)


def test_range_join_bounds_strict_lo_inclusive_hi():
    base = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.int64(7),
        "ts": [base, base,                       # equal ts: excluded (>)
               base + pd.Timedelta(minutes=10),  # exactly +10m: included
               base + pd.Timedelta(minutes=10, microseconds=1)],  # out
        "value": [1.0, 2.0, 4.0, 8.0],
    })
    out = _run(df, df)
    # events 0 and 1 share a timestamp -> neither matches the other
    assert list(out["n_matched"]) == [1, 1, 1, 0]
    assert list(out["sum_matched"]) == [4.0, 4.0, 8.0, 0.0]


def test_range_join_keys_isolated_and_zero_match_rows_kept():
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "event_id": [1, 2], "user_id": [1, 2],
        "ts": [base, base], "value": [1.0, 1.0]})
    right = pd.DataFrame({
        "event_id": [3], "user_id": [1],
        "ts": [base + pd.Timedelta(minutes=5)], "value": [9.0]})
    out = _run(left, right)
    assert list(out["n_matched"]) == [1, 0]   # user 2 kept with 0
    assert list(out["sum_matched"]) == [9.0, 0.0]
    assert out["event_id"].dtype == np.int64


def test_range_join_matches_bruteforce():
    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 6, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 3600, n), unit="s"),
        "value": np.round(rng.random(n) * 10, 3),
    })
    out = _run(df, df, hi_us=10 * MIN, num_partitions=3)
    t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    exp_n, exp_s = [], []
    for i in range(n):
        m = ((df["user_id"].to_numpy() == df["user_id"].iloc[i])
             & (t > t[i]) & (t <= t[i] + 10 * MIN))
        exp_n.append(int(m.sum()))
        exp_s.append(round(float(df["value"].to_numpy()[m].sum()), 6))
    assert list(out["n_matched"]) == exp_n
    assert np.allclose(out["sum_matched"], exp_s, atol=1e-6)


def test_range_join_null_left_int_payload():
    # r4 review: a NULL left int payload crashed the final astype('int64')
    # — the exact case pandas_nullable_ints documents. One output row per
    # LEFT row, the null carried through as a masked null.
    base = pd.Timestamp("2024-01-01 00:00:00")
    left = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts": [base, base + pd.Timedelta(minutes=1), base],
        "event_id": pd.array([10, pd.NA, 30], dtype="Int64"),
    })
    right = pd.DataFrame({
        "user_id": [1, 2],
        "ts": [base + pd.Timedelta(minutes=2)] * 2,
        "value": [1.5, 2.5],
    })
    out = range_join_agg(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="user_id", left_ts="ts", right_key="user_id", right_ts="ts",
        lo_us=0, hi_us=10 * MIN, left_cols={"event_id": pa.int64()},
        sum_col="value", num_partitions=2,
    ).to_pandas()
    assert len(out) == 3                      # one row per LEFT row
    assert out["event_id"].isna().sum() == 1
    got = out.dropna(subset=["event_id"]).set_index("event_id")["n_matched"]
    assert got.to_dict() == {10: 1, 30: 1}
