"""As-of join, rolling window, top-tokens, hash-sample operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from miekki_ray.stages.asof import asof_join
from miekki_ray.stages.windows import rolling_window


def _ts(s: str):
    return pd.Timestamp(s)


def _asof(left_df, right_df):
    left = ray.data.from_pandas(left_df)
    right = ray.data.from_pandas(right_df)
    return asof_join(
        left, right, key="user_id", left_ts="ts",
        right_key="o_custkey", right_ts="o_orderdate",
        left_cols={"event_id": pa.int64(), "value": pa.float64()},
        right_cols={"o_orderkey": pa.int64(),
                    "o_totalprice": pa.float64()},
        tie_col="o_orderkey", num_partitions=4,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)


def test_asof_picks_latest_at_or_before():
    left = pd.DataFrame({
        "event_id": [1, 2, 3],
        "user_id": [7, 7, 7],
        "ts": [_ts("2024-01-05"), _ts("2024-01-10"), _ts("2024-01-01")],
        "value": [1.0, 2.0, 3.0],
    })
    right = pd.DataFrame({
        "o_orderkey": [100, 101, 102],
        "o_custkey": [7, 7, 7],
        "o_orderdate": [_ts("2024-01-02"), _ts("2024-01-07"),
                        _ts("2024-02-01")],
        "o_totalprice": [10.0, 20.0, 30.0],
    })
    out = _asof(left, right)
    # event 3 (Jan 1) precedes every order -> dropped (matched-only)
    assert list(out["event_id"]) == [1, 2]
    assert list(out["o_orderkey"]) == [100, 101]
    assert out["o_orderkey"].dtype == np.int64


def test_asof_tie_breaks_to_max_orderkey():
    left = pd.DataFrame({
        "event_id": [1], "user_id": [7],
        "ts": [_ts("2024-01-05")], "value": [1.0]})
    right = pd.DataFrame({
        "o_orderkey": [102, 100, 101],
        "o_custkey": [7, 7, 7],
        "o_orderdate": [_ts("2024-01-03")] * 3,
        "o_totalprice": [1.0, 2.0, 3.0],
    })
    out = _asof(left, right)
    assert list(out["o_orderkey"]) == [102]


def test_asof_keys_partition_independently():
    # keys landing in different hash partitions never cross-match
    left = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [1, 2],
        "ts": [_ts("2024-01-05")] * 2,
        "value": [1.0, 2.0],
    })
    right = pd.DataFrame({
        "o_orderkey": [100],
        "o_custkey": [1],
        "o_orderdate": [_ts("2024-01-01")],
        "o_totalprice": [10.0],
    })
    out = _asof(left, right)
    assert list(out["event_id"]) == [1]


def test_rolling_window_matches_pandas():
    rng = np.random.default_rng(7)
    n = 200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 5, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "value": rng.random(n) * 100,
    })
    out = rolling_window(ray.data.from_pandas(df), window=3,
                         num_partitions=3).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts", "event_id"])
    ref_roll = (ref.groupby("user_id")["value"]
                .rolling(3, min_periods=1).sum()
                .reset_index(level=0, drop=True))
    ref_n = (ref.groupby("user_id")["value"]
             .rolling(3, min_periods=1).count()
             .reset_index(level=0, drop=True))
    ref = ref.assign(roll_sum=ref_roll, roll_n=ref_n) \
        .sort_values("event_id").reset_index(drop=True)
    assert np.allclose(out["roll_sum"], ref["roll_sum"], atol=1e-6)
    assert np.allclose(out["roll_avg"],
                       ref["roll_sum"] / ref["roll_n"], atol=1e-6)


def test_top_tokens_combiner_equals_global_count():
    docs = ["a b b", "b c", "a a a", "c"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": docs}))
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(dtype=np.int64)})

    out = (ds.repartition(3).map_batches(partial, batch_format="pandas")
           .groupby("token").aggregate(Sum("n", alias_name="n"))
           .to_pandas().set_index("token")["n"].to_dict())
    assert out == {"a": 4, "b": 3, "c": 2}


def test_hash_sample_deterministic():
    import hashlib

    ids = [i for i in range(1000)
           if hashlib.md5(str(i).encode()).hexdigest()[0] == "0"]
    # 1/16 expected rate, fixed forever
    assert 30 <= len(ids) <= 95
    again = [i for i in range(1000)
             if hashlib.md5(str(i).encode()).hexdigest()[0] == "0"]
    assert ids == again


def test_running_sum_matches_pandas_cumsum():
    from miekki_ray.stages.windows import running_sum

    rng = np.random.default_rng(11)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "value": rng.random(n) * 100,
    })
    out = running_sum(ray.data.from_pandas(df), num_partitions=3) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts", "event_id"])
    ref = ref.assign(
        run_sum=ref.groupby("user_id")["value"].cumsum(),
        run_n=ref.groupby("user_id").cumcount() + 1,
    ).sort_values("event_id").reset_index(drop=True)
    assert np.allclose(out["run_sum"], ref["run_sum"], atol=1e-6)
    assert list(out["run_n"]) == list(ref["run_n"])


def test_ntile_tile_sizes_match_sql_semantics():
    from miekki_ray.stages.windows import ntile_tiles

    # 10 rows, k=4 -> tile sizes 3,3,2,2 (first n%k tiles get one extra)
    df = pd.DataFrame({
        "event_id": np.arange(10, dtype=np.int64),
        "event_type": ["a"] * 10,
        "value": np.arange(10, dtype=np.float64),
    })
    out = ntile_tiles(ray.data.from_pandas(df), k=4, num_partitions=2) \
        .to_pandas().sort_values("tile").reset_index(drop=True)
    assert list(out["tile"]) == [1, 2, 3, 4]
    assert list(out["n"]) == [3, 3, 2, 2]
    assert list(out["min_v"]) == [0.0, 3.0, 6.0, 8.0]
    assert list(out["max_v"]) == [2.0, 5.0, 7.0, 9.0]
