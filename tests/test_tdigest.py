"""t-digest: accuracy bounds, merge associativity, distributed paths."""

import numpy as np
import pandas as pd
import ray.data

from miekki_ray.functions.tdigest import (approx_quantiles, from_values,
                                          grouped_approx_quantiles, merge,
                                          quantile)


def test_single_digest_accuracy():
    rng = np.random.default_rng(2)
    v = rng.lognormal(0, 1, 200_000)
    dig = from_values(v)
    got = quantile(dig, np.array([0.5, 0.9, 0.99]))
    want = np.quantile(v, [0.5, 0.9, 0.99])
    rel = np.abs(got - want) / want
    assert (rel < 0.02).all(), (got, want)
    # digest stays small no matter the input size
    assert dig[0].size < 300


def test_merge_of_shards_matches_whole():
    rng = np.random.default_rng(7)
    v = rng.normal(100, 15, 90_000)
    shards = np.array_split(v, 13)
    dig = (np.empty(0), np.empty(0))
    for s in shards:
        dig = merge(dig, from_values(s))
    got = quantile(dig, np.array([0.1, 0.5, 0.9]))
    want = np.quantile(v, [0.1, 0.5, 0.9])
    assert np.abs(got - want).max() < 0.5  # ~0.03 sigma
    assert float(dig[1].sum()) == 90_000.0  # counts conserved exactly


def test_distributed_global_quantiles():
    rng = np.random.default_rng(4)
    v = rng.random(50_000) * 1000
    ds = ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(11)
    got = approx_quantiles(ds, "value", qs=(0.5, 0.99))
    want = np.quantile(v, [0.5, 0.99])
    assert np.abs(got - want).max() < 10.0, (got, want)


def test_grouped_digests_per_key():
    rng = np.random.default_rng(6)
    n = 40_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "value": rng.random(n) * 100,
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = grouped_approx_quantiles(ds, "k", "value") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out.columns) == ["k", "p50", "p90", "p99"]
    for _, row in out.iterrows():
        v = df[df["k"] == row["k"]]["value"].to_numpy()
        want = np.quantile(v, [0.5, 0.9, 0.99])
        got = row[["p50", "p90", "p99"]].to_numpy(dtype=np.float64)
        assert np.abs(got - want).max() < 2.0, (row["k"], got, want)


def test_quantile_column_names_tail_safe():
    # r4 review: q >= 0.995 used to round to 'p100' (mislabeled AND
    # duplicated, crashing the Arrow block conversion)
    from miekki_ray.functions.tdigest import _q_name

    assert [_q_name(q) for q in (0.5, 0.9, 0.99)] == ["p50", "p90", "p99"]
    assert _q_name(0.995) == "p99_5"
    assert _q_name(0.999) == "p99_9"
    assert _q_name(0.29) == "p29"          # inexact float product
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 5000),
                       "value": rng.random(5000) * 100})
    out = grouped_approx_quantiles(ray.data.from_pandas(df).repartition(3),
                                   "k", "value", qs=(0.995, 0.999)) \
        .to_pandas()
    assert list(out.columns) == ["k", "p99_5", "p99_9"]


def test_quantile_column_names_precision_safe():
    # r4 second review: '%g' keeps 6 significant digits, so close
    # fractional quantiles collapsed to the SAME name (the duplicate-
    # column Arrow crash again) and tiny ones went scientific
    from miekki_ray.functions.tdigest import _q_name

    a, b = _q_name(0.1234567), _q_name(0.1234568)
    assert a != b, (a, b)
    assert a == "p12_34567" and b == "p12_34568"
    assert _q_name(1e-5) == "p0_001"       # no 'p1e-05'
    assert _q_name(0.12345678) == _q_name(0.123456784)  # 6dp round, stable
