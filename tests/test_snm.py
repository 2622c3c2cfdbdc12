"""Sorted-neighborhood candidates (stages/snm.py): exactness vs a local
rank self-join oracle, cross-band boundary pairs under a tiny band size,
key ties, window edges, empty input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.stages.snm import snm_pairs


def _oracle(df: pd.DataFrame, w: int) -> set:
    r = df.sort_values(["key", "doc_id"]).reset_index(drop=True)
    out = set()
    ids = r["doc_id"].to_numpy()
    for i in range(len(ids)):
        for j in range(i + 1, min(i + w, len(ids))):
            out.add((min(ids[i], ids[j]), max(ids[i], ids[j]), j - i))
    return out


def _ds(df: pd.DataFrame, blocks: int = 3) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
        "key": pa.array(df["key"], type=pa.string()),
    })).repartition(blocks)


def test_snm_matches_rank_self_join_oracle():
    rng = np.random.default_rng(4)
    n = 200
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        # duplicated keys exercise the (key, doc_id) tie-break
        "key": [f"k{rng.integers(0, 80):03d}" for _ in range(n)],
    })
    for w in (2, 5, 10):
        got = snm_pairs(_ds(df), window=w, num_partitions=5) \
            .to_pandas()
        got_set = set(map(tuple, got[["a", "b", "gap"]].to_numpy()))
        assert got_set == _oracle(df, w), f"window {w}"


def test_snm_cross_band_pairs_tiny_band():
    """band_size barely above the window forces MANY band boundaries —
    every boundary-straddling pair must still appear exactly once."""
    n = 120
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "key": [f"{i:04d}" for i in range(n)],    # fully ordered keys
    })
    w = 7
    got = snm_pairs(_ds(df, blocks=4), window=w, num_partitions=6,
                    band_size=w).to_pandas()
    got_list = list(map(tuple, got[["a", "b", "gap"]].to_numpy()))
    assert len(got_list) == len(set(got_list))     # exactly-once
    assert set(got_list) == _oracle(df, w)


def test_snm_validation_and_empty():
    df = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                       "key": pd.Series([], dtype=str)})
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "key": pa.array([], type=pa.string())}))
    assert snm_pairs(empty, window=3).count() == 0
    some = _ds(pd.DataFrame({"doc_id": [1, 2], "key": ["a", "b"]}), 1)
    with pytest.raises(ValueError, match="window"):
        snm_pairs(some, window=1)
    with pytest.raises(ValueError, match="band"):
        snm_pairs(some, window=5, band_size=3)
