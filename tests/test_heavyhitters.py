"""Misra–Gries approximate top-k: error bound + guaranteed-survivor
properties vs exact counts, on a skewed synthetic corpus and the sf
documents table."""

import numpy as np
import pandas as pd
import ray.data

from miekki_ray.functions.heavyhitters import approx_top_tokens

SF = "/root/testdata/sf0.001"


def _skewed_corpus(seed=0, n_docs=400):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(1000)]
    heavy = ["alpha", "beta", "gamma"]
    docs = []
    for _ in range(n_docs):
        words = list(rng.choice(vocab, size=30))
        words += heavy * int(rng.integers(3, 8))  # heavy tokens dominate
        rng.shuffle(words)
        docs.append(" ".join(words))
    return pd.DataFrame({"text": docs})


def _exact_counts(df):
    return df["text"].str.split().explode().value_counts()


def test_mg_bounds_and_heavy_survivors():
    df = _skewed_corpus()
    ds = ray.data.from_pandas(df).repartition(8)
    got = approx_top_tokens(ds, k=10, capacity=128)
    exact = _exact_counts(df)
    n = int(exact.sum())
    err = n // (128 + 1)
    assert (got["err_max"] == err).all()
    # every token with true count > 2n/(C+1) must be present
    must = set(exact[exact > 2 * err].index)
    assert must <= set(got["token"])
    # count_min is a lower bound and within err of the truth
    for _, r in got.iterrows():
        true = int(exact.get(r["token"], 0))
        assert r["count_min"] <= true <= r["count_min"] + err


def test_mg_matches_exact_topk_on_documents():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["text"])
    got = approx_top_tokens(ds, k=20, capacity=512)
    exact = _exact_counts(
        pd.read_parquet(f"{SF}/documents.parquet", columns=["text"]))
    # same deterministic tie-break as the operator: (-count, token)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    # sf vocabulary is tiny (~30 words) << capacity: MG is exact here
    assert list(got["token"]) == [t for t, _ in want]
    assert list(got["count_min"]) == [c for _, c in want]
