"""Misra–Gries heavy hitters: approximate top-k tokens with a bounded,
mergeable summary — the constant-traffic scale path beside the exact
documents_top_tokens (relational.py), completing the mergeable-sketch
family (HLL count-distinct in functions/hll.py, t-digest quantiles in
functions/tdigest.py).

Per block: one vectorized tokenize + value_counts, folded into a
capacity-C counter summary. Summaries merge by counter addition followed
by the standard rank-(C+1) decrement (Agarwal et al., "Mergeability of
summaries", PODS 2012 [public]) — the merged summary keeps the
n/(C+1) error bound, so the exchange per block is O(C) regardless of
corpus size, and any token with true frequency > 2n/(C+1) is guaranteed
to survive (asserted in tests/test_heavyhitters.py against the exact
counts).

The summary is a plain dict plus the running token total; the driver
receives ONE dict of ≤C entries per merge-tree leaf — never a
corpus-sized token table (contrast the exact operator, whose grouped Sum
is a full token shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import AggregateFn


def _trim(counts: dict, capacity: int) -> dict:
    """Decrement by the (C+1)-th largest counter and drop non-positives —
    keeps ≤C entries while preserving the MG error guarantee."""
    if len(counts) <= capacity:
        return counts
    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # the (capacity+1)-th largest value is the decrement
    m = np.partition(vals, len(vals) - capacity - 1)[len(vals) - capacity - 1]
    return {t: c - m for t, c in counts.items() if c > m}


def _merge(a: tuple[dict, int], b: tuple[dict, int],
           capacity: int) -> tuple[dict, int]:
    ca, na = a
    cb, nb = b
    if len(ca) < len(cb):
        ca, cb = cb, ca
    out = dict(ca)
    for t, c in cb.items():
        out[t] = out.get(t, 0) + c
    return _trim(out, capacity), na + nb


def approx_top_tokens(docs: ray.data.Dataset, k: int = 20,
                      capacity: int = 256, text_col: str = "text"
                      ) -> pd.DataFrame:
    """Approximate corpus top-k whitespace tokens. Returns columns
    (token, count_min, err_max): count_min is the MG lower bound, the
    true count lies in [count_min, count_min + err_max] with
    err_max = total_tokens // (capacity + 1)."""

    import pickle

    # state travels as pickled bytes: a raw dict state is not
    # Arrow-convertible and would trip Ray's per-block
    # "falling back to pickled python objects" warning path
    EMPTY = pickle.dumps(({}, 0))

    def acc(state: bytes, block) -> bytes:
        tbl = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block)
        if tbl.num_rows == 0:
            return state
        s = tbl[text_col].to_pandas()
        from miekki_ray.functions.textstats import TOKEN_SPLIT_RE
        vc = (s.fillna("").str.findall(TOKEN_SPLIT_RE)
              .explode().dropna().value_counts())
        merged = _merge(pickle.loads(state),
                        (vc.to_dict(), int(vc.sum())), capacity)
        return pickle.dumps(merged)

    agg = AggregateFn(
        init=lambda _: EMPTY,
        accumulate_block=lambda st, b: acc(st, b),
        merge=lambda a, b: pickle.dumps(
            _merge(pickle.loads(a), pickle.loads(b), capacity)),
        name="mg")
    counts, total = pickle.loads(docs.aggregate(agg)["mg"])
    err = total // (capacity + 1)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame({
        "token": [t for t, _ in top],
        "count_min": np.array([c for _, c in top], dtype=np.int64),
        "err_max": np.int64(err),
    })
