"""Merging t-digest — mergeable approximate quantiles (Dunning &
Ertl, 2019, public algorithm). The scale path for per-key quantiles when
a key's rows no longer fit one partition (relational.events_value_
quantiles documents exactly that caveat): per-block digests are a few KB
regardless of row count, merge associatively, and the driver receives
one digest per key instead of the key's rows.

Representation: (means, counts) float64 arrays sorted by mean, compressed
so each centroid's quantile width respects the k1 scale function (finer
resolution at the tails — the t-digest's defining property).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import AggregateFn

DELTA = 200  # compression: max centroids ~ DELTA, error ~ O(q(1-q)/DELTA)


def _k1(q: np.ndarray, d: float) -> np.ndarray:
    """The k1 scale function: arcsine — tails get more centroids."""
    return (d / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0, 1) - 1.0)


def compress(means: np.ndarray, counts: np.ndarray, d: float = DELTA
             ) -> tuple[np.ndarray, np.ndarray]:
    """Merge adjacent (sorted-by-mean) centroids greedily while the merged
    centroid's k-width stays ≤ 1 — the standard merging-digest pass."""
    if means.size == 0:
        return means, counts
    order = np.argsort(means, kind="mergesort")
    means, counts = means[order], counts[order]
    total = counts.sum()
    out_m, out_c = [], []
    cur_m, cur_c = means[0], counts[0]
    q0 = 0.0
    for i in range(1, means.size):
        q_new = q0 + (cur_c + counts[i]) / total
        if _k1(np.array([q_new]), d)[0] - _k1(np.array([q0]), d)[0] <= 1.0:
            cur_m = (cur_m * cur_c + means[i] * counts[i]) \
                / (cur_c + counts[i])
            cur_c += counts[i]
        else:
            out_m.append(cur_m)
            out_c.append(cur_c)
            q0 += cur_c / total
            cur_m, cur_c = means[i], counts[i]
    out_m.append(cur_m)
    out_c.append(cur_c)
    return np.asarray(out_m), np.asarray(out_c, dtype=np.float64)


def from_values(values: np.ndarray, d: float = DELTA
                ) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    return compress(v, np.ones(v.size), d)


def merge(a: tuple[np.ndarray, np.ndarray],
          b: tuple[np.ndarray, np.ndarray], d: float = DELTA
          ) -> tuple[np.ndarray, np.ndarray]:
    return compress(np.concatenate([a[0], b[0]]),
                    np.concatenate([a[1], b[1]]), d)


def quantile(digest: tuple[np.ndarray, np.ndarray],
             qs: np.ndarray) -> np.ndarray:
    """Interpolated quantiles from centroid midpoint ranks."""
    means, counts = digest
    if means.size == 0:
        return np.full(np.asarray(qs).size, np.nan)
    total = counts.sum()
    cum = np.cumsum(counts) - counts / 2.0  # centroid midpoint ranks
    ranks = np.asarray(qs, dtype=np.float64) * total
    return np.interp(ranks, cum, means)


def approx_quantiles(ds: ray.data.Dataset, value_col: str,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     d: float = DELTA) -> np.ndarray:
    """Distributed global quantiles: per-block digests, associative merge
    tree, one small digest to the driver."""
    def acc(block) -> tuple[np.ndarray, np.ndarray]:
        tbl = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block)
        return from_values(tbl[value_col].to_numpy(zero_copy_only=False), d)

    agg = AggregateFn(
        init=lambda _: (np.empty(0), np.empty(0)),
        accumulate_block=lambda a, b: merge(a, acc(b), d),
        merge=lambda a, b: merge(a, b, d),
        name="tdigest")
    return quantile(ds.aggregate(agg)["tdigest"], np.asarray(qs))


def _q_name(q: float) -> str:
    """Quantile -> column name: p50, p90, p99 for integral percents
    (round, don't truncate: int(0.29*100) == 28 from the inexact float
    product), p99_5 / p99_9 for fractional ones — naming every q>=0.995
    'p100' both mislabels the tail quantile and produces DUPLICATE
    column names that crash the Arrow block conversion (r4 review)."""
    pct = round(q * 100, 6)
    if pct == int(pct):
        return f"p{int(pct)}"
    # fixed-point, NOT "%g": %g keeps only 6 significant digits, so
    # close fractional quantiles (12.34567 vs 12.34568) collapsed to the
    # same name — the duplicate-column crash this helper exists to
    # prevent — and sub-1e-5 percents went scientific ("p1e-05")
    return "p" + f"{pct:.6f}".rstrip("0").rstrip(".").replace(".", "_")


def grouped_approx_quantiles(ds: ray.data.Dataset, key: str,
                             value_col: str,
                             qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                             d: float = DELTA) -> pd.DataFrame:
    """Per-key approximate quantiles with the combiner idiom: each batch
    emits one serialized digest row per key (bounded size), a grouped
    map_groups merges digests per key, and only (key, digest-quantiles)
    rows ever cross the wire — the per-key row volume never does."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in batch.groupby(key, sort=False):
            m, c = from_values(grp[value_col].to_numpy(), d)
            rows.append((k, m.tobytes(), c.tobytes()))
        return pd.DataFrame(rows, columns=[key, "_m", "_c"])

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, grp in g.groupby(key, sort=False):
            dig = (np.empty(0), np.empty(0))
            for mb, cb in zip(grp["_m"], grp["_c"]):
                dig = merge(dig, (np.frombuffer(mb), np.frombuffer(cb)), d)
            out.append((k, *np.round(quantile(dig, np.asarray(qs)), 6)))
        cols = [key] + [_q_name(q) for q in qs]
        return pd.DataFrame(out, columns=cols)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(key).map_groups(reduce_group, batch_format="pandas"))
