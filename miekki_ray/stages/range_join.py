"""Range (interval) join — an operator Ray Data lacks.

For each left row, aggregate the right rows that share an equality key and
whose timestamp falls in the window ``(left_ts + lo, left_ts + hi]``
(strict lower bound, inclusive upper — the exact semantics of a SQL
``b.ts > a.ts + lo AND b.ts <= a.ts + hi`` predicate). Emits one output
row per LEFT row (zero-match left rows keep count 0 / sum 0), i.e. the
LEFT JOIN + GROUP BY rendering, which keeps the oracle one SQL statement.

Rendering (SURVEY.md §2.4 custom-operator rule, same shape as
stages/asof.py): both sides are hash-partitioned on the equality key into
one shared partition space — tagged, unioned, shuffled ONCE by
``groupby(_part)`` — then each partition aggregates with two vectorized
``np.searchsorted`` probes per key segment (counts = index difference,
sums = prefix-sum difference). Never builds the match cross-product, so a
left row with a million in-window right rows costs O(log n), not O(n);
per-partition memory is bounded by the partition's rows and key skew by
the hot key's own row count, as for any keyed window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def range_join_agg(left: ray.data.Dataset, right: ray.data.Dataset, *,
                   key: str, left_ts: str,
                   right_key: str, right_ts: str,
                   lo_us: int, hi_us: int,
                   left_cols: dict[str, pa.DataType],
                   sum_col: str | None = None,
                   num_partitions: int = 32) -> ray.data.Dataset:
    """Count (and optionally sum ``sum_col`` over) right rows with
    ``right_key == key`` and ``right_ts`` in ``(left_ts+lo_us,
    left_ts+hi_us]`` microseconds. Output columns: key, left_ts,
    *left_cols, n_matched:int64 [, sum_matched:float64]."""
    P = num_partitions
    lnames = list(left_cols)
    int_out = [c for c, t in left_cols.items() if pa.types.is_integer(t)]

    def _tag(side: int, key_col: str, ts_col: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "_key": batch[key_col].cast(pa.int64()),
                "_ts": batch[ts_col].cast(pa.timestamp("us")),
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for c, t in left_cols.items():
                cols[c] = batch[c].cast(t) if side == 0 else pa.nulls(n, t)
            if sum_col is not None:
                cols["_val"] = (batch[sum_col].cast(pa.float64())
                                if side == 1 else pa.nulls(n, pa.float64()))
            part = (np.asarray(cols["_key"]) % P).astype(np.int32)
            cols["_part"] = pa.array(part, type=pa.int32())
            return pa.table(cols)
        return f

    lt = left.map_batches(_tag(0, key, left_ts), batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.map_batches(_tag(1, right_key, right_ts),
                           batch_format="pyarrow", zero_copy_batch=True)

    out_cols = ["_key", "_ts"] + lnames + ["n_matched"] \
        + (["sum_matched"] if sum_col is not None else [])

    def agg(grp: pa.Table) -> pa.Table:
        # nullable-int-preserving conversion (see asof.merge): int payload
        # values above 2^53 must not round-trip through float64
        from miekki_ray.functions.util import pa_from_pandas, \
            pandas_nullable_ints
        group = pandas_nullable_ints(grp)
        l_ = group[group["_side"] == 0]
        r_ = group[group["_side"] == 1].sort_values(
            ["_key", "_ts"], kind="mergesort")
        r_keys = r_["_key"].to_numpy(dtype=np.int64)
        r_ts = r_["_ts"].to_numpy(dtype="datetime64[us]") \
            .view(np.int64)
        if sum_col is not None:
            r_psum = np.concatenate(
                [[0.0], np.cumsum(r_["_val"].to_numpy(dtype=np.float64))])
        # right-side key segments (keys sorted within the partition)
        seg_keys, seg_starts = np.unique(r_keys, return_index=True)
        seg_ends = np.append(seg_starts[1:], len(r_keys))

        l_ = l_.sort_values("_key", kind="mergesort")
        l_keys = l_["_key"].to_numpy(dtype=np.int64)
        l_ts = l_["_ts"].to_numpy(dtype="datetime64[us]").view(np.int64)
        n = len(l_)
        counts = np.zeros(n, dtype=np.int64)
        sums = np.zeros(n, dtype=np.float64)
        # left rows per key are contiguous (l_ sorted by _key), so segment
        # both sides and assign by slice — O(n log n) total, never a
        # full-length mask per key
        l_seg_keys, l_starts = np.unique(l_keys, return_index=True)
        l_ends = np.append(l_starts[1:], n)
        seg_of = np.searchsorted(seg_keys, l_seg_keys)
        valid = seg_of < len(seg_keys)
        valid[valid] &= seg_keys[seg_of[valid]] == l_seg_keys[valid]
        for j in np.flatnonzero(valid):
            s = seg_of[j]
            sl = slice(l_starts[j], l_ends[j])
            a, b = seg_starts[s], seg_ends[s]
            ts_seg = r_ts[a:b]
            lo_idx = np.searchsorted(ts_seg, l_ts[sl] + lo_us,
                                     side="right")
            hi_idx = np.searchsorted(ts_seg, l_ts[sl] + hi_us,
                                     side="right")
            counts[sl] = hi_idx - lo_idx
            if sum_col is not None:
                sums[sl] = (r_psum[a + hi_idx] - r_psum[a + lo_idx])
        res = l_[["_key", "_ts"] + lnames].copy()
        res["n_matched"] = counts
        if sum_col is not None:
            from miekki_ray.functions.textstats import \
                round_half_away
            res["sum_matched"] = round_half_away(sums, 6)
        for c in int_out:
            # downcast Int64 -> int64 only when null-free: a genuinely
            # null left payload value must stay a masked null (astype
            # raises on NA — the exact crash pandas_nullable_ints exists
            # to prevent); Arrow renders both as int64, nulls preserved
            if not res[c].isna().any():
                res[c] = res[c].astype("int64")
        return pa_from_pandas(res[out_cols])

    out = (lt.union(rt)
           .groupby("_part").map_groups(agg, batch_format="pyarrow"))
    from miekki_ray.functions.util import rename
    return rename(out, {"_key": key, "_ts": left_ts})
