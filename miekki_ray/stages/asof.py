"""As-of join (point-in-time lookup) — an operator Ray Data lacks.

For each left row, find the single right row with the same key and the
greatest right timestamp <= the left row's timestamp; ties on the right
timestamp break toward the greatest ``tie_col`` value, so the result is
fully deterministic and matches a SQL ``row_number() OVER (PARTITION BY
left_row ORDER BY right_ts DESC, tie_col DESC) = 1`` oracle.

Rendering (SURVEY.md §2.4 custom-operator rule): both sides are
hash-partitioned on the join key into one shared partition space — each
side is tagged, unioned, and shuffled ONCE by ``groupby(_part)`` — then
every partition runs a single vectorized ``pandas.merge_asof``. At scale
this moves each side exactly once (same cost as any keyed join), never
builds a cross product, and per-partition memory is bounded by the
partition's rows; key skew is bounded by the hot key's own row count,
as for any keyed window.

``pandas.merge_asof`` resolves duplicate right timestamps by taking the
LAST matching row of the sorted right frame, so sorting the right side by
(ts, tie_col) ascending yields the max-tie_col row — the documented
contract above.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              key: str, left_ts: str,
              right_key: str, right_ts: str,
              left_cols: dict[str, pa.DataType],
              right_cols: dict[str, pa.DataType],
              tie_col: str,
              num_partitions: int = 32) -> ray.data.Dataset:
    """Backward as-of join. ``left_cols`` / ``right_cols`` map payload
    column name -> Arrow type (the union of side-tagged blocks needs one
    fixed schema; the other side carries typed nulls). Output columns:
    key, left_ts, *left_cols, *right_cols — one row per MATCHED left row
    (left rows with no qualifying right row are dropped)."""
    P = num_partitions
    lnames, rnames = list(left_cols), list(right_cols)
    out_schema = pa.schema(
        [("_key", pa.int64()), ("_ts", pa.timestamp("us"))]
        + [(c, t) for c, t in left_cols.items()]
        + [(c, t) for c, t in right_cols.items()])

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
            for c, t in right_cols.items():
                cols[c] = batch[c].cast(t) if side == 1 else pa.nulls(n, t)
            part = (np.asarray(cols["_key"]) % P).astype(np.int32)
            cols["_part"] = pa.array(part, type=pa.int32())
            return pa.table(cols)
        return f

    lt = left.map_batches(_tag(0, key, left_ts), batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.map_batches(_tag(1, right_key, right_ts),
                           batch_format="pyarrow", zero_copy_batch=True)

    def merge(grp: pa.Table) -> pa.Table:
        # nullable-int-preserving conversion: the side-tagged union gives
        # every int payload column typed nulls, and the default pandas
        # conversion would take them through float64 (crash on a null
        # matched payload, silent corruption above 2^53)
        from miekki_ray.functions.util import pandas_nullable_ints
        group = pandas_nullable_ints(grp)
        l_ = group[group["_side"] == 0]
        if len(l_) == 0:
            return out_schema.empty_table()
        r_ = group[group["_side"] == 1]
        ls = l_.sort_values("_ts", kind="mergesort")[["_key", "_ts"]
                                                     + lnames]
        rs = r_.sort_values(["_ts", tie_col], kind="mergesort")[
            ["_key", "_ts"] + rnames]
        # plain int64 keys: merge_asof's `by=` predates masked dtypes,
        # and keys are never null
        ls = ls.assign(_key=ls["_key"].astype("int64"))
        rs = rs.assign(_key=rs["_key"].astype("int64"))
        # explicit match indicator: the right ts is non-null IFF matched
        # (a matched row's PAYLOAD column may be legitimately null)
        rs = rs.assign(_rmatch=rs["_ts"])
        m = pd.merge_asof(ls, rs, on="_ts", by="_key",
                          direction="backward")
        m = m.dropna(subset=["_rmatch"])
        return pa.Table.from_pandas(
            m[list(out_schema.names)], preserve_index=False) \
            .cast(out_schema).replace_schema_metadata(None)

    out = (lt.union(rt)
           .groupby("_part").map_groups(merge, batch_format="pyarrow"))
    from miekki_ray.functions.util import rename
    return rename(out, {"_key": key, "_ts": left_ts})
