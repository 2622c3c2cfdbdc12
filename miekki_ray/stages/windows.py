"""Stream-shaped aggregates over the events table (ray_guide
'Streaming-shaped workloads' pattern).

Ray Data has no event-time windows; tumbling windows over a keyed, ordered
log are expressed as `GROUP BY key, floor(ts/size)` — a plain grouped
aggregate that the DuckDB oracle can state exactly. Session windows need
per-key ordered scans: partition by key, sort within the group, split on
gaps — groupby(key-partition).map_groups with vectorized pandas inside
(the same coarse-partition idiom as the dedup stages).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from miekki_ray.functions.util import add_uint_part, str_part


def tumbling_window_counts(events: ray.data.Dataset, window_s: int
                           ) -> ray.data.Dataset:
    """Events per (event_type, tumbling window). Window = floor(epoch
    seconds / window_s) — matches the SQL oracle exactly."""
    def add_window(batch: pa.Table) -> pa.Table:
        # normalize to us regardless of the stored timestamp unit
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        w = pa.array(np.asarray(ts) // (window_s * 1_000_000),
                     type=pa.int64())
        return batch.append_column("w", w)

    return (events.map_batches(add_window, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["event_type", "w"])
            .aggregate(Count(alias_name="n"),
                       Sum("value", alias_name="sum_value")))


def hopping_window_counts(events: ray.data.Dataset, size_s: int,
                          hop_s: int) -> ray.data.Dataset:
    """Events per (event_type, HOPPING window): window w covers
    [w*hop, w*hop + size); each event lands in size/hop windows (size must
    be a multiple of hop). Expressed as a vectorized per-batch explode
    (np.repeat of size/hop window ids per event) + one grouped aggregate —
    the overlap factor multiplies rows BEFORE the shuffle, which is the
    standard rendering (there is no shuffle-free hopping aggregate)."""
    assert size_s % hop_s == 0, "size must be a multiple of hop"
    fan = size_s // hop_s
    hop_us = hop_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64()))
        base = ts // hop_us                      # last window containing t
        offs = np.arange(fan, dtype=np.int64)
        w = (base[:, None] - offs[None, :]).ravel()
        n = batch.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), fan))
        import pyarrow.compute as pc
        return pa.table({
            "event_type": pc.take(batch["event_type"], idx),
            "w": pa.array(w, type=pa.int64()),
            "value": pc.take(batch["value"], idx),
        })

    return (events.map_batches(explode, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["event_type", "w"])
            .aggregate(Count(alias_name="n"),
                       Sum("value", alias_name="sum_value")))


def rolling_window(events: ray.data.Dataset, window: int = 3,
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Per-user rolling sum/avg over the last ``window`` events, ordered
    by (ts, event_id) within each user — the ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW frame of the SQL oracle.

    Same partition-by-key idiom as session_windows: one hash shuffle on
    user_id, then one vectorized pass per partition. The frame sum is
    built as an explicit oldest-to-newest chain of grouped shifts (not a
    cumsum difference), so the FP addition order matches a sequential SQL
    evaluation and there is no accumulated-cumsum drift; both sides are
    rounded half-away-from-zero to 6 dp."""
    from miekki_ray.functions.textstats import round_half_away

    add_part = add_uint_part("user_id", num_partitions)

    def roll(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        grp = g.groupby("user_id")["value"]
        acc = pd.Series(np.zeros(len(g)), index=g.index)
        n = pd.Series(np.ones(len(g), dtype=np.int64), index=g.index)
        for lag in range(window - 1, 0, -1):     # oldest first
            s = grp.shift(lag)
            acc = acc + s.fillna(0.0)
            n = n + s.notna().astype(np.int64)
        acc = acc + g["value"]
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts": g["ts"],
            "value": g["value"],
            "roll_sum": round_half_away(acc.to_numpy()),
            "roll_avg": round_half_away((acc / n).to_numpy()),
        })

    return (events.select_columns(["event_id", "user_id", "ts", "value"])
            .map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_part").map_groups(roll, batch_format="pandas"))


def session_windows(events: ray.data.Dataset, gap_s: int,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Per-user session windows: a session ends after a gap > gap_s.
    Output: user_id, session_start (us), n_events, sum_value.

    Ordering assumption: sessions are computed from ts order WITHIN each
    user; users are hash-partitioned and each partition is processed in one
    vectorized pass."""
    gap_us = gap_s * 1_000_000

    add_part = add_uint_part("user_id", num_partitions)

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts"], kind="mergesort")
        # normalize to us regardless of pandas datetime unit (ns vs us)
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = g["user_id"].to_numpy()
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        gap = np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
        new_session = new_user | gap
        sid = np.cumsum(new_session) - 1
        g = g.assign(_sid=sid)
        out = g.groupby("_sid").agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        ).reset_index(drop=True)
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (events.select_columns(["user_id", "ts", "value"])
            .map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_part").map_groups(sessionize, batch_format="pandas"))


def lag_lead(events: ray.data.Dataset,
             num_partitions: int = 16) -> ray.data.Dataset:
    """Per-user LAG/LEAD: previous/next event's value and the gap (in
    seconds) since the previous event, ordered by (ts, event_id) within
    each user — SQL's LAG(value)/LEAD(value)/ts-LAG(ts) OVER (PARTITION
    BY user_id ORDER BY ts, event_id). Same one-shuffle partition-by-key
    idiom as rolling_window: grouped shifts are a single vectorized pass
    per partition."""
    from miekki_ray.functions.textstats import round_half_away

    add_part = add_uint_part("user_id", num_partitions)

    def shifts(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        by = g.groupby("user_id")
        prev_v = by["value"].shift(1)
        next_v = by["value"].shift(-1)
        prev_ts = by["ts"].shift(1)
        gap = (g["ts"].to_numpy(dtype="datetime64[us]").view(np.int64)
               - prev_ts.to_numpy(dtype="datetime64[us]").view(np.int64))
        gap_s = np.where(prev_ts.isna().to_numpy(), np.nan,
                         gap / 1_000_000.0)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts": g["ts"],
            "value": g["value"],
            "prev_value": prev_v,
            "next_value": next_v,
            # round_half_away, not np.round: repo-wide DuckDB ROUND
            # parity discipline for oracle-compared floats (ADVICE r2)
            "gap_s": round_half_away(gap_s, 6),
        })

    return (events.select_columns(["event_id", "user_id", "ts", "value"])
            .map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_part").map_groups(shifts, batch_format="pandas"))


def running_sum(events: ray.data.Dataset,
                num_partitions: int = 16) -> ray.data.Dataset:
    """Per-user cumulative (running) sum of value ordered by
    (ts, event_id) — SQL's SUM(value) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING). Completes the
    window-frame family next to rolling_window (bounded frame) and
    lag_lead (offset frame).

    Same one-shuffle partition-by-key idiom: pandas groupby.cumsum is a
    single vectorized sequential pass per partition, which matches the
    oracle's sequential frame evaluation; both sides round to 6 dp to
    absorb DuckDB's segment-tree summation order."""
    from miekki_ray.functions.textstats import round_half_away

    add_part = add_uint_part("user_id", num_partitions)

    def cum(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
        by = g.groupby("user_id")
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "ts": g["ts"],
            "value": g["value"],
            "run_sum": round_half_away(
                by["value"].cumsum().to_numpy(dtype=np.float64)),
            "run_n": by.cumcount().to_numpy(dtype=np.int64) + 1,
        })

    return (events.select_columns(["event_id", "user_id", "ts", "value"])
            .map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_part").map_groups(cum, batch_format="pandas"))


def ntile_tiles(events: ray.data.Dataset, k: int = 4,
                num_partitions: int = 8) -> ray.data.Dataset:
    """NTILE(k) OVER (PARTITION BY event_type ORDER BY value, event_id),
    summarized per (event_type, tile) as n/min_v/max_v so the output is
    tile-count-sized, not row-sized.

    NTILE needs every row of a group ranked against the whole group, so
    groups are co-located by hashing event_type (same requirement as the
    SQL window). Tile assignment replicates SQL semantics exactly: with n
    rows and k tiles the first n % k tiles get floor(n/k)+1 rows. Skewed
    key caveat: one giant group lands on one partition — for that regime
    compute a two-pass rank (grouped count, then per-batch offset) before
    binning; at tile-summary granularity the oracle comparison is exact
    with no FP rounding at all."""
    def add_part(batch: pa.Table) -> pa.Table:
        part = str_part(batch["event_type"].to_pandas(), num_partitions)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    def tiles(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["event_type", "value", "event_id"],
                              kind="mergesort")
        sizes = g.groupby("event_type", sort=False)["value"].transform("size")
        idx = g.groupby("event_type", sort=False).cumcount().to_numpy()
        n = sizes.to_numpy(dtype=np.int64)
        base, rem = n // k, n % k
        # first `rem` tiles have base+1 rows
        cut = rem * (base + 1)
        tile = np.where(idx < cut,
                        idx // np.maximum(base + 1, 1),
                        rem + (idx - cut) // np.maximum(base, 1)) + 1
        g = g.assign(tile=tile.astype(np.int64))
        out = g.groupby(["event_type", "tile"], sort=False).agg(
            n=("value", "size"),
            min_v=("value", "min"),
            max_v=("value", "max"),
        ).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    return (events.select_columns(["event_id", "event_type", "value"])
            .map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_part").map_groups(tiles, batch_format="pandas"))
