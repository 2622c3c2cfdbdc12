"""Relational operator coverage over the driver testdata tables.

SURVEY.md §5.4: "SQL-expressible ops (groupby counts, exact dedup
keep-first, top-k, joins) get DuckDB oracles". Each function here takes
``sf_dir`` and returns a Dataset / pandas DataFrame whose column NAMES match
the paired oracle SQL in __ray_entry__.oracle_sql (driver hashes values
after sorting columns by name).

These exercise the same stage library the dedup engine uses (map_batches
projections/filters, groupby-aggregate shuffles, hash joins, sort/limit) on
generic tables — FIXTURES.md §A."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None
          ) -> ray.data.Dataset:
    from miekki_ray.sources.transcripts import strip_schema_metadata

    # testdata parquet carries pandas schema metadata, which makes the
    # Arrow schema unhashable and defeats Ray's shuffle schema-dedup [env]
    return strip_schema_metadata(ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns))


# ---------------------------------------------------------------- aggregates

def lineitem_agg(sf_dir: str):
    """TPC-H Q1 shape: grouped sums/means with computed revenue column."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def add_rev(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("revenue", rev)

    out = (ds.map_batches(add_rev, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("revenue", alias_name="sum_revenue"),
                      Mean("l_discount", alias_name="avg_disc"),
                      Count(alias_name="n")))

    # distributed FP summation order differs from the oracle's sequential
    # sum; round to cents so both sides hash identically
    def rnd(batch: pa.Table) -> pa.Table:
        for col in ("sum_revenue", "avg_disc"):
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(i, col, pc.round(batch[col], 2))
        return batch

    return out.map_batches(rnd, batch_format="pyarrow")


def events_by_type(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return (ds.groupby("event_type")
            .aggregate(Count(alias_name="n"),
                       Sum("value", alias_name="sum_value"),
                       Min("value", alias_name="min_value"),
                       Max("value", alias_name="max_value")))


def part_brand_top5(sf_dir: str):
    ds = _read(sf_dir, "part", ["p_brand"])
    return (ds.groupby("p_brand").aggregate(Count(alias_name="n"))
            .sort(["n", "p_brand"], descending=[True, False]).limit(5))


# ------------------------------------------------------------------- joins

def orders_join_customer_top10(sf_dir: str):
    """Hash join + grouped agg + top-k: 10 biggest customers by spend."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    spend = (orders.groupby("o_custkey")
             .aggregate(Sum("o_totalprice", alias_name="total_spend"),
                        Count(alias_name="n_orders")))
    j = spend.join(cust, join_type="inner", num_partitions=8,
                   on=("o_custkey",), right_on=("c_custkey",))
    return (j.select_columns(["c_name", "total_spend", "n_orders"])
            .sort(["total_spend", "c_name"], descending=[True, False])
            .limit(10))


def customers_without_orders(sf_dir: str):
    """Anti join (J4), fully distributed: customers and order keys are
    co-partitioned by hash(custkey) and each partition drops customers
    whose key appears — id-width rows through the shuffle, no driver-side
    key list (a broadcast key set would be corpus-scale at 100 TB; the
    broadcast variant remains the right call only for SMALL key sets,
    SURVEY.md §2.4)."""
    P = 8
    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def tag_orders(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy()
        return pa.table({
            "c_custkey": batch["o_custkey"],
            "c_name": pa.array([None] * batch.num_rows, type=pa.string()),
            "_is_cust": pa.array(np.zeros(batch.num_rows, dtype=bool)),
            "_p": pa.array((k % P).astype(np.int32), type=pa.int32()),
        })

    def tag_cust(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy()
        t = batch.append_column(
            "_is_cust", pa.array(np.ones(batch.num_rows, dtype=bool)))
        return t.append_column(
            "_p", pa.array((k % P).astype(np.int32), type=pa.int32()))

    mixed = cust.map_batches(tag_cust, batch_format="pyarrow",
                             zero_copy_batch=True).union(
        orders.map_batches(tag_orders, batch_format="pyarrow",
                           zero_copy_batch=True))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = g[~g["_is_cust"]]["c_custkey"].unique()
        c = g[g["_is_cust"]]
        keep = c[~c["c_custkey"].isin(have)]
        return keep[["c_custkey", "c_name"]]

    out = (mixed.groupby("_p").map_groups(anti, batch_format="pandas")
           .sort("c_custkey").to_pandas())
    # an all-filtered result loses its schema through to_pandas; pin columns
    if out.empty or "c_custkey" not in out.columns:
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                            "c_name": pd.Series([], dtype=str)})
    return out[["c_custkey", "c_name"]]


def supplier_nation_region(sf_dir: str):
    """Two-hop broadcast join through dimension tables (J3)."""
    import ray
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    rmap_key = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    rmap = dict(zip(region["r_regionkey"], region["r_name"]))
    ref = ray.put((nmap, rmap_key, rmap))
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"])

    def attach(batch: pa.Table) -> pa.Table:
        import ray as _r
        nm, rk, rm = _r.get(ref)
        nk = batch["s_nationkey"].to_pylist()
        return pa.table({
            "s_suppkey": batch["s_suppkey"],
            "s_name": batch["s_name"],
            "n_name": pa.array([nm[k] for k in nk], type=pa.string()),
            "r_name": pa.array([rm[rk[k]] for k in nk], type=pa.string()),
        })

    return sup.map_batches(attach, batch_format="pyarrow",
                           zero_copy_batch=True).sort("s_suppkey")


# ------------------------------------------------- filters / project / sort

def lineitem_filter_project(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                "l_discount"])

    def f(batch: pa.Table) -> pa.Table:
        m = pc.greater(batch["l_quantity"], 45.0)
        t = batch.filter(m)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev).select(
            ["l_orderkey", "l_linenumber", "revenue"])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True) \
             .sort(["l_orderkey", "l_linenumber"])


def orders_top20(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(20)


def orders_by_month(sf_dir: str):
    """Timestamp handling: orders per calendar month."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def month(batch: pa.Table) -> pa.Table:
        y = pc.year(batch["o_orderdate"])
        m = pc.month(batch["o_orderdate"])
        return pa.table({"y": pc.cast(y, pa.int32()),
                         "m": pc.cast(m, pa.int32())})

    return (ds.map_batches(month, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["y", "m"]).aggregate(Count(alias_name="n")))


# ------------------------------------------------------- documents (dedup-ish)

def documents_exact_keep_first(sf_dir: str):
    """D1 on the documents table: keep min doc_id per identical text."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return (ds.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"))
            .select_columns(["doc_id"]).sort("doc_id"))


def _text_hash128(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append a 128-bit content key (two independently-seeded 64-bit
    hashes) so downstream joins/groupbys ship 16 bytes instead of the
    document text. Collision probability ~2^-128-scale — safe at any
    corpus size the spec envelope names."""
    t = batch[col].to_pandas().astype(str)
    h1 = pd.util.hash_pandas_object(t, index=False,
                                    hash_key="miekki-h1-000000")
    h2 = pd.util.hash_pandas_object(t, index=False,
                                    hash_key="miekki-h2-000000")
    out = batch.append_column(
        "_h1", pa.array(h1.to_numpy(dtype=np.uint64).view(np.int64),
                        type=pa.int64()))
    return out.append_column(
        "_h2", pa.array(h2.to_numpy(dtype=np.uint64).view(np.int64),
                        type=pa.int64()))


def documents_dup_clusters(sf_dir: str):
    """Exact-dup cluster table: (doc_id, cluster_id = min doc_id of text).

    The join key is a 128-bit text hash, NOT the text itself — the full
    document text never crosses the join shuffle (it would be shipped twice
    per doc otherwise; the SQL oracle joins on text and agrees modulo hash
    collisions, see _text_hash128)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    hashed = ds.map_batches(_text_hash128, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .select_columns(["doc_id", "_h1", "_h2"])
    reps = hashed.groupby(["_h1", "_h2"]).aggregate(
        Min("doc_id", alias_name="cluster_id"))
    j = hashed.join(reps, join_type="inner", num_partitions=8,
                    on=("_h1", "_h2"), right_on=("_h1", "_h2"))
    return j.select_columns(["doc_id", "cluster_id"]).sort("doc_id")


def documents_lang_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n"))


def documents_distinct_count(sf_dir: str):
    """A4 distinct count, fully distributed: texts are hashed to a 128-bit
    key in map_batches, the groupby shuffles 16-byte keys (never text), and
    only the scalar count reaches the driver — no driver-side list of every
    distinct document (that would be corpus-scale at 100 TB)."""
    ds = _read(sf_dir, "documents", ["text"])
    hashed = ds.map_batches(_text_hash128, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .select_columns(["_h1", "_h2"])
    n = hashed.groupby(["_h1", "_h2"]).aggregate(Count(alias_name="c")) \
              .count()
    return pd.DataFrame({"n_distinct": [n]})


def customers_top_per_segment(sf_dir: str, k: int = 3):
    """Grouped top-k (windowed rank): the k largest-balance customers per
    market segment. Coarse hash-partition by segment, ONE vectorized
    rank/head pass per partition (not per group) — the same idiom as the
    dedup stages; oracle is a SQL row_number() window."""
    ds = _read(sf_dir, "customer",
               ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])
    P = 8

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["c_mktsegment"].astype(str),
                                       index=False) \
            .to_numpy(dtype=np.uint64)
        batch = batch.copy()
        batch["_p"] = (h % np.uint64(P)).astype(np.int32)
        return batch

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_mktsegment", "c_acctbal", "c_custkey"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.assign(rank=g.groupby("c_mktsegment").cumcount()
                     .astype(np.int32) + 1)
        return g[g["rank"] <= k][
            ["c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rank"]]

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("_p").map_groups(topk, batch_format="pandas")
            .sort(["c_mktsegment", "rank"]))


def orders_distinct_custs_per_priority(sf_dir: str):
    """COUNT(DISTINCT) per group, fully distributed: two grouped
    aggregates (pair-dedupe then count) — no driver-side value lists."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])
    pairs = ds.groupby(["o_orderpriority", "o_custkey"]) \
              .aggregate(Count(alias_name="_c"))
    return (pairs.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n_custs")))


def events_value_quantiles(sf_dir: str):
    """Exact per-key quantiles (p50/p90/p99 of value per event_type):
    coarse-partition by key, one vectorized np.quantile (linear
    interpolation — the same rule as DuckDB quantile_cont) per key.
    Scale note: per-key data must fit a partition; beyond that the
    t-digest/approx path is the answer."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    P = 8

    def add_part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["event_type"].astype(str),
                                       index=False) \
            .to_numpy(dtype=np.uint64)
        batch = batch.copy()
        batch["_p"] = (h % np.uint64(P)).astype(np.int32)
        return batch

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            v = grp["value"].to_numpy(dtype=np.float64)
            q = np.quantile(v, [0.5, 0.9, 0.99])
            rows.append((et, *np.round(q, 6)))
        return pd.DataFrame(rows, columns=["event_type", "p50", "p90",
                                           "p99"])

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("_p").map_groups(quant, batch_format="pandas")
            .sort("event_type"))


def union_sources(sf_dir: str):
    """D3 union: high-value orders ∪ priority orders, distinct count."""
    o = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice",
                                 "o_orderpriority"])
    hi = o.filter(expr="o_totalprice > 200000.0")
    pri = o.filter(expr="o_orderpriority == '1-URGENT'")
    u = hi.union(pri).select_columns(["o_orderkey"])
    # distributed distinct: grouped count shuffles 8-byte keys, only the
    # scalar reaches the driver (no driver-side key list at corpus scale)
    n = u.groupby("o_orderkey").aggregate(Count(alias_name="_c")).count()
    return pd.DataFrame({"n": [n]})


def documents_top_tokens(sf_dir: str, k: int = 20):
    """Corpus-wide top-k tokens by frequency — the wordcount/heavy-hitter
    shape. Each batch pre-aggregates its own (token, n) counts BEFORE the
    shuffle (combiner pattern: the grouped exchange moves one row per
    distinct token per batch, not one per token occurrence), then one
    grouped sum + top-k sort. Tokenization is Python str.split()
    semantics (whitespace runs, incl. 0x1c-0x1f)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["text"].str.split().explode().dropna().value_counts()
        return pd.DataFrame({"token": vc.index.astype(str),
                             "n": vc.to_numpy(dtype=np.int64)})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("token").aggregate(Sum("n", alias_name="n"))
            .sort(["n", "token"], descending=[True, False]).limit(k))


def documents_hash_sample(sf_dir: str):
    """Deterministic content-addressed 1/16 sample: keep docs whose
    md5(doc_id) digest starts with '0'. Unlike seeded RNG sampling
    (implementation-defined across engines), a hash predicate is exactly
    reproducible anywhere — the DuckDB oracle states the same predicate.
    md5 is per-row C code via hashlib; for pure-speed sampling at scale
    use a vectorized splitmix64 over the int key instead (the predicate
    just has to be stated consistently on both sides)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        keep = np.fromiter(
            (hashlib.md5(str(i).encode()).hexdigest()[0] == "0"
             for i in batch["doc_id"].astype("int64")),
            dtype=bool, count=len(batch))
        out = batch[keep]
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "n_chars": out["text"].str.len().astype("int64"),
        })

    return ds.map_batches(f, batch_format="pandas").sort("doc_id")
