"""Small Dataset utilities shared across stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def add_uint_part(col: str, P: int):
    """Shared hash-partition tagging idiom for a uint64-viewable column:
    a zero-copy Arrow ``map_batches`` fn appending ``_part = col % P``.
    One definition instead of per-module copies (exact dedup ×2, LSH
    candidates, index-query) so the partitioning convention lives in one
    place."""
    def f(batch: pa.Table) -> pa.Table:
        part = (batch[col].to_numpy().view(np.uint64)
                % np.uint64(P)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    return f


def str_part(s: pd.Series, P: int) -> np.ndarray:
    """THE string hash-partition convention (int32 ``hash_pandas_object %
    P``), in one place — every stage that co-partitions on a string key
    must use this so two stages that claim the same key layout actually
    agree."""
    h = pd.util.hash_pandas_object(
        s.astype(str), index=False).to_numpy(dtype=np.uint64)
    return (h % np.uint64(P)).astype(np.int32)


def add_str_part(col: str, P: int):
    """String-column variant of ``add_uint_part`` (pandas batch format):
    ``_part = str_part(col, P)``."""
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = str_part(batch[col], P)
        return batch

    return f


def series_hash128(s: pd.Series, key_prefix: str
                   ) -> tuple[np.ndarray, np.ndarray]:
    """THE 128-bit content-key convention — two independently-keyed
    pandas siphash streams over the same values, uint64 viewed as int64
    (Ray groupby keys must not be uint64) — in one place:
    relational._text_hash128 and scrub.dup_ngram_stats carried drifting
    copies of this dance (r4 review). ``key_prefix`` namespaces the two
    16-byte hash keys ('<prefix>1-000000' / '<prefix>2-000000') so
    different operators keep their historical key streams. Returns
    (h1, h2) int64 arrays; collision odds ~2^-128-scale."""
    k1, k2 = f"{key_prefix}1-000000", f"{key_prefix}2-000000"
    assert len(k1) == 16, key_prefix   # pandas requires a 16-byte key
    h1 = pd.util.hash_pandas_object(s, index=False, hash_key=k1)
    h2 = pd.util.hash_pandas_object(s, index=False, hash_key=k2)
    return (h1.to_numpy(dtype=np.uint64).view(np.int64),
            h2.to_numpy(dtype=np.uint64).view(np.int64))


_PD_INT = {
    pa.int8(): pd.Int8Dtype(), pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(), pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(), pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(), pa.uint64(): pd.UInt64Dtype(),
}


def pandas_nullable_ints(tbl: pa.Table) -> pd.DataFrame:
    """Arrow -> pandas keeping integer columns as MASKED nullable ints
    (Int64 etc.). The default conversion turns an int column containing
    nulls into float64, which (a) makes a later astype('int64') crash on
    a legitimately-null value and (b) silently corrupts int64 values
    above 2^53 — both real cases for side-tagged union frames where the
    other side carries typed nulls (asof / range join)."""
    return tbl.to_pandas(types_mapper=_PD_INT.get)


def pa_from_pandas(df: pd.DataFrame) -> pa.Table:
    """pandas -> metadata-free Arrow table for UDF returns. Pandas-backed
    blocks carry a PandasBlockSchema (unhashable: contains lists) and
    from_pandas attaches a pandas metadata dict (also unhashable) — either
    defeats Ray's schema-dedup fast path in every downstream shuffle and
    floods logs with 'Failed to hash the schemas' [env ray 2.49.2].
    Returning clean Arrow from the UDF fixes both at the source."""
    return pa.Table.from_pandas(
        df, preserve_index=False).replace_schema_metadata(None)


def ensure_schema(ds: ray.data.Dataset, schema: pa.Schema
                  ) -> ray.data.Dataset:
    """Replace schema-less EMPTY blocks (produced by join/groupby operators
    on empty partitions [env ray 2.49.2]) with schema-correct empty tables,
    so downstream joins never see a block without the key column."""
    def f(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return batch

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def union_by_name(datasets: list[ray.data.Dataset]) -> ray.data.Dataset:
    """UNION across schema drift (r5): multi-generation corpora add and
    drop columns over time, and Ray's native ``Dataset.union`` requires
    identical schemas [env 2.49.2]. Each input is conformed to the
    union-of-schemas — missing columns filled with TYPED nulls, column
    order normalized to first-seen order — then unioned. A column whose
    type CONFLICTS across inputs raises loudly (silent casts corrupt;
    the caller decides the cast). Schema discovery is metadata-only on
    parquet-backed inputs."""
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    fields: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = ds.schema()
        arrow = getattr(sch, "base_schema", None)
        if not isinstance(arrow, pa.Schema):
            raise ValueError(
                f"union_by_name needs Arrow schemas; got {sch!r}")
        for f in arrow:
            if f.name in fields and fields[f.name] != f.type:
                raise ValueError(
                    f"column {f.name!r} type conflict across inputs: "
                    f"{fields[f.name]} vs {f.type} — cast explicitly "
                    "before unioning")
            fields.setdefault(f.name, f.type)
    target = pa.schema(list(fields.items()))

    def conform(batch: pa.Table) -> pa.Table:
        cols = []
        for f in target:
            if f.name in batch.column_names:
                cols.append(batch[f.name])
            else:
                cols.append(pa.nulls(batch.num_rows, type=f.type))
        return pa.table(dict(zip(target.names, cols)))

    conformed = [ds.map_batches(conform, batch_format="pyarrow",
                                zero_copy_batch=True)
                 for ds in datasets]
    out = conformed[0]
    return out.union(*conformed[1:]) if len(conformed) > 1 else out


def rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    """Rename columns via a zero-copy Arrow map_batches.

    ``Dataset.rename_columns`` assumes Arrow blocks and crashes on
    pandas-backed blocks (e.g. groupby outputs of from_pandas datasets
    [env ray 2.49.2]); this works for either."""
    def f(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
