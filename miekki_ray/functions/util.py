"""Small Dataset utilities shared across stages."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


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


def rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    """Rename columns via a zero-copy Arrow map_batches.

    ``Dataset.rename_columns`` assumes Arrow blocks and crashes on
    pandas-backed blocks (e.g. groupby outputs of from_pandas datasets
    [env ray 2.49.2]); this works for either."""
    def f(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
