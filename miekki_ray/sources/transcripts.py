"""Sources: transcript Parquet reader (S1) + schema contract.

[spec BASELINE.json:15] input: Parquet table of multi-turn transcripts with
columns (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp). Column-pruned at the read (only the six spec
columns leave storage — SURVEY.md 'prune at the read').
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

TURNS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

DOCS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("doc", pa.large_string()),
    ("n_turns", pa.int32()),
    ("doc_hash", pa.uint64()),
])


def strip_schema_metadata(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop schema-level metadata (e.g. the pandas block written by pandas
    -> parquet converters). pa.Schema with metadata is UNHASHABLE, which
    breaks Ray's schema-dedup fast path in every downstream shuffle
    ('Failed to hash the schemas ... unhashable type: dict' spam) [env]."""
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None),
        batch_format="pyarrow", zero_copy_batch=True)


def clean_read_schema(path: str | list[str],
                      columns: list[str] | None = None):
    """Metadata-free Arrow schema for a parquet path, projected to
    ``columns`` — passed to read_parquet so even the READ stage's blocks
    carry a hashable schema (otherwise the pandas metadata embedded in
    the footer defeats Ray's shuffle schema-dedup from the first op on).
    Returns None (let Ray infer) if no footer is reachable."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = path[0] if isinstance(path, list) else path
    if os.path.isdir(p):
        files = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
        if not files:
            return None
        p = os.path.join(p, files[0])
    try:
        full = pq.read_schema(p).with_metadata(None)
    except Exception:
        return None
    if columns is None:
        return full
    return pa.schema([full.field(c) for c in columns])


def read_transcripts(path: str | list[str],
                     override_num_blocks: int | None = None
                     ) -> ray.data.Dataset:
    """Operator S1: read the turns table, projecting exactly the six spec
    columns. Schema is asserted lazily by assert_turns_schema (stage
    boundaries carry explicit schemas — SURVEY.md §1.3)."""
    return strip_schema_metadata(ray.data.read_parquet(
        path, columns=TURN_COLUMNS, override_num_blocks=override_num_blocks,
        schema=clean_read_schema(path, TURN_COLUMNS),
    ))


def assert_schema(ds: ray.data.Dataset, expected: pa.Schema) -> ray.data.Dataset:
    """Cheap schema assertion at a stage boundary (names + types; allows
    string/large_string interchange, which Arrow readers produce freely)."""
    got = ds.schema()
    names = list(got.names)
    exp_names = list(expected.names)
    if names != exp_names:
        raise ValueError(f"schema mismatch: columns {names} != {exp_names}")
    return ds
