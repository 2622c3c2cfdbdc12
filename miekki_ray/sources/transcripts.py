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
    Returns None (let Ray infer) if no footer is reachable.

    For a directory, EVERY part file's footer is read (metadata-only;
    ~KBs per file, driver-side, once) and the projected fields must agree
    — otherwise a part written by a drifted writer (e.g. int32 vs int64)
    would be silently coerced or fail mid-read with a confusing error
    deep in the pipeline (ADVICE r2). Surfacing the drift here names the
    offending file."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _project(schema: pa.Schema) -> pa.Schema:
        if columns is None:
            return schema
        return pa.schema([schema.field(c) for c in columns])

    # expand EVERY input (a list element may itself be a dir) — checking
    # only path[0] of a list would silently skip the drift check for the
    # remaining files (r4 review)
    all_files: list[str] = []
    for entry in (path if isinstance(path, list) else [path]):
        if os.path.isdir(entry):
            all_files += [os.path.join(entry, f)
                          for f in sorted(os.listdir(entry))
                          if f.endswith(".parquet")]
        else:
            all_files.append(entry)
    if not all_files:
        return None
    p, rest = all_files[0], all_files[1:]
    try:
        out = _project(pq.read_schema(p).with_metadata(None))
    except Exception:
        return None
    for other in rest:
        try:
            raw = pq.read_schema(other).with_metadata(None)
        except Exception:
            # unreadable footer: let the read stage surface its own error
            continue
        try:
            got = _project(raw)
        except KeyError as e:
            # the WORST drift — a part missing a projected column — must
            # not be swallowed into "schemas agree"
            raise ValueError(
                f"parquet schema drift inside directory: {other!r} lacks "
                f"projected column {e} present in {p!r}") from None
        if got != out:
            raise ValueError(
                f"parquet schema drift inside directory: {other!r} has "
                f"{got} but {p!r} has {out}")
    return out


def read_transcripts(path: str | list[str],
                     override_num_blocks: int | None = None
                     ) -> ray.data.Dataset:
    """Operator S1: read the turns table, projecting exactly the six spec
    columns and asserting the spec schema (names + types) from the parquet
    footer — metadata-only, no execution (SURVEY.md §1.3)."""
    raw = ray.data.read_parquet(
        path, columns=TURN_COLUMNS, override_num_blocks=override_num_blocks,
        schema=clean_read_schema(path, TURN_COLUMNS),
    )
    # assert BEFORE the metadata-strip map: a read dataset's schema() is
    # footer metadata only, while schema() after a map may execute a block
    return strip_schema_metadata(assert_schema(raw, TURNS_SCHEMA))


def assert_schema(ds: ray.data.Dataset, expected: pa.Schema
                  ) -> ray.data.Dataset:
    """Cheap schema assertion at a stage boundary: column names AND types
    must match, except string/large_string interchange (Arrow readers
    produce either freely) and timestamp timezone annotations. Metadata-
    only on a freshly-read dataset — does not trigger execution."""
    got = ds.schema().base_schema
    if list(got.names) != list(expected.names):
        raise ValueError(
            f"schema mismatch: columns {list(got.names)} != "
            f"{list(expected.names)}")

    def _norm(t: pa.DataType) -> pa.DataType:
        if pa.types.is_large_string(t):
            return pa.string()
        if pa.types.is_timestamp(t):
            return pa.timestamp(t.unit)
        return t

    for name in expected.names:
        g, e = _norm(got.field(name).type), _norm(expected.field(name).type)
        if g != e:
            raise ValueError(
                f"schema mismatch: column {name!r} is {g}, expected {e}")
    return ds
