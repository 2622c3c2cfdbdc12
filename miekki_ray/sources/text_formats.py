"""JSONL / CSV source + sink coverage (S-layer breadth beyond Parquet).

Ray Data's native `read_json` / `read_csv` / `write_json` / `write_csv`
already stream per-file blocks; what this module adds is the engine's
schema discipline on top: metadata-stripped Arrow schemas (the repo-wide
rule — pandas metadata makes schemas unhashable and defeats Ray's shuffle
schema dedup) and explicit dtype pinning on CSV reads (CSV is untyped;
unpinned reads infer per-file and can produce block-to-block schema
drift, which poisons downstream joins at scale).

The paired queries in __ray_entry__ round-trip driver tables through
each format and re-aggregate, oracled against the ORIGINAL parquet —
proving the readers/writers are lossless for the data they claim.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

from miekki_ray.sources.transcripts import strip_schema_metadata


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned JSONL sink (one file per block — resumable layout)."""
    ds.write_json(out_dir)


def read_jsonl(path: str) -> ray.data.Dataset:
    return strip_schema_metadata(ray.data.read_json(path))


def write_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    ds.write_csv(out_dir)


def read_csv(path: str, column_types: dict[str, pa.DataType] | None = None
             ) -> ray.data.Dataset:
    """CSV read with pinned dtypes: pass the expected column types so
    every block parses identically (per-file inference drifts — a file
    whose sampled rows happen to all be ints infers int64 while its
    sibling infers double, and the union then needs a cast shuffle)."""
    kwargs = {}
    if column_types:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types=column_types)
    return strip_schema_metadata(ray.data.read_csv(path, **kwargs))


def write_ipc(ds: ray.data.Dataset, out_dir: str):
    """Partitioned Arrow IPC (Feather v2) sink: one ``.arrow`` file per
    input block (the same resumable one-file-per-block layout as the
    JSONL/CSV sinks). File names are CONTENT-ADDRESSED (md5 of the IPC
    bytes), so a re-run after a crash rewrites the same names instead of
    duplicating data — idempotent without a manifest. Returns the tiny
    (path, rows) manifest DataFrame (one row per written file)."""
    import hashlib
    import io
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        empty = pa.table({"path": pa.array([], type=pa.string()),
                          "rows": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        buf = io.BytesIO()
        with pa.ipc.new_file(buf, batch.schema) as w:
            w.write_table(batch)
        data = buf.getvalue()
        p = os.path.join(out_dir,
                         f"part-{hashlib.md5(data).hexdigest()[:16]}.arrow")
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)          # atomic (manifest-write discipline)
        return pa.table({"path": pa.array([p], type=pa.string()),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    # consuming the block-sized manifest drives the distributed write
    return (ds.map_batches(dump, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas())


def read_ipc(path: str) -> ray.data.Dataset:
    """Arrow IPC (Feather v2) source: one read task per file
    (read_binary_files does the listing/scheduling), decoded ZERO-COPY in
    the task — pa.ipc.open_file over the Arrow buffer of the file bytes,
    no Python bytes materialization."""
    raw = ray.data.read_binary_files(path, file_extensions=["arrow"])

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        col = batch["bytes"]
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        for ch in chunks:
            for i in range(len(ch)):
                tables.append(pa.ipc.open_file(
                    pa.BufferReader(ch[i].as_buffer())).read_all())
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return strip_schema_metadata(
        raw.map_batches(decode, batch_format="pyarrow",
                        zero_copy_batch=True))
