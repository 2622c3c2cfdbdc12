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
