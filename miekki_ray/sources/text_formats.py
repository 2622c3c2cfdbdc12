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


SINK_MARKER = "_MIEKKI_SINK"


def replace_dir_write(out_dir: str, write_fn,
                      marker: str | None = SINK_MARKER) -> None:
    """Crash-safe replace-wholesale discipline for directory sinks (ONE
    shared implementation — job.py's keep_list output uses it too).
    Ray's write_* APPENDS uuid-named files to an existing directory, so a
    crashed-then-retried write would duplicate every row on read; the r4
    version deleted the directory FIRST, which (a) destroyed the previous
    good output if the run crashed between delete and write, and (b)
    would wipe an unrelated directory on a mistyped out_dir (ADVICE r4).

    Local paths: write into a unique temp SIBLING, then swap via rename —
    the previous output survives every crash window (worst case it is
    parked at ``<out>.old-*``, never destroyed mid-write); residue from
    PRIOR crashed runs (``<out>.tmp-*`` / ``<out>.old-*`` siblings, ours
    by naming construction) is cleared AFTER the successful publish —
    never before it: a parked sibling may be the ONLY complete copy
    after a crash between the two renames, and sweeping it on entry
    would leave zero copies anywhere for the whole duration of the new
    write (r5 review). With ``marker`` set, the
    marker file is dropped inside the output and a non-empty existing
    directory WITHOUT it (i.e. not produced by this sink) raises instead
    of being replaced; marker=None skips both (for parquet outputs whose
    naive readers would trip over a non-parquet file).

    Object-store URIs: no atomic directory rename exists there — fall
    back to delete-then-write through pyarrow.fs (per-object PUTs are
    already all-or-nothing; the delete..write crash window is the
    documented ceiling on such stores)."""
    import os
    import shutil
    import uuid

    if "://" in out_dir:
        from pyarrow import fs as pafs

        fsys, p = pafs.FileSystem.from_uri(out_dir)
        if fsys.get_file_info(p).type != pafs.FileType.NotFound:
            fsys.delete_dir(p)
        write_fn(out_dir)     # no marker on URIs: nothing to guard with
        return
    out = os.path.abspath(out_dir)
    if marker and os.path.isdir(out) and os.listdir(out) and \
            not os.path.exists(os.path.join(out, marker)):
        raise ValueError(
            f"refusing to replace {out}: directory is non-empty and was "
            f"not written by this sink (no {marker} marker) — "
            "pass a fresh out_dir or remove it explicitly")
    nonce = uuid.uuid4().hex
    tmp = f"{out}.tmp-{nonce}"
    write_fn(tmp)
    if marker:
        with open(os.path.join(tmp, marker), "w") as f:
            f.write("")
    old = None
    if os.path.exists(out):
        old = f"{out}.old-{nonce}"
        os.rename(out, old)
    os.rename(tmp, out)                    # publish: atomic on one fs
    if old is not None:
        shutil.rmtree(old, ignore_errors=True)
    # residue sweep LAST (see docstring): only once the new output is
    # published is it safe to drop prior runs' parked copies
    parent, base = os.path.dirname(out), os.path.basename(out)
    if os.path.isdir(parent):
        for f in os.listdir(parent):
            if f.startswith((f"{base}.tmp-", f"{base}.old-")) \
                    and f != os.path.basename(tmp):
                shutil.rmtree(os.path.join(parent, f),
                              ignore_errors=True)


# backward-compat alias (r5 review: job.py shares the implementation now)
_replace_write = replace_dir_write


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned JSONL sink (one file per block), replace-wholesale —
    re-running after a crash rewrites the directory instead of appending
    duplicate part files; the swap is atomic (see _replace_write)."""
    _replace_write(out_dir, ds.write_json)


def _paths_without_marker(path: str):
    """Local sink directories carry the _MIEKKI_SINK marker, which
    extension-less readers must skip (it would parse as an empty
    schema-less block). Skip by NAME via an explicit file list, not by
    allowlisting extensions — an extension pin would silently drop
    legitimately-named external files (extensionless Spark-style parts,
    .tsv) the readers have always accepted (r5 review). Non-marker dirs
    and URIs pass through untouched."""
    import os

    if os.path.isdir(path) and \
            os.path.exists(os.path.join(path, SINK_MARKER)):
        return [os.path.join(path, f) for f in sorted(os.listdir(path))
                if f != SINK_MARKER]
    return path


def read_jsonl(path: str) -> ray.data.Dataset:
    # ray.data.read_json's DEFAULT file_extensions filter already skips
    # the extension-less sink marker — plain call, r4 behavior unchanged
    return strip_schema_metadata(ray.data.read_json(path))


def write_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned CSV sink, replace-wholesale (see write_jsonl)."""
    _replace_write(out_dir, ds.write_csv)


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
    # marker skipped by name, not extension pin: see _paths_without_marker
    return strip_schema_metadata(
        ray.data.read_csv(_paths_without_marker(path), **kwargs))


IPC_MANIFEST = "_MANIFEST.json"


def write_ipc(ds: ray.data.Dataset, out_dir: str):
    """Partitioned Arrow IPC (Feather v2) sink: one ``.arrow`` file per
    input block (the same resumable one-file-per-block layout as the
    JSONL/CSV sinks), MANIFEST-LAST (the repo's checkpoint discipline,
    state/manifest.py): every block writes under a unique name via an
    atomic tmp+rename, then ``_MANIFEST.json`` is published atomically
    listing exactly the files of THIS run. A crashed run leaves orphan
    parts but no manifest update, and ``read_ipc`` reads only manifested
    files — so a re-run is exact, never duplicated, never torn. (Names
    are NOT content-addressed: two byte-identical blocks are two files —
    dedup corpora legitimately contain duplicate blocks, and collapsing
    them would silently drop rows.) Returns the tiny (path, rows)
    manifest DataFrame."""
    import json
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        empty = pa.table({"path": pa.array([], type=pa.string()),
                          "rows": pa.array([], type=pa.int64())})
        # A zero-ROW batch with real columns still writes its (0-row)
        # file: the IPC footer carries the schema, so a fully-filtered
        # corpus round-trips with its schema intact (ADVICE r3 — read_ipc
        # of a schema-less sink output would otherwise have nothing to
        # probe). Only a zero-COLUMN batch has nothing to say.
        if batch.num_columns == 0:
            return empty
        name = f"part-{uuid.uuid4().hex}.arrow"
        p = os.path.join(out_dir, name)
        tmp = p + ".tmp"                 # unique per writer: no sharing
        with pa.OSFile(tmp, "wb") as f, \
                pa.ipc.new_file(f, batch.schema) as w:
            w.write_table(batch)
        os.replace(tmp, p)
        return pa.table({"path": pa.array([name], type=pa.string()),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    # consuming the block-sized manifest drives the distributed write;
    # batch_size=None = one dump call per BLOCK (the documented one-file-
    # per-block layout — the default 1024-row batching would explode a
    # 10M-row dataset into ~10k tiny files and read tasks, r4 review)
    out = (ds.map_batches(dump, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
           .to_pandas())
    if "path" not in out.columns:
        # an input with zero blocks maps to a DataFrame without the dump
        # UDF's columns (ADVICE r3: reproduced KeyError) — normalize to
        # the manifest shape so the empty manifest still publishes
        out = out.reindex(columns=["path", "rows"])
    if len(out) == 0:
        # Ray drops empty blocks before the sink UDF, so a fully-filtered
        # corpus reaches here with zero part files and the schema would
        # be lost (ADVICE r3). Recover it: first from PLAN metadata
        # (fetch_if_missing=False — free when the schema is statically
        # known), else by fetching. The fetch can re-execute the
        # just-consumed lineage, and on an fn-filtered pipeline it
        # reports None anyway (Ray derives no schema from all-empty
        # executor output, verified 2.49.2,
        # test_ipc_fully_filtered_input_no_crash) — a documented
        # worst-case cost paid only on zero-output sinks, in exchange
        # for the schema round-trip wherever it is recoverable at all
        # (e.g. a 0-row from_arrow input). Persist ONE 0-row part whose
        # IPC footer carries the recovered schema, so read_ipc
        # round-trips it.
        sch = (ds.schema(fetch_if_missing=False)
               or ds.schema(fetch_if_missing=True))
        arrow_sch = getattr(sch, "base_schema", None)
        if isinstance(arrow_sch, pa.Schema) and arrow_sch.names:
            rec = dump(arrow_sch.empty_table())
            out = rec.to_pandas()
    mpath = os.path.join(out_dir, IPC_MANIFEST)
    mtmp = mpath + f".{uuid.uuid4().hex}.tmp"
    with open(mtmp, "w") as f:
        json.dump({"files": [{"path": p, "rows": int(r)} for p, r in
                             zip(out["path"], out["rows"])]}, f)
    os.replace(mtmp, mpath)              # manifest LAST, atomically
    return out


def read_ipc(path: str) -> ray.data.Dataset:
    """Arrow IPC (Feather v2) source: one read task per file
    (read_binary_files does the listing/scheduling), decoded ZERO-COPY in
    the task — pa.ipc.open_file over the Arrow buffer of the file bytes,
    no Python bytes materialization. If the directory carries a
    ``_MANIFEST.json`` (write_ipc's manifest-last contract), ONLY
    manifested files are read — orphan parts from a crashed earlier run
    are ignored; a bare directory/file path falls back to extension
    listing. Empty blocks keep the schema (read driver-side from the
    first file's footer): a zero-column empty block would poison
    downstream joins [env ray 2.49.2]."""
    import json
    import os

    files: list[str] | str = path
    schema = None
    total_rows = None
    mpath = os.path.join(path, IPC_MANIFEST) if os.path.isdir(path) else None
    if mpath and os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
        files = [os.path.join(path, rec["path"])
                 for rec in manifest["files"]]
        total_rows = sum(int(rec["rows"]) for rec in manifest["files"])
    if isinstance(files, list) and not files:
        # zero manifested files (a zero-block sink input): nothing to
        # hand read_binary_files — return an empty dataset rather than
        # crash (ADVICE r3). No file footer exists to recover a schema
        # from, so this is the zero-column empty table.
        return ray.data.from_arrow(pa.table({}))
    probe = files[0] if isinstance(files, list) and files else (
        path if os.path.isfile(path) else None)
    if probe:
        with pa.memory_map(probe) as src:
            schema = pa.ipc.open_file(src).schema.with_metadata(None)
    if total_rows == 0 and schema is not None:
        # an all-empty corpus: Ray reports schema()=None for any dataset
        # whose blocks are all 0-row (even map_batches outputs — verified
        # on ray 2.49.2), so route around the executor entirely and hand
        # back the footer-probed schema as an explicit 0-row input block
        # (from_arrow DOES retain schema for those).
        return ray.data.from_arrow(schema.empty_table())
    raw = ray.data.read_binary_files(files, file_extensions=["arrow"])

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        col = batch["bytes"]
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        for ch in chunks:
            for i in range(len(ch)):
                tables.append(pa.ipc.open_file(
                    pa.BufferReader(ch[i].as_buffer())).read_all())
        if not tables:
            return (schema.empty_table() if schema is not None
                    else pa.table({}))
        return pa.concat_tables(tables, promote_options="default")

    return strip_schema_metadata(
        raw.map_batches(decode, batch_format="pyarrow",
                        zero_copy_batch=True))
