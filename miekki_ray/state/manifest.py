"""S3 — stage checkpointing: per-partition lineage manifests + resume.

[spec BASELINE.json:14]: "resumable from checkpoint with per-partition
lineage + metrics". Ray Data has no cross-run resume [env], so this is
explicit design (SURVEY.md §3.3):

  out/<stage>/part-*.parquet        stage output (partitioned, never one file)
  out/<stage>/_MANIFEST.json        validity proof, written LAST, atomically

A manifest records: stage name, engine config hash, upstream manifest hash,
per-file row counts (the per-partition lineage), total rows, and free-form
metrics. A stage output is reusable iff its manifest exists, parses, and its
config/upstream hashes match — crash between data write and manifest write
⇒ the stage simply re-runs (manifest-last discipline, §7 hard part 3).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import weakref

import ray.data

MANIFEST_NAME = "_MANIFEST.json"


def resolve_fs(path, filesystem=None):
    """(pyarrow FileSystem, fs-internal path) for a path/URI — the r5
    adapter that lifted the r4 local-only restriction (VERDICT r4 Next
    #8). Every manifest/clearing/lineage operation below goes through the
    RESOLVED filesystem — the exact fs write_parquet targets — so a URI
    out_dir can no longer split the data writes (object storage) from the
    manifest machinery (a literal local './s3:/...' dir), which was the
    r4 hazard that justified rejecting URIs outright. An explicit
    ``filesystem`` overrides resolution (tests drive a SubTreeFileSystem
    as the object-store stand-in); an unknown URI scheme still fails
    loudly (pyarrow from_uri raises)."""
    from pyarrow import fs as pafs

    if filesystem is not None:
        return filesystem, str(path)
    if "://" in str(path):
        return pafs.FileSystem.from_uri(str(path))
    return pafs.LocalFileSystem(), os.path.abspath(str(path))


def _is_local(fsys) -> bool:
    from pyarrow import fs as pafs

    return isinstance(fsys, pafs.LocalFileSystem)


def _exists(fsys, path: str) -> bool:
    from pyarrow import fs as pafs

    return fsys.get_file_info(path).type != pafs.FileType.NotFound


def _read_bytes(fsys, path: str) -> bytes:
    with fsys.open_input_stream(path) as f:
        return f.read()


def _list_files(fsys, base: str, recursive: bool = False):
    """FileInfo list under ``base`` ([] if base missing)."""
    from pyarrow import fs as pafs

    try:
        infos = fsys.get_file_info(
            pafs.FileSelector(base, recursive=recursive,
                              allow_not_found=True))
    except (OSError, NotADirectoryError):
        return []
    return [i for i in infos if i.type == pafs.FileType.File]


def stage_metrics(stage_dir: str, filesystem=None) -> dict:
    """The 'metrics' block of a stage manifest ({} if absent/unreadable)
    — how a RESUMED run recovers the counters its skipped stage recorded
    when it originally executed."""
    fsys, base = resolve_fs(stage_dir, filesystem)
    try:
        return json.loads(_read_bytes(fsys, _manifest_path(base))) \
            .get("metrics", {}) or {}
    except (OSError, ValueError):
        return {}


def _manifest_path(stage_dir: str) -> str:
    return f"{stage_dir.rstrip('/')}/{MANIFEST_NAME}"


def manifest_hash(stage_dir: str, filesystem=None) -> str | None:
    """Content hash of a stage's manifest (used as downstream upstream_hash)."""
    fsys, base = resolve_fs(stage_dir, filesystem)
    p = _manifest_path(base)
    if not _exists(fsys, p):
        return None
    return hashlib.blake2b(_read_bytes(fsys, p),
                           digest_size=16).hexdigest()


def _mtime_ns(info) -> int:
    if info.mtime_ns is not None:
        return int(info.mtime_ns)
    if info.mtime is not None:
        return int(info.mtime.timestamp() * 1e9)
    return 0


def input_fingerprint(paths, filesystem=None) -> str:
    """Identity of a ROOT stage's input: file paths + sizes + mtimes,
    hashed (recursive listing — hive/date-partitioned layouts keep files
    in subdirectories). Without this, a re-run against a DIFFERENT corpus
    but the same out_dir + config would silently reuse the stale root
    checkpoint. Goes through the filesystem adapter so remote corpora
    fingerprint their real object listing."""
    from pyarrow import fs as pafs

    if isinstance(paths, str):
        paths = [paths]
    entries = []
    for p in paths:
        fsys, base = resolve_fs(p, filesystem)
        info = fsys.get_file_info(base)
        if info.type == pafs.FileType.Directory:
            for fi in sorted(_list_files(fsys, base, recursive=True),
                             key=lambda i: i.path):
                entries.append((fi.path, fi.size, _mtime_ns(fi)))
        elif info.type == pafs.FileType.File:
            entries.append((base, info.size, _mtime_ns(info)))
        else:
            entries.append((str(p), -1, -1))
    blob = json.dumps(entries, sort_keys=True).encode()
    return hashlib.blake2b(blob, digest_size=16).hexdigest()


# per-object checkpoint nonces for in-memory Dataset inputs (root_input_fp);
# weak keys so a collected Dataset can never bequeath its nonce to a new
# object reusing its address
_DS_NONCE: "weakref.WeakKeyDictionary[ray.data.Dataset, str]" = \
    weakref.WeakKeyDictionary()


def root_input_fp(turns_path) -> str:
    """Root-stage input identity, shared by every checkpointed pipeline
    (run_dedup, run_curate): a different corpus at the same out_dir + cfg
    must invalidate the first stage (and transitively everything). Paths
    fingerprint by content listing (input_fingerprint). An in-memory
    Dataset has no content identity to fingerprint, so it gets a nonce
    keyed on OBJECT identity: re-running the SAME immutable Dataset
    resumes; any other Dataset — including the same corpus rebuilt in a
    new process — recomputes. A None fingerprint would silently resurrect
    a previous corpus's results."""
    if isinstance(turns_path, ray.data.Dataset):
        fp = _DS_NONCE.get(turns_path)
        if fp is None:
            fp = "dataset-nonce:" + os.urandom(8).hex()
            _DS_NONCE[turns_path] = fp
        return fp
    return input_fingerprint(turns_path)


def manifest_valid(stage_dir: str, config_hash: str,
                   upstream_hash: str | None,
                   upstream_required: bool = False,
                   input_fp: str | None = None,
                   filesystem=None) -> bool:
    """A checkpoint is reusable iff its manifest parses AND config hash,
    upstream manifest hash, and (for root stages) the input fingerprint all
    match. ``upstream_required=True`` with a missing upstream manifest
    (upstream_hash None) invalidates — an orphaned downstream checkpoint
    must not validate against a vanished upstream."""
    fsys, base = resolve_fs(stage_dir, filesystem)
    p = _manifest_path(base)
    if not _exists(fsys, p):
        return False
    try:
        m = json.loads(_read_bytes(fsys, p))
    except (json.JSONDecodeError, OSError, ValueError):
        return False
    if m.get("config_hash") != config_hash:
        return False
    if upstream_required and upstream_hash is None:
        return False
    if upstream_hash is not None and m.get("upstream_hash") != upstream_hash:
        return False
    if input_fp is not None and m.get("input_fingerprint") != input_fp:
        return False
    # per-partition check: every listed file still present
    for part in m.get("partitions", []):
        if not _exists(fsys, f"{base.rstrip('/')}/{part['file']}"):
            return False
    return True


def _publish_manifest(fsys, stage_base: str, blob: bytes) -> None:
    """Manifest-LAST publication with the strongest atomicity the target
    filesystem offers: local = tmp file + os.replace (POSIX-atomic);
    object stores = one single-object write — a PUT is all-or-nothing per
    object, so readers see the old manifest or the new one, never a torn
    file (the property the local rename provided)."""
    mpath = _manifest_path(stage_base)
    if _is_local(fsys):
        fd, tmp = tempfile.mkstemp(dir=stage_base, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, mpath)   # atomic
    else:
        with fsys.open_output_stream(mpath) as f:
            f.write(blob)


def write_stage(ds: ray.data.Dataset, out_dir: str, stage: str,
                config_hash: str, upstream_hash: str | None = None,
                metrics=None,
                input_fp: str | None = None,
                filesystem=None) -> str:
    """Write stage output + manifest (manifest LAST; see
    _publish_manifest for the per-filesystem atomicity). Returns the
    stage directory. ``metrics`` may be a dict or a CALLABLE invoked
    after the data write — stage counters (MetricsSink) only exist once
    execution has run, which happens inside write_parquet."""
    fsys, out_base = resolve_fs(out_dir, filesystem)
    stage_dir = f"{out_base.rstrip('/')}/{stage}"
    fsys.create_dir(stage_dir, recursive=True)
    # clear any previous attempt's data AND manifest AND orphaned manifest
    # tmp files (a crash between mkstemp and os.replace leaves one):
    # write_parquet appends part files, and a stale manifest must not
    # validate the mixed output
    for fi in _list_files(fsys, stage_dir):
        name = fi.path.rsplit("/", 1)[-1]
        if name.endswith((".parquet", ".tmp")) or name == MANIFEST_NAME:
            fsys.delete_file(fi.path)
    # strip schema-level metadata before writing: pandas-backed blocks
    # carry a 'pandas' schema-metadata dict, which makes the re-read
    # schema UNHASHABLE and defeats Ray's schema-dedup fast path in every
    # post-resume shuffle (same policy as sources.transcripts readers).
    # The SAME resolved filesystem carries the data write and the
    # manifest machinery — the split the r4 local-only rule guarded
    # against cannot happen.
    from miekki_ray.sources.transcripts import strip_schema_metadata
    strip_schema_metadata(ds).write_parquet(stage_dir, filesystem=fsys)
    # per-partition lineage: row count per written file
    import pyarrow.parquet as pq
    parts = []
    total = 0
    for fi in sorted(_list_files(fsys, stage_dir), key=lambda i: i.path):
        name = fi.path.rsplit("/", 1)[-1]
        if not name.endswith(".parquet"):
            continue
        with fsys.open_input_file(fi.path) as f:
            n = pq.ParquetFile(f).metadata.num_rows
        parts.append({"file": name, "rows": n})
        total += n
    manifest = {
        "stage": stage,
        "config_hash": config_hash,
        "upstream_hash": upstream_hash,
        "input_fingerprint": input_fp,
        "partitions": parts,
        "total_rows": total,
        "metrics": (metrics() if callable(metrics) else metrics) or {},
    }
    _publish_manifest(fsys, stage_dir,
                      json.dumps(manifest, indent=1, sort_keys=True)
                      .encode())
    return stage_dir


def read_stage(stage_dir: str, filesystem=None) -> ray.data.Dataset:
    # file_extensions filter: a leftover manifest tmp file (crash between
    # mkstemp and os.replace above) or any stray non-parquet file would
    # otherwise make read_parquet raise on every later resume; also
    # tolerates a legitimately EMPTY stage output (zero part files)
    fsys, base = resolve_fs(stage_dir, filesystem)
    return ray.data.read_parquet(base, filesystem=fsys,
                                 file_extensions=["parquet"])


def read_manifest(stage_dir: str, filesystem=None) -> dict:
    fsys, base = resolve_fs(stage_dir, filesystem)
    return json.loads(_read_bytes(fsys, _manifest_path(base)))


class StageRunner:
    """Resume-aware sequential runner: each stage is (name, fn) where fn
    maps the upstream Dataset to the stage's Dataset. If the stage's
    manifest validates against (config_hash, upstream manifest hash) the
    stage is SKIPPED and its parquet read back (SURVEY.md §3.3)."""

    def __init__(self, out_dir: str, config_hash: str, filesystem=None):
        # resolve ONCE: every stage read/write/validate below shares this
        # filesystem (explicit or URI-derived) — see resolve_fs
        self.fs, self.out_dir = resolve_fs(out_dir, filesystem)
        self.config_hash = config_hash
        self.ran: list[str] = []
        self.skipped: list[str] = []
        # per-stage wall seconds (compute + parquet write, i.e. the
        # durability-inclusive stage cost) — also persisted in each stage
        # manifest's metrics block so a RESUMED run can still attribute
        # where the original run's time went
        self.stage_sec: dict[str, float] = {}

    def run(self, stage: str, fn, upstream_dir: str | None = None,
            input_fp: str | None = None,
            metrics_fn=None,
            config_hash: str | None = None) -> tuple[ray.data.Dataset, str]:
        # config_hash: per-STAGE override of the runner-wide hash, for a
        # stage whose output depends on only a subset of the job's knobs
        # (run_curate: a pack-budget sweep must not invalidate the
        # expensive docs/clean/curated checkpoints whose outputs are
        # byte-identical). Knob changes in UPSTREAM stages still
        # invalidate downstream transitively through up_hash — the
        # upstream manifest embeds its own config_hash — so a stage's
        # hash needs only its OWN knobs, never its ancestors'.
        import time

        cfg_hash = config_hash if config_hash is not None \
            else self.config_hash
        stage_dir = f"{self.out_dir.rstrip('/')}/{stage}"
        up_hash = (manifest_hash(upstream_dir, filesystem=self.fs)
                   if upstream_dir else None)
        if manifest_valid(stage_dir, cfg_hash, up_hash,
                          upstream_required=upstream_dir is not None,
                          input_fp=input_fp, filesystem=self.fs):
            self.skipped.append(stage)
            self.stage_sec[stage] = stage_metrics(
                stage_dir, filesystem=self.fs).get("wall_sec", 0.0)
            return read_stage(stage_dir, filesystem=self.fs), stage_dir
        t0 = time.perf_counter()
        ds = fn()

        def _metrics():
            # runs inside write_stage AFTER the data write, so wall_sec
            # covers fn() + write_parquet — the full stage barrier
            base = dict((metrics_fn() if metrics_fn else None) or {})
            base["wall_sec"] = round(time.perf_counter() - t0, 3)
            self.stage_sec[stage] = base["wall_sec"]
            return base

        write_stage(ds, self.out_dir, stage, cfg_hash, up_hash,
                    input_fp=input_fp, metrics=_metrics,
                    filesystem=self.fs)
        self.ran.append(stage)
        return read_stage(stage_dir, filesystem=self.fs), stage_dir
