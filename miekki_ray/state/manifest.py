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


def require_local_path(path, what: str) -> None:
    """The checkpoint/lineage machinery is LOCAL-FILESYSTEM only: clearing,
    listing, fingerprinting and the atomic manifest rename all go through
    os.*. A URI (s3://...) out_dir would let write_parquet target object
    storage while this module silently operates on a literal local
    './s3:/...' directory — no clearing (duplicate rows on resume), empty
    per-partition lineage, and a constant input fingerprint that validates
    stale corpora (r4 review). Fail loudly instead; multi-node runs need a
    shared mount (NFS/FUSE) until a pyarrow.fs port of this module exists."""
    if "://" in str(path):
        raise ValueError(
            f"{what} {path!r} is a URI: stage checkpointing requires a "
            "local (or shared-mount) filesystem path — the manifest "
            "machinery uses os.* listing, clearing and atomic renames, "
            "which silently no-op against object storage")


def stage_metrics(stage_dir: str) -> dict:
    """The 'metrics' block of a stage manifest ({} if absent/unreadable)
    — how a RESUMED run recovers the counters its skipped stage recorded
    when it originally executed."""
    try:
        with open(_manifest_path(stage_dir)) as f:
            return json.load(f).get("metrics", {}) or {}
    except (OSError, ValueError):
        return {}


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST_NAME)


def manifest_hash(stage_dir: str) -> str | None:
    """Content hash of a stage's manifest (used as downstream upstream_hash)."""
    p = _manifest_path(stage_dir)
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return hashlib.blake2b(f.read(), digest_size=16).hexdigest()


def input_fingerprint(paths) -> str:
    """Identity of a ROOT stage's input: file paths + sizes + mtimes,
    hashed. Without this, a re-run against a DIFFERENT corpus but the same
    out_dir + config would silently reuse the stale root checkpoint."""
    if isinstance(paths, str):
        paths = [paths]
    entries = []
    for p in paths:
        require_local_path(p, "input path")
        if os.path.isdir(p):
            # recursive: hive/date-partitioned layouts keep their files in
            # subdirectories — a top-level-only listing would fingerprint
            # every such corpus to the same empty list
            for root, dirs, files in os.walk(p):
                dirs.sort()
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    entries.append((fp, st.st_size, int(st.st_mtime_ns)))
        elif os.path.isfile(p):
            st = os.stat(p)
            entries.append((p, st.st_size, int(st.st_mtime_ns)))
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
                   input_fp: str | None = None) -> bool:
    """A checkpoint is reusable iff its manifest parses AND config hash,
    upstream manifest hash, and (for root stages) the input fingerprint all
    match. ``upstream_required=True`` with a missing upstream manifest
    (upstream_hash None) invalidates — an orphaned downstream checkpoint
    must not validate against a vanished upstream."""
    p = _manifest_path(stage_dir)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    if m.get("config_hash") != config_hash:
        return False
    if upstream_required and upstream_hash is None:
        return False
    if upstream_hash is not None and m.get("upstream_hash") != upstream_hash:
        return False
    if input_fp is not None and m.get("input_fingerprint") != input_fp:
        return False
    # per-partition check: every listed file still on disk
    for part in m.get("partitions", []):
        if not os.path.exists(os.path.join(stage_dir, part["file"])):
            return False
    return True


def write_stage(ds: ray.data.Dataset, out_dir: str, stage: str,
                config_hash: str, upstream_hash: str | None = None,
                metrics=None,
                input_fp: str | None = None) -> str:
    """Write stage output + manifest (manifest LAST, atomic tmp+rename).
    Returns the stage directory. ``metrics`` may be a dict or a CALLABLE
    invoked after the data write — stage counters (MetricsSink) only
    exist once execution has run, which happens inside write_parquet."""
    require_local_path(out_dir, "checkpoint out_dir")
    stage_dir = os.path.join(out_dir, stage)
    os.makedirs(stage_dir, exist_ok=True)
    # clear any previous attempt's data AND manifest AND orphaned manifest
    # tmp files (a crash between mkstemp and os.replace leaves one):
    # write_parquet appends part files, and a stale manifest must not
    # validate the mixed output
    for f in os.listdir(stage_dir):
        if f.endswith((".parquet", ".tmp")) or f == MANIFEST_NAME:
            os.unlink(os.path.join(stage_dir, f))
    # strip schema-level metadata before writing: pandas-backed blocks
    # carry a 'pandas' schema-metadata dict, which makes the re-read
    # schema UNHASHABLE and defeats Ray's schema-dedup fast path in every
    # post-resume shuffle (same policy as sources.transcripts readers)
    from miekki_ray.sources.transcripts import strip_schema_metadata
    strip_schema_metadata(ds).write_parquet(stage_dir)
    # per-partition lineage: row count per written file
    import pyarrow.parquet as pq
    parts = []
    total = 0
    for f in sorted(os.listdir(stage_dir)):
        if not f.endswith(".parquet"):
            continue
        n = pq.ParquetFile(os.path.join(stage_dir, f)).metadata.num_rows
        parts.append({"file": f, "rows": n})
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
    fd, tmp = tempfile.mkstemp(dir=stage_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(stage_dir))   # atomic
    return stage_dir


def read_stage(stage_dir: str) -> ray.data.Dataset:
    # file_extensions filter: a leftover manifest tmp file (crash between
    # mkstemp and os.replace above) or any stray non-parquet file would
    # otherwise make read_parquet raise on every later resume; also
    # tolerates a legitimately EMPTY stage output (zero part files)
    return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])


def read_manifest(stage_dir: str) -> dict:
    with open(_manifest_path(stage_dir)) as f:
        return json.load(f)


class StageRunner:
    """Resume-aware sequential runner: each stage is (name, fn) where fn
    maps the upstream Dataset to the stage's Dataset. If the stage's
    manifest validates against (config_hash, upstream manifest hash) the
    stage is SKIPPED and its parquet read back (SURVEY.md §3.3)."""

    def __init__(self, out_dir: str, config_hash: str):
        require_local_path(out_dir, "checkpoint out_dir")
        self.out_dir = out_dir
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
        stage_dir = os.path.join(self.out_dir, stage)
        up_hash = manifest_hash(upstream_dir) if upstream_dir else None
        if manifest_valid(stage_dir, cfg_hash, up_hash,
                          upstream_required=upstream_dir is not None,
                          input_fp=input_fp):
            self.skipped.append(stage)
            self.stage_sec[stage] = stage_metrics(stage_dir).get(
                "wall_sec", 0.0)
            return read_stage(stage_dir), stage_dir
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
                    input_fp=input_fp, metrics=_metrics)
        self.ran.append(stage)
        return read_stage(stage_dir), stage_dir
