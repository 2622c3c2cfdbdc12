"""M6 resume: manifest-validated stage skipping (SURVEY.md §3.3, §5.5)."""

import json
import os

import pyarrow as pa
import pytest
import ray.data

from miekki_ray.state.manifest import (
    StageRunner,
    manifest_valid,
    read_manifest,
    write_stage,
)


def _ds(n=10):
    return ray.data.from_arrow(pa.table({
        "x": pa.array(list(range(n)), type=pa.int64())}))


def test_write_stage_manifest(tmp_path):
    d = write_stage(_ds(), str(tmp_path), "s1", "cfg123")
    m = read_manifest(d)
    assert m["total_rows"] == 10
    assert m["config_hash"] == "cfg123"
    assert all(os.path.exists(os.path.join(d, p["file"]))
               for p in m["partitions"])
    assert manifest_valid(d, "cfg123", None)
    assert not manifest_valid(d, "OTHER", None)


def test_runner_skips_valid_stage(tmp_path):
    calls = []

    def make(tag):
        def f():
            calls.append(tag)
            return _ds()
        return f

    r1 = StageRunner(str(tmp_path), "cfgA")
    r1.run("docs", make("docs"))
    r1.run("uniq", make("uniq"), upstream_dir=os.path.join(tmp_path, "docs"))
    assert calls == ["docs", "uniq"]

    # resume: nothing re-runs
    r2 = StageRunner(str(tmp_path), "cfgA")
    r2.run("docs", make("docs2"))
    r2.run("uniq", make("uniq2"), upstream_dir=os.path.join(tmp_path, "docs"))
    assert calls == ["docs", "uniq"]
    assert r2.skipped == ["docs", "uniq"]


def test_config_change_invalidates(tmp_path):
    calls = []

    def f():
        calls.append(1)
        return _ds()

    StageRunner(str(tmp_path), "cfgA").run("s", f)
    StageRunner(str(tmp_path), "cfgB").run("s", f)
    assert len(calls) == 2


def test_crash_before_manifest_reruns(tmp_path):
    """Manifest-last discipline: data present but no manifest ⇒ re-run."""
    d = write_stage(_ds(), str(tmp_path), "s", "cfg")
    os.unlink(os.path.join(d, "_MANIFEST.json"))
    calls = []

    def f():
        calls.append(1)
        return _ds()

    r = StageRunner(str(tmp_path), "cfg")
    r.run("s", f)
    assert calls == [1]
    assert r.ran == ["s"]


def test_upstream_change_invalidates(tmp_path):
    d_up = write_stage(_ds(), str(tmp_path), "up", "cfg")
    r = StageRunner(str(tmp_path), "cfg")
    calls = []

    def f():
        calls.append(1)
        return _ds()

    r.run("down", f, upstream_dir=d_up)
    # rewrite upstream (different content hash in manifest)
    write_stage(_ds(5), str(tmp_path), "up", "cfg")
    r2 = StageRunner(str(tmp_path), "cfg")
    r2.run("down", f, upstream_dir=d_up)
    assert len(calls) == 2


def test_leftover_manifest_tmp_does_not_poison_stage(tmp_path):
    """A crash between mkstemp and os.replace leaves a *.tmp file in the
    stage dir; read_stage must still read (explicit parquet file list) and
    the next write_stage must clean it up."""
    d = write_stage(_ds(), str(tmp_path), "s1", "cfg123")
    with open(os.path.join(d, "tmpcrashed.tmp"), "w") as f:
        f.write("not parquet")
    from miekki_ray.state.manifest import read_stage
    assert read_stage(d).count() == 10          # tmp file ignored
    write_stage(_ds(7), str(tmp_path), "s1", "cfg123")
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
    assert read_stage(d).count() == 7


def test_dataset_input_never_reuses_other_datasets_checkpoint(
        small_corpus, cfg, tmp_path):
    """A DIFFERENT in-memory Dataset at the same out_dir+cfg must NOT
    resurrect the previous corpus's checkpoints (object-identity nonce)."""
    from miekki_ray.pipelines.dedup import run_dedup

    turns, _ = small_corpus
    ds_a = ray.data.from_arrow(turns)
    out = str(tmp_path / "run")
    r1 = run_dedup(ds_a, cfg, out_dir=out)
    n_a = r1.clusters.count()
    # a different corpus (half the rows), same out_dir + config
    ds_b = ray.data.from_arrow(turns.slice(0, turns.num_rows // 2))
    r2 = run_dedup(ds_b, cfg, out_dir=out)
    assert "docs" in r2.metrics["ran"]
    assert r2.clusters.count() != n_a


def test_read_transcripts_asserts_types(tmp_path):
    """Wrong column TYPE (not just name) must fail the read contract."""
    import pyarrow.parquet as pq

    from miekki_ray.sources.transcripts import read_transcripts

    bad = pa.table({
        "conv_id": pa.array(["c1"], type=pa.string()),
        "turn_idx": pa.array([1], type=pa.int64()),   # spec says int32
        "role": pa.array(["u"], type=pa.string()),
        "text": pa.array(["hi"], type=pa.string()),
        "tool": pa.array([""], type=pa.string()),
        "ts": pa.array([0], type=pa.timestamp("us")),
    })
    p = str(tmp_path / "bad")
    os.makedirs(p)
    pq.write_table(bad, os.path.join(p, "part-0.parquet"))
    with pytest.raises(ValueError, match="turn_idx"):
        read_transcripts(p)


def test_end_to_end_resume_identical(small_corpus, cfg, tmp_path):
    """SURVEY §5.5: run, wipe one stage's manifest, re-run → final output
    byte-identical; valid stages skipped."""
    import pandas as pd
    import pyarrow.parquet as pq

    from miekki_ray.pipelines.dedup import run_dedup

    turns, _ = small_corpus
    ds = ray.data.from_arrow(turns)
    out = str(tmp_path / "run")
    r1 = run_dedup(ds, cfg, out_dir=out)
    c1 = r1.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert set(r1.metrics["ran"]) >= {"docs", "pairs", "clusters"}

    # simulate crash in the verify stage: kill its manifest
    os.unlink(os.path.join(out, "verified", "_MANIFEST.json"))
    r2 = run_dedup(ds, cfg, out_dir=out)
    c2 = r2.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert "docs" in r2.metrics["skipped"]
    assert "verified" in r2.metrics["ran"]
    pd.testing.assert_frame_equal(c1, c2)


def test_pairs_manifest_carries_metrics(small_corpus, cfg, tmp_path):
    """The manifest contract is lineage + METRICS: the pairs stage
    manifest must carry the salted/capped recall accounting, a resumed
    run must recover the same counters from it, and DedupResult.metrics
    must expose them on both runs."""
    import json

    from miekki_ray.pipelines.dedup import run_dedup

    turns, _ = small_corpus
    ds = ray.data.from_arrow(turns)
    out = str(tmp_path / "runm")
    r1 = run_dedup(ds, cfg, out_dir=out)
    with open(os.path.join(out, "pairs", "_MANIFEST.json")) as f:
        m = json.load(f)["metrics"]
    # counters exist iff salting/caps fired on this corpus; either way
    # the manifest block and the result metrics must AGREE (timing keys —
    # wall_sec in the manifest, stage_sec in the result — are
    # nondeterministic instrumentation, excluded from the equality)
    def counters(d):
        return {k: v for k, v in d.items()
                if k not in ("ran", "skipped", "stage_sec", "wall_sec")}

    assert counters(r1.metrics) == counters(m)
    assert m["wall_sec"] > 0                      # timing recorded
    assert set(r1.metrics["stage_sec"]) == {
        "docs", "exact", "sketch", "pairs", "verified", "clusters"}
    r2 = run_dedup(ds, cfg, out_dir=out)          # full resume
    assert "pairs" in r2.metrics["skipped"]
    assert counters(r2.metrics) == counters(m)
    # a RESUMED run recovers each skipped stage's original wall_sec from
    # its manifest — attribution survives the skip
    assert r2.metrics["stage_sec"]["pairs"] == m["wall_sec"]


def test_ckpt_path_scale_switches_identical(small_corpus, tmp_path):
    """r4: the checkpointed path carries the SAME broadcast-exact and
    driver-narrow verify auto-switches as the in-memory flagship. Pin the
    two plans against each other THROUGH the checkpoint runner: default
    limits take the broadcast exact-dedup + verify_local branches; limits
    pinned to 0 force the fallback branches (full exact_dedup shuffle,
    attach_docs hash joins + distributed verify, label propagation).
    Clusters and verified tables must be identical either way."""
    import pandas as pd

    from miekki_ray.config import DedupConfig
    from miekki_ray.pipelines.dedup import run_dedup

    turns, _ = small_corpus
    cfg_fast = DedupConfig(num_partitions=4, sketch_concurrency=2)
    cfg_dist = DedupConfig(num_partitions=4, sketch_concurrency=2,
                           broadcast_loser_limit=0, driver_edge_limit=0,
                           driver_verify_pairs=0)
    a = run_dedup(ray.data.from_arrow(turns), cfg_fast,
                  out_dir=str(tmp_path / "fast"))
    b = run_dedup(ray.data.from_arrow(turns), cfg_dist,
                  out_dir=str(tmp_path / "dist"))
    ca = a.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    cb = b.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ca, cb)
    key = ["a", "b"]
    va = a.verified.to_pandas().sort_values(key).reset_index(drop=True)
    vb = b.verified.to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(va, vb)


def test_unknown_uri_scheme_fails_loudly():
    """r5 (VERDICT r4 Next #8): URIs now resolve through the pyarrow.fs
    adapter — but an unresolvable scheme must still fail loudly at
    construction, never silently checkpoint to a literal local path."""
    with pytest.raises(Exception):
        StageRunner("bogus-scheme://bucket/run1", "cfg")


def test_remote_fs_checkpoints_via_adapter(tmp_path):
    """r5 (VERDICT r4 Next #8): the manifest machinery runs against an
    EXPLICIT non-local pyarrow filesystem (SubTreeFileSystem as the
    object-store stand-in — same generic pafs API surface, no os.*):
    write + manifest-last publish (single-object branch, no .tmp
    residue), per-partition lineage, resume skip, clearing on re-run,
    and stage_metrics recovery all through the adapter."""
    from pyarrow import fs as pafs

    from miekki_ray.state.manifest import (StageRunner, read_manifest,
                                           stage_metrics)

    root = tmp_path / "bucket"
    root.mkdir()
    remote = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    calls = []

    def f():
        calls.append(1)
        return _ds(12)

    r1 = StageRunner("run1", "cfgA", filesystem=remote)
    out, d = r1.run("docs", f, metrics_fn=lambda: {"made_up": 2.0})
    assert out.count() == 12 and calls == [1]
    m = read_manifest(d, filesystem=remote)
    assert m["total_rows"] == 12
    assert sum(p["rows"] for p in m["partitions"]) == 12
    assert stage_metrics(d, filesystem=remote)["made_up"] == 2.0
    # non-local publish branch leaves no tmp residue in the stage dir
    names = [p.name for p in (root / "run1" / "docs").iterdir()]
    assert not [n for n in names if n.endswith(".tmp")]
    # resume: skipped through the adapter
    r2 = StageRunner("run1", "cfgA", filesystem=remote)
    out2, _ = r2.run("docs", f)
    assert calls == [1] and r2.skipped == ["docs"]
    assert out2.count() == 12
    # config change invalidates + re-run CLEARS the old part files (no
    # row duplication through write_parquet's append behavior)
    r3 = StageRunner("run1", "cfgB", filesystem=remote)
    out3, _ = r3.run("docs", lambda: _ds(5))
    assert out3.count() == 5
    assert read_manifest(d, filesystem=remote)["total_rows"] == 5


def test_metrics_add_idempotent_under_retry_token():
    """r4 review: a retried task re-emits its counters with the same task
    id — the actor must apply each (task, key-set) token once."""
    import ray

    from miekki_ray.state.metrics import MetricsSink

    sink = MetricsSink()
    try:
        ray.get(sink.actor.add.remote({"pairs": 5.0}, "task1:pairs"))
        ray.get(sink.actor.add.remote({"pairs": 5.0}, "task1:pairs"))
        ray.get(sink.actor.add.remote({"pairs": 2.0}, "task2:pairs"))
        ray.get(sink.actor.add.remote({"pairs": 1.0}, None))  # driver-side
        assert sink.collect() == {"pairs": 8.0}
    finally:
        sink.close()


def test_resume_pairs_from_persisted_sketch(small_corpus, cfg, tmp_path):
    """r5: band rows are no longer persisted — a crash in the pairs stage
    resumes by re-deriving band_explode from the PARQUET-backed sketch
    stage (sig/psig round-trip through parquet list columns) and the
    final clusters must be byte-identical."""
    import pandas as pd

    from miekki_ray.pipelines.dedup import run_dedup

    turns, _ = small_corpus
    ds = ray.data.from_arrow(turns)
    out = str(tmp_path / "runp")
    r1 = run_dedup(ds, cfg, out_dir=out)
    c1 = r1.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    # simulate crash in the pairs stage: kill its manifest
    os.unlink(os.path.join(out, "pairs", "_MANIFEST.json"))
    r2 = run_dedup(ds, cfg, out_dir=out)
    assert "sketch" in r2.metrics["skipped"]
    assert "pairs" in r2.metrics["ran"]
    c2 = r2.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c2)
