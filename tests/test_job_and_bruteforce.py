"""Smoke tests: the `ray job submit` entry point (miekki_ray/job.py) and
the brute-force exact-Jaccard pair baseline vs the in-repo oracle."""

import json

import numpy as np
import pytest
import ray.data


@pytest.fixture(scope="module")
def turns_path(tmp_path_factory, small_corpus):
    import pyarrow.parquet as pq

    turns, _ = small_corpus
    d = tmp_path_factory.mktemp("turns")
    pq.write_table(turns, str(d / "part-0.parquet"))
    return str(d)


def test_job_main_runs_and_resumes(turns_path, tmp_path, capsys):
    from miekki_ray.job import main

    out = str(tmp_path / "run")
    rc = main(["--turns", turns_path, "--out", out,
               "--num-partitions", "8"])
    assert rc == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["clusters_rows"] > 0
    assert first["stages_skipped"] == []
    # second submit resumes past every stage
    rc = main(["--turns", turns_path, "--out", out,
               "--num-partitions", "8"])
    assert rc == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["stages_ran"] == []
    assert second["clusters_rows"] == first["clusters_rows"]
    # the WRITTEN keep_list must not accumulate rows across re-submits
    # (write_parquet appends uuid-named files; job.py must replace the dir)
    import pyarrow.dataset as pads

    written = pads.dataset(f"{out}/keep_list").count_rows()
    assert written == first["keep_rows"]


def test_curate_job_runs_and_resumes(turns_path, tmp_path, capsys):
    """--pipeline curate: docs -> filter -> keep-first -> pack as a
    checkpointed job; a re-submit resumes past every stage (VERDICT r3
    #8: the curation composition as a job-CLI workload)."""
    from miekki_ray.job import main

    out = str(tmp_path / "curate_run")
    argv = ["--turns", turns_path, "--out", out, "--pipeline", "curate",
            "--num-partitions", "8", "--min-words", "5",
            "--min-alpha-ratio", "0.5"]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["packed_rows"] > 0
    assert first["bins"] >= 1
    assert first["stages_skipped"] == []
    assert first["stages_ran"] == ["docs", "curated", "packed"]
    assert main(argv) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["stages_ran"] == []
    assert second["packed_rows"] == first["packed_rows"]


def test_run_curate_ckpt_matches_inmemory_and_invalidates(
        turns_path, tmp_path, cfg):
    """The checkpointed curation path must be output-identical to the
    pure-lazy composition (the scale_paths discipline), and a changed
    semantic knob must invalidate exactly the stages whose output it
    changes — per-stage config hashes (r4): a pack-budget sweep must NOT
    recompute the docs shuffle or the quality filter."""
    from miekki_ray.pipelines.curate import run_curate

    kw = dict(min_words=5, min_alpha_ratio=0.5, budget=64)
    mem, _ = run_curate(turns_path, cfg, **kw)
    out = str(tmp_path / "ck")
    ck, m1 = run_curate(turns_path, cfg, out_dir=out, **kw)
    a = mem.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = ck.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert m1["skipped"] == []
    # budget is a pack-only knob: ONLY packed re-runs
    _, m2 = run_curate(turns_path, cfg, out_dir=out,
                       min_words=5, min_alpha_ratio=0.5, budget=32)
    assert m2["ran"] == ["packed"]
    assert m2["skipped"] == ["docs", "curated"]
    # min_words feeds the curated stage: curated re-runs, and packed
    # follows transitively (its upstream manifest hash changed)
    _, m3 = run_curate(turns_path, cfg, out_dir=out,
                       min_words=6, min_alpha_ratio=0.5, budget=32)
    assert m3["ran"] == ["curated", "packed"]
    assert m3["skipped"] == ["docs"]
    # the refined outputs still match a from-scratch in-memory run
    mem3, _ = run_curate(turns_path, cfg, min_words=6,
                         min_alpha_ratio=0.5, budget=32)
    ck3, m4 = run_curate(turns_path, cfg, out_dir=out, min_words=6,
                         min_alpha_ratio=0.5, budget=32)
    assert m4["ran"] == []
    a3 = mem3.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b3 = ck3.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a3.equals(b3)


def test_run_curate_decontaminates(turns_path, tmp_path, cfg, small_corpus):
    """bench_docs wiring: a benchmark doc sharing its text with a corpus
    conversation removes that conversation before packing, and a swapped
    benchmark set invalidates the clean checkpoint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from miekki_ray.pipelines.curate import _turns_to_docs, run_curate

    turns, _ = small_corpus
    docs = _turns_to_docs(ray.data.from_arrow(turns), cfg).to_pandas()
    victim = docs.sort_values("doc_id").iloc[0]
    bench = str(tmp_path / "bench.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([0], type=pa.int64()),
                             "text": pa.array([victim["text"]])}), bench)
    kw = dict(min_words=5, min_alpha_ratio=0.5, budget=64)
    out = str(tmp_path / "ck")
    clean, m1 = run_curate(turns_path, cfg, out_dir=out,
                           bench_docs=bench, **kw)
    assert m1["ran"] == ["docs", "clean", "curated", "packed"]
    ids = set(clean.to_pandas()["doc_id"])
    assert int(victim["doc_id"]) not in ids
    # same job re-submitted: full resume
    _, m2 = run_curate(turns_path, cfg, out_dir=out,
                       bench_docs=bench, **kw)
    assert m2["ran"] == []
    # a DIFFERENT benchmark file at the same path invalidates clean
    # (and downstream) but not the docs root
    pq.write_table(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                             "text": pa.array(["nothing in common"])}),
                   bench)
    _, m3 = run_curate(turns_path, cfg, out_dir=out,
                       bench_docs=bench, **kw)
    assert m3["skipped"] == ["docs"]
    assert m3["ran"] == ["clean", "curated", "packed"]
    # decontamination OFF: "curated"'s upstream flips from the clean dir
    # to the docs dir, so curated+packed re-run off the unchanged docs
    # root — no knob needed, the upstream-manifest hash carries it
    _, m4 = run_curate(turns_path, cfg, out_dir=out, **kw)
    assert m4["skipped"] == ["docs"]
    assert m4["ran"] == ["curated", "packed"]


def test_bruteforce_jaccard_matches_oracle(small_corpus, cfg):
    from miekki_ray.oracle import exact_pairs
    from miekki_ray.stages.docs import reconstruct_docs
    from miekki_ray.stages.verify import jaccard_pairs_bruteforce

    turns, _ = small_corpus
    docs = reconstruct_docs(ray.data.from_arrow(turns), cfg).materialize()
    got = jaccard_pairs_bruteforce(docs, cfg).to_pandas()
    want = exact_pairs(turns, cfg.k)
    want = want[want["jaccard"] >= cfg.jaccard_threshold]
    got_pairs = set(zip(got["a"], got["b"]))
    want_pairs = set(zip(want["a"], want["b"]))
    assert got_pairs == want_pairs
    # jaccard values agree to rounding
    wj = {(a, b): j for a, b, j in
          zip(want["a"], want["b"], want["jaccard"])}
    for a, b, j in zip(got["a"], got["b"], got["jaccard"]):
        assert abs(wj[(a, b)] - j) < 1e-5
