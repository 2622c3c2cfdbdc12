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
