#!/usr/bin/env python
"""Bench harness (SURVEY.md §7 M7).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "turns": n, "turns_per_sec": r}

--scaling: runs the headline dedup at N and 4N cpus (default 4 and 16;
$MIEKKI_SCALING_CPUS) in FRESH processes on the same input (default 1M
convs / 19.9M turns, $MIEKKI_SCALING_CONVS; ~75 min total) — min wall of
$MIEKKI_SCALING_TRIALS (default 3) trials per leg — and reports both
throughputs, the scaling efficiency (the sandbox substitute for N- vs
4N-node clusters — driver instruction; BASELINE.md row 'scaling
efficiency'), and two same-run host-substrate probes (pure-CPU and
DRAM-bandwidth parallel ceilings) that bound what ANY engine could
measure on this virtualized box.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("MIEKKI_BENCH_CONVS", "50000"))
BENCH_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH", "data")


def _bench_corpus() -> str:
    """Deterministic synthetic transcript corpus (FIXTURES.md §B), generated
    ONCE into BENCH/data and reused across runs/parallelism levels."""
    path = os.path.join(BENCH_DATA, f"turns_{BENCH_CONVS}")
    if not os.path.isdir(path):
        # generate into a tmp dir and rename INTO PLACE atomically: an
        # interrupted generation must not leave a partial corpus that
        # later runs silently benchmark as if complete
        tmp = path + ".generating"
        if os.path.isdir(tmp):
            import shutil
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        from miekki_ray.synth import synth_transcripts
        import pyarrow.parquet as pq
        turns, _ = synth_transcripts(BENCH_CONVS, 42)
        # a DIRECTORY of files: a single parquet file reads as ONE Ray task
        # (serial 1.1 GB scan); 32 files parallelize the read
        n_files = 32
        rows = turns.num_rows
        step = (rows + n_files - 1) // n_files
        for i in range(n_files):
            pq.write_table(turns.slice(i * step, step),
                           os.path.join(tmp, f"part-{i:04d}.parquet"),
                           row_group_size=50_000)
        os.rename(tmp, path)
    return path


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # push-based sort shuffle parallelizes the wide stages measurably
    # better at high core counts (measured: 38.2s -> 33.0s at 32 cpus on
    # the 1M-turn corpus, unchanged at 8)
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def run_bench(num_cpus: int) -> dict:
    _init_ray(num_cpus)
    import ray.data

    from miekki_ray.adapter import documents_as_turns
    from miekki_ray.config import DedupConfig
    from miekki_ray.pipelines.dedup import dedup_datasets
    from miekki_ray import relational as R

    from miekki_ray.sources.transcripts import read_transcripts

    # num_partitions = 4x cpus: the coarse-partition groupbys run through
    # Ray's SORT shuffle, whose range partitioner degenerates when the key
    # has only ~num_cpus distinct values (boundary sampling can't split a
    # 16-value key into balanced ranges; measured 500k convs @16 cpus:
    # docs stage 59 s at P=16 -> 9.3 s at P=64). More distinct partition
    # values than executors = balanced ranges + finer pipelining.
    cfg = DedupConfig(num_partitions=4 * num_cpus,
                      sketch_concurrency=max(2, num_cpus - 2))
    q: dict[str, float] = {}

    # headline: flagship dedup over the synthetic transcript corpus
    # (FIXTURES.md §B bench scale). Warm-up: a SMALL untimed dedup (50k
    # turns) so worker processes import the library and task/actor pools
    # exist. Deliberately NOT a full-corpus warm-up: repeated full runs in
    # one Ray session DEGRADE monotonically (measured 94 s -> 147 s ->
    # 190 s back-to-back at 16 cpus — object-store accumulation), so the
    # honest steady-state number is the FIRST full run after a light
    # warm-up in a fresh session.
    corpus = _bench_corpus()
    # block count pinned to the file count: the default parquet splitter
    # fans a 32-file corpus into ~224 small blocks, which multiplies sort
    # fan-in (500k convs @16 cpus: 196 s -> 135 s from this alone)
    onb = 32

    def rd():
        return read_transcripts(corpus, override_num_blocks=onb)

    n_turns = rd().count()
    dedup_datasets(rd().limit(50000), cfg).clusters.count()
    import gc

    gc.collect()

    t0 = time.perf_counter()
    res = dedup_datasets(rd(), cfg)
    n_clusters = res.clusters.count()
    dedup_sec = round(time.perf_counter() - t0, 3)
    q["dedup_flagship"] = dedup_sec

    if not os.environ.get("MIEKKI_BENCH_ONLY_FLAGSHIP"):
        # secondary: flagship over the driver documents table + relational
        t0 = time.perf_counter()
        dedup_datasets(documents_as_turns(SF_DIR), cfg).clusters.count()
        q["dedup_documents_sf"] = round(time.perf_counter() - t0, 3)

        q["lineitem_agg"] = _time(
            lambda: R.lineitem_agg(SF_DIR).to_pandas())
        q["orders_join_customer_top10"] = _time(
            lambda: R.orders_join_customer_top10(SF_DIR).to_pandas())
        q["documents_dup_clusters"] = _time(
            lambda: R.documents_dup_clusters(SF_DIR).to_pandas())
        q["reconstruct_docs"] = _time(
            lambda: __import__("__ray_entry__")._reconstruct_docs(SF_DIR)
            .count())
        q["lineitem_semi_hot_orders"] = _time(
            lambda: R.lineitem_semi_hot_orders(SF_DIR).to_pandas())
        q["documents_tfidf_top_terms"] = _time(
            lambda: R.documents_tfidf_top_terms(SF_DIR).to_pandas())

        # e2e curation composition — the closest bench shape to the real
        # 100-TB workload (decontaminate -> filter -> keep-first -> pack
        # as ONE lazy graph; VERDICT r3 #8)
        q["documents_curation_e2e"] = _time(
            lambda: __import__("__ray_entry__")
            ._documents_curation_e2e(SF_DIR).count())

        # checkpointed flagship (run_dedup out_dir mode): every stage
        # barrier becomes partitioned parquet + a lineage manifest — the
        # resumable 10^12-turn shape. Timed against a FRESH out_dir (a
        # warm dir would time the resume fast-path); the delta vs
        # dedup_flagship is the durability tax (stage write + re-read).
        import shutil
        import tempfile

        from miekki_ray.pipelines.dedup import run_dedup
        ckpt_dir = tempfile.mkdtemp(prefix="miekki_bench_ckpt_")
        try:
            t0 = time.perf_counter()
            run_dedup(rd(), cfg, out_dir=ckpt_dir).clusters.count()
            q["dedup_flagship_ckpt"] = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(ckpt_dir, ignore_errors=True)

    total = round(sum(q.values()), 3)
    return {
        "metric": "headline_pipeline_sec",
        "value": dedup_sec,
        "unit": "sec",
        "queries": q,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "turns": n_turns,
        "clusters": n_clusters,
        "turns_per_sec": round(n_turns / dedup_sec, 1),
        "total_sec": total,
    }


def _host_cpu_probe(n_procs: int, seconds: float = 4.0) -> float:
    """Aggregate pure-CPU throughput (iterations) of n_procs concurrent
    processes running an L1-resident uint64 hash loop — measures what the
    VIRTUALIZED host actually delivers at that parallelism, independent of
    Ray or this engine. On this sandbox the host grants 8 procs ~97% of
    linear but 32 procs only ~63% (oversubscribed/throttled vCPUs), capping
    ANY engine's measured 8->32 efficiency at ~0.65."""
    import multiprocessing as mp

    import numpy as np

    def burn(q):
        x = np.arange(200_000, dtype=np.uint64)
        t0 = time.perf_counter()
        it = 0
        while time.perf_counter() - t0 < seconds:
            with np.errstate(over="ignore"):
                x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(12345)
                x ^= x >> np.uint64(31)
            it += 1
        q.put(it)

    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(n_procs)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return float(total)


def _host_membw_probe(n_procs: int, seconds: float = 4.0) -> float:
    """Aggregate DRAM-streaming throughput (array-sum passes over a 100 MB
    working set per process). The sketch/shuffle stages are memory-
    streaming; a co-tenant consuming host DRAM bandwidth slows THEM while
    leaving the L1-resident CPU probe untouched (observed: identical
    16-cpu runs ranged 77-120 s while the CPU probe stayed ~0.94)."""
    import multiprocessing as mp

    import numpy as np

    def stream(q):
        a = np.ones(12_500_000, dtype=np.float64)   # 100 MB
        t0 = time.perf_counter()
        it = 0
        while time.perf_counter() - t0 < seconds:
            it += int(a.sum() > 0)
        q.put(it)

    q = mp.Queue()
    ps = [mp.Process(target=stream, args=(q,)) for _ in range(n_procs)]
    [p.start() for p in ps]
    total = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return float(total)


def _paired_median(pairs: list[dict]) -> float:
    """Median per-pair efficiency for the paired-interleaved protocol.

    A resumed pair's legs were measured in DIFFERENT host windows —
    exactly the cross-window bias pairing exists to cancel — so when any
    fully back-to-back pair exists, the median uses ONLY those; resumed
    pairs stay in the run record for forensics (ADVICE r3)."""
    fresh = [p for p in pairs if not p.get("resumed")] or pairs
    effs = sorted(p["eff"] for p in fresh)
    mid = len(effs) // 2
    return effs[mid] if len(effs) % 2 else round(
        (effs[mid - 1] + effs[mid]) / 2, 3)


def run_scaling() -> dict:
    """Same job, fresh ray sessions at N and 4N CPUs (driver-mandated
    substitute for N- vs 4N-node clusters). Default N=4 (i.e. 4 vs 16
    cpus): the sandbox host oversubscribes its advertised 32 vCPUs — a
    pure-CPU probe (no Ray) shows 32 concurrent processes get only ~2.6x
    the aggregate throughput of 8, a ~0.65 hardware ceiling that no
    engine can exceed at 8/32. 4-vs-16 stays inside the host's honest
    capacity region (probe ceiling ~0.79-0.9). Both the engine ratio and
    the same-parallelism host probe are reported so the substrate ceiling
    is visible next to the engine number."""
    # default 1M convs (19.9M turns): the corpus where the fixed
    # orchestration term amortizes and the protocol run measures 0.958
    # (>= the 0.8 spec bar); 500k halves the runtime but reads ~0.69-0.72
    # because F is 8-10% of the 16-cpu wall there (BENCH/BASELINE.md)
    scaling_convs = os.environ.get("MIEKKI_SCALING_CONVS", "1000000")
    lo_cpu, hi_cpu = (int(x) for x in os.environ.get(
        "MIEKKI_SCALING_CPUS", "4,16").split(","))

    trials = int(os.environ.get("MIEKKI_SCALING_TRIALS", "3"))

    # Trial-level checkpoint (MIEKKI_SCALING_CKPT=<path>): each completed
    # fresh-process trial is appended as one JSON line; on start, finished
    # trials are reused. Trials are independent subprocesses, so resuming
    # is exactly equivalent to an uninterrupted run — this exists because
    # the sandbox host restarts kill 45-75 min runs partway through.
    # Records carry a config fingerprint; a record from a different corpus
    # size / cpu pair / input dir is skipped (re-run), never blended.
    ckpt_path = os.environ.get("MIEKKI_SCALING_CKPT")
    paired = bool(os.environ.get("MIEKKI_SCALING_PAIRED"))
    # protocol is part of the fingerprint: a legacy (leg-after-leg) ckpt
    # resumed under paired mode would pair trials measured hours apart —
    # the exact bias the paired protocol exists to cancel
    ckpt_fp = {"convs": scaling_convs, "cpus": [lo_cpu, hi_cpu],
               "sf": SF_DIR, "protocol": "paired" if paired else "legacy"}
    ckpt: dict[tuple[int, int], dict] = {}
    if ckpt_path and os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            for line in f:
                if line.strip():
                    rec = json.loads(line)
                    if rec.get("fp") == ckpt_fp:
                        ckpt[(rec["ncpu"], rec["trial"])] = rec["result"]

    def run_trial(ncpu: int, i: int) -> dict:
        """One fresh-process trial, checkpoint-aware."""
        if (ncpu, i) in ckpt:
            return ckpt[(ncpu, i)]
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   MIEKKI_BENCH_CONVS=scaling_convs,
                   MIEKKI_BENCH_ONLY_FLAGSHIP="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        r = json.loads(out.strip().splitlines()[-1])
        ckpt[(ncpu, i)] = r
        if ckpt_path:
            with open(ckpt_path, "a") as f:
                f.write(json.dumps({"ncpu": ncpu, "trial": i,
                                    "fp": ckpt_fp, "result": r}) + "\n")
        return r

    ratio = hi_cpu / lo_cpu
    pairs = None
    if paired:
        # Paired-interleaved protocol: each trial runs the lo and hi legs
        # BACK-TO-BACK so both sample (nearly) the same host window, and
        # the estimate is the MEDIAN of per-pair ratios. The legacy
        # protocol (min per leg across trials run leg-after-leg) is
        # unbiased only on a stationary host; this box's grant swings
        # >20% between windows (observed same-run cpu probes 0.35-1.21),
        # which biases a ratio of minima taken from DIFFERENT windows.
        # Pairing cancels the common window factor; the median is robust
        # to a polluted pair. Per-pair probes are logged for forensics.
        pairs = []
        for i in range(trials):
            # a pair resumed from the ckpt was NOT measured back-to-back
            # in this process — flag it so the forensics stay honest
            resumed = (lo_cpu, i) in ckpt or (hi_cpu, i) in ckpt
            plo, phi = run_trial(lo_cpu, i), run_trial(hi_cpu, i)
            pairs.append({
                "sec_lo": plo["value"], "sec_hi": phi["value"],
                "eff": round((plo["value"] / phi["value"]) / ratio, 3),
                "cpu_probe": round(
                    (_host_cpu_probe(hi_cpu) / _host_cpu_probe(lo_cpu))
                    / ratio, 3),
                "resumed": resumed})
        eff = _paired_median(pairs)
        lo = min((ckpt[(lo_cpu, i)] for i in range(trials)),
                 key=lambda r: r["value"])
        hi = min((ckpt[(hi_cpu, i)] for i in range(trials)),
                 key=lambda r: r["value"])
    else:
        # min across fresh-process trials per leg — the noise-robust
        # estimator of unloaded capability on a STATIONARY host (±25%
        # run-to-run noise observed: 77-94 s at 16 cpus, identical code)
        lo = min((run_trial(lo_cpu, i) for i in range(trials)),
                 key=lambda r: r["value"])
        hi = min((run_trial(hi_cpu, i) for i in range(trials)),
                 key=lambda r: r["value"])
        eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / ratio
    tput_lo, tput_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    probe_lo = _host_cpu_probe(lo_cpu)
    probe_hi = _host_cpu_probe(hi_cpu)
    host_ceiling = (probe_hi / probe_lo) / ratio
    bw_lo = _host_membw_probe(lo_cpu)
    bw_hi = _host_membw_probe(hi_cpu)
    bw_ceiling = (bw_hi / bw_lo) / ratio
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo_cpu, "cpus_hi": hi_cpu,
        "sec_lo": lo["value"], "sec_hi": hi["value"],
        "turns_per_sec_lo": tput_lo, "turns_per_sec_hi": tput_hi,
        "host_cpu_ceiling": round(host_ceiling, 3),
        "host_membw_ceiling": round(bw_ceiling, 3),
        "eff_vs_host_ceiling": round(eff / host_ceiling, 3),
        "turns": lo["turns"], "sf": SF_DIR,
    }
    if pairs is not None:
        out["protocol"] = "paired_median"
        out["pairs"] = pairs
        # .get: a checkpoint record from an older protocol version may
        # lack the flag — _paired_median treats those as fresh (pinned by
        # test_missing_resumed_key_treated_as_fresh); match that here
        out["pairs_in_median"] = sum(
            1 for p in pairs if not p.get("resumed")) or len(pairs)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        result = run_bench(NUM_CPUS)
        print(json.dumps(result))
        import ray
        ray.shutdown()
