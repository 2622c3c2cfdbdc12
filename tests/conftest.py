"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session
(driver mandate), never per test/module."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    import ray.data

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """(turns, planted) — 200-conv planted-duplicate corpus, deterministic."""
    from miekki_ray.synth import synth_transcripts

    return synth_transcripts(200, 7)


@pytest.fixture(scope="session")
def cfg():
    from miekki_ray.config import DedupConfig

    # small shuffle width + small actor pools: tiny corpora pay fixed
    # per-actor/per-partition startup, not compute
    return DedupConfig(num_partitions=4, sketch_concurrency=2)
