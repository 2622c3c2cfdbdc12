"""A2 — per-stage metrics, accumulated in a named Ray actor.

SURVEY.md §2.5 / §4.2: "pairs emitted/capped, bucket-size histogram ...
record capped-bucket stats in metrics so recall claims stay honest". Batch
UDFs running in worker processes can't return side data, so counters flow
through one tiny named actor; the pipeline driver collects and embeds them
into lineage manifests / DedupResult.metrics.

Overhead: one actor call per TASK (flushed, not per batch-row), negligible
against shuffle cost.
"""

from __future__ import annotations

import uuid

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self.counters: dict[str, float] = {}
        self._seen: set[str] = set()

    def add(self, kv: dict[str, float], token: str | None = None) -> None:
        # idempotence under Ray task retry (r4 review): a re-executed task
        # (worker loss, lineage reconstruction) re-emits the same counters
        # with the SAME task id — exactly the failure-resume runs these
        # counters exist to audit would otherwise double-count. The token
        # is (task_id, caller-suffix, key-set); callers that emit more
        # than once per task (e.g. map_groups runs many groups per task)
        # MUST pass a per-call suffix that is stable across retries
        # (ADVICE r4: same-task emissions were silently deduped as
        # "retries", under-counting in normal runs).
        if token is not None:
            if token in self._seen:
                return
            self._seen.add(token)
        for k, v in kv.items():
            self.counters[k] = self.counters.get(k, 0) + v

    def snapshot(self) -> dict[str, float]:
        return dict(self.counters)


class MetricsSink:
    """Driver-side handle: create per pipeline run, pass `.name` into
    stages (workers reconnect by name), collect() at the end."""

    def __init__(self) -> None:
        self.name = f"miekki_metrics_{uuid.uuid4().hex[:8]}"
        self.actor = MetricsActor.options(name=self.name).remote()

    def collect(self) -> dict[str, float]:
        return ray.get(self.actor.snapshot.remote())

    def close(self) -> None:
        ray.kill(self.actor)


def emit(metrics_name: str | None, kv: dict[str, float],
         token_suffix: str | None = None) -> None:
    """ACKNOWLEDGED counter add from inside a worker task: the ray.get
    waits for the actor to apply the add before the task returns its own
    result, so a driver that has consumed the stage output can never
    collect() ahead of an in-flight add (fire-and-forget gave Ray no
    cross-caller ordering and silently dropped late counters). One ~ms
    round-trip per TASK — emit is called at task flush, not per batch.

    ``token_suffix``: REQUIRED when the caller can emit more than once in
    one Ray task (per-group emitters under ``map_groups``, per-batch
    emitters under ``map_batches``): pass a value that distinguishes the
    calls but is identical on a retry of the same work (the group key,
    the partition id). Without it, every emission after the first in a
    task is dropped as a presumed retry (ADVICE r4)."""
    if not metrics_name or not kv:
        return
    try:
        token = None
        tid = ray.get_runtime_context().get_task_id()
        if tid:   # None on the driver, where tasks are never retried
            sfx = f":{token_suffix}" if token_suffix is not None else ""
            token = f"{tid}{sfx}:{'|'.join(sorted(kv))}"
        actor = ray.get_actor(metrics_name)
        ray.get(actor.add.remote(kv, token))
    except (ValueError, ray.exceptions.RayActorError):
        # sink already closed (stage re-executed after collect, or a
        # task retry racing ray.kill): a dropped late counter is the
        # tolerated outcome — the acknowledged get must not convert it
        # into a stage failure
        pass
