"""Side-channel drop/cap accounting — the "no silent caps" rule.

Any bounded guard in a distributed stage (LSH bucket caps, document-
frequency caps, iteration limits) MUST surface what it dropped. A
dataset stage can't return a second output, so drops are recorded on a
named zero-CPU counter actor that workers increment fire-and-forget and
the driver reads after the pipeline is consumed.

The actor is tiny (a dict of ints), created lazily in the current Ray
session/namespace, and shared by every stage in the job. Counts are
advisory observability — exactly-once under task retries is NOT
guaranteed (a retried batch re-increments); at corpus scale the counts
answer "did the cap trip, and roughly how hard", which is what the
honesty rule needs.
"""

from __future__ import annotations

import logging

import ray

logger = logging.getLogger(__name__)

_METRICS_ACTOR_NAME = "ksoup_ray_cap_metrics"
_METRICS_NAMESPACE = "ksoup_ray"


@ray.remote(num_cpus=0)
class _CapMetrics:
    def __init__(self):
        self._c: dict[str, int] = {}

    def add(self, key: str, n: int) -> None:
        self._c[key] = self._c.get(key, 0) + int(n)

    def get(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c = {}


def cap_metrics_actor():
    """Get-or-create the session-wide cap-metrics actor.

    ``lifetime="detached"`` so the actor outlives the worker that
    lazily created it (a plain named actor is reference-counted and
    would die with the first map task, losing the counts before the
    driver reads them). It is one dict-of-ints, num_cpus=0, and dies
    with the Ray cluster."""
    return _CapMetrics.options(
        name=_METRICS_ACTOR_NAME, get_if_exists=True,
        namespace=_METRICS_NAMESPACE, lifetime="detached").remote()


def record_drop(key: str, n: int, *, block: bool = True) -> None:
    """Record ``n`` dropped rows/buckets under ``key`` and log it.

    ``block=True`` waits for the increment to land so a caller that
    consumes the dataset and immediately reads the counters sees the
    update (cap trips are rare; the blocking round-trip is off the hot
    path by construction).
    """
    if n <= 0:
        return
    logger.warning("cap tripped: %s dropped %d", key, n)
    ref = cap_metrics_actor().add.remote(key, n)
    if block:
        ray.get(ref)


def read_cap_metrics() -> dict[str, int]:
    """All recorded drop counts (empty if no cap ever tripped)."""
    try:
        actor = ray.get_actor(_METRICS_ACTOR_NAME,
                              namespace=_METRICS_NAMESPACE)
    except ValueError:
        return {}
    return ray.get(actor.get.remote())


def reset_cap_metrics() -> None:
    try:
        actor = ray.get_actor(_METRICS_ACTOR_NAME,
                              namespace=_METRICS_NAMESPACE)
    except ValueError:
        return
    ray.get(actor.reset.remote())
