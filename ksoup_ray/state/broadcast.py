"""Broadcast small-side state to every actor without reshipping per batch.

The pattern (ray_guide "Joins and lookups"): ``ray.put`` ONCE on the
driver, pass the ObjectRef in ``fn_constructor_kwargs``, ``ray.get`` in
the actor's ``__init__`` — zero-copy reads from the local object store,
one fetch per actor process instead of one per batch.

``Broadcast`` wraps that so pipeline code reads naturally:

    bl = Broadcast(blocklist_set)            # driver, once
    ds.map_batches(FilterStage, fn_constructor_kwargs={"blocklist": bl},
                   concurrency=(2, 8))

    class FilterStage:
        def __init__(self, blocklist):
            self.blocklist = blocklist.get()  # per actor, once
"""

from __future__ import annotations

from typing import Any


class Broadcast:
    """Driver-side handle for a broadcast value (picklable; carries only
    the ObjectRef across process boundaries)."""

    def __init__(self, value: Any):
        import ray

        self._ref = ray.put(value)

    def get(self) -> Any:
        import ray

        return ray.get(self._ref)

    @property
    def ref(self):
        return self._ref


class CounterActor:
    """Named counter actor for cross-stage metrics (used where lineage
    footers aren't enough, e.g. counting skipped rows mid-pipeline).

    Usage:
        import ray
        counter = ray.remote(CounterActor).options(
            name="extract_metrics", get_if_exists=True).remote()
        counter.add.remote("docs", n)   # fire-and-forget per batch
        ray.get(counter.totals.remote())
    """

    def __init__(self) -> None:
        self._counts: dict[str, int] = {}

    def add(self, key: str, n: int = 1) -> None:
        self._counts[key] = self._counts.get(key, 0) + n

    def totals(self) -> dict[str, int]:
        return dict(self._counts)
