"""Drop/skew observability for candidate-generation stages.

The LSH bucket caps in dedup.py / ann.py are deliberate skew guards
(degenerate content creates quadratic buckets), but dropping candidates
SILENTLY means a recall regression ships invisibly.  Stages accept an
optional ``metrics`` actor handle; every capped bucket fires a
fire-and-forget count into it, and callers read the totals after the
pipeline has been consumed.

A zero-CPU actor is the right Ray shape for a shared mutable counter: it
serializes increments without holding a scheduling slot, and handles are
closure-serializable into map_groups functions.  (Reference analog: the
stats accumulator dicts threaded through the ETL run,
``CMS_SynPuf_ETL_CDM_v5.py:2104-2113``.)
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class MetricCounterActor:
    """Named integer counters; add() is fire-and-forget from tasks."""

    def __init__(self):
        self._counts: dict[str, int] = {}

    def add(self, key: str, n: int = 1) -> None:
        self._counts[key] = self._counts.get(key, 0) + int(n)

    def get(self) -> dict:
        return dict(self._counts)

    def reset(self) -> None:
        self._counts = {}


def make_counter() -> "ray.actor.ActorHandle":
    return MetricCounterActor.remote()


def read_counter(handle: "ray.actor.ActorHandle") -> dict:
    """Totals so far.  Call only after the pipeline consuming the stage has
    executed (Datasets are lazy — counts accumulate during execution)."""
    return ray.get(handle.get.remote())
