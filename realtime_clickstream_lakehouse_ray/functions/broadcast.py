"""Per-worker broadcast cache for stateless map_batches stages.

The broadcast pattern (``ray.put`` once on the driver, read in every
task) needs the *fetch + derived-state build* to run once per worker
process, not once per batch.  An actor pool gets that via ``__init__``
but couples the stage's parallelism to the pool size (a fixed cap
starves wide stages; an autoscaling pool starting at one actor
serializes short jobs — both measured in round 1).  Stateless tasks
with this module-level cache get the same amortization with Ray's
default task scheduling: one task per block, parallelism bounded only
by the cluster, and because Ray worker processes are reused across
tasks the cache hits after the first batch on each worker.

``ray.get`` of the same object in the same node is a shared-memory read
(no copy of the Arrow/numpy payload), so even a cold cache never ships
the broadcast value over the network twice.
"""

from __future__ import annotations

from typing import Any, Callable

import ray

_CACHE: dict[Any, Any] = {}


def get_broadcast(ref: "ray.ObjectRef", transform: Callable[[Any], Any] | None = None) -> Any:
    """Fetch ``ref`` (once per worker process) and memoize
    ``transform(value)`` — e.g. a sort/index build over the broadcast
    lookup table.  Keyed by the ObjectRef, so distinct broadcasts never
    collide; holding the ref also pins the object for the cache's
    lifetime."""
    if ref not in _CACHE:
        val = ray.get(ref)
        _CACHE[ref] = transform(val) if transform is not None else val
    return _CACHE[ref]
