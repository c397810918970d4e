"""Broadcast small-side lookups: ``ray.put`` once, read per task/actor.

Replaces the reference's read-modify-write entity lookup against live
Neo4j (/root/reference/graphrag/core/triplets.py:252-343) with an immutable
alias dictionary shipped through the object store — no shuffle, no
re-serialization per batch (SURVEY.md J1/T3).
"""

from __future__ import annotations

from typing import Any

import ray


def broadcast(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


class BroadcastLookup:
    """Lazily-resolved handle usable inside map_batches closures; the
    object is fetched from the local object store once per worker process
    (zero-copy for Arrow/numpy payloads)."""

    def __init__(self, ref: "ray.ObjectRef"):
        self.ref = ref
        self._value: Any = None
        self._resolved = False

    def get(self) -> Any:
        if not self._resolved:
            self._value = ray.get(self.ref)
            self._resolved = True
        return self._value

    def __reduce__(self):  # keep only the ref when pickled into tasks
        return (BroadcastLookup, (self.ref,))
