"""
Identity-keyed device-residency caches.

Several hot paths keep device copies of immutable host structures alive
across calls (the serving CSR, the kNN resident Gram structure, per-row
scale vectors), all with the same shape of logic: key by ``id(obj)`` with a
weakref identity guard (so a recycled id can never serve a stale value), a
weakref finalizer that drops the entry when the host object dies, and a
bounded FIFO eviction.  ``ResidentCache`` centralizes that logic — it was
previously hand-rolled in three places with divergent bounds and no shared
invalidation, which is how ``invalidate_device_cache`` once missed the kNN
caches (round-5 review).

Every instance registers itself so :func:`invalidate_all_residency` can
sweep the lot; ``lkpy_tpu.batch.device.invalidate_device_cache`` calls it.
"""

from __future__ import annotations

import weakref
from typing import Any, Hashable

__all__ = ["ResidentCache", "invalidate_all_residency"]

#: weak registry: short-lived caches (tests, per-session instances) are
#: collectable and do not accumulate in the sweep list
_REGISTRY: "weakref.WeakSet[ResidentCache]" = weakref.WeakSet()


def invalidate_all_residency() -> None:
    """Clear every live registered :class:`ResidentCache`."""
    for cache in list(_REGISTRY):
        cache.clear()


class ResidentCache:
    """A bounded cache of per-object device state, keyed by object identity.

    Values are any payload (typically device arrays).  An entry is served
    only while the weakly-referenced anchor object is still the SAME object
    (identity check guards against id() reuse); entries drop automatically
    when the anchor is collected, and FIFO-evict past ``max_entries``.
    """

    def __init__(self, name: str, max_entries: int = 8):
        self.name = name
        self.max_entries = max_entries
        self._entries: dict = {}
        _REGISTRY.add(self)

    def get(self, anchor: Any, extra: Hashable = None):
        """The cached payload for ``anchor`` (+ optional extra key), or None."""
        hit = self._entries.get((id(anchor), extra))
        if hit is not None and hit[0]() is anchor:
            return hit[1]
        return None

    def put(self, anchor: Any, payload, extra: Hashable = None) -> None:
        """Cache ``payload`` for the lifetime of ``anchor``."""
        key = (id(anchor), extra)
        try:
            ref = weakref.ref(anchor, lambda _r, k=key: self._entries.pop(k, None))
        except TypeError:  # pragma: no cover - unweakrefable anchor
            return
        while len(self._entries) >= self.max_entries:
            self._entries.pop(next(iter(self._entries)))
        self._entries[key] = (ref, payload)

    def __len__(self) -> int:
        return len(self._entries)

    def clear(self) -> None:
        self._entries.clear()
