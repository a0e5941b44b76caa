"""API-result TTL cache — the reference's CacheManager semantics
(cache_manager.hpp:19-73) at the engine's API layer.

The reference caches JSON API payloads in Redis with per-category TTLs
(user 600s, job 60s, session 1800s, health 30s — cache_manager.hpp:68-73)
and tag-based invalidation. The engine-side equivalents are
``df.cache()``/bucketed layout (SURVEY §4); THIS cache is the thin
API-layer result cache: key → serialized payload with TTL + tag
invalidation. In-process here; the store interface is a dict so a Redis
client drops in for multi-driver deployments.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

#: cache_manager.hpp:68-73
DEFAULT_TTLS = {
    "user": 600.0,
    "job": 60.0,
    "session": 1800.0,
    "health": 30.0,
}


@dataclass
class _Entry:
    value: object
    expires_at: float
    tags: frozenset[str]


@dataclass
class TTLCache:
    """Key→value cache with per-category TTLs and tag invalidation."""

    ttls: dict[str, float] = field(default_factory=lambda: dict(DEFAULT_TTLS))
    clock: Callable[[], float] = time.monotonic
    _store: dict[str, _Entry] = field(default_factory=dict)
    hits: int = 0
    misses: int = 0

    def get(self, key: str):
        e = self._store.get(key)
        if e is None or self.clock() >= e.expires_at:
            if e is not None:
                del self._store[key]
            self.misses += 1
            return None
        self.hits += 1
        return e.value

    def put(
        self,
        key: str,
        value,
        *,
        category: str = "job",
        tags: tuple[str, ...] = (),
    ) -> None:
        ttl = self.ttls.get(category, 60.0)
        self._store[key] = _Entry(
            value=value,
            expires_at=self.clock() + ttl,
            tags=frozenset(tags),
        )

    def invalidate_tag(self, tag: str) -> int:
        """Drop every entry carrying ``tag`` (cache_manager tag
        invalidation ≙ REFRESH TABLE for engine-side caches)."""
        doomed = [k for k, e in self._store.items() if tag in e.tags]
        for k in doomed:
            del self._store[k]
        return len(doomed)

    def get_or_compute(
        self,
        key: str,
        compute: Callable[[], object],
        *,
        category: str = "job",
        tags: tuple[str, ...] = (),
    ):
        val = self.get(key)
        if val is None:
            val = compute()
            self.put(key, val, category=category, tags=tags)
        return val
