"""Keyed result cache with TTL (SURVEY §2.1 S8).

The reference caches community-discovery results for an hour
(``@st.cache_data(ttl=3600)``, v1:20). Engine version: a driver-side
keyed registry of persisted DataFrames. Persisting uses
MEMORY_AND_DISK on the executors — the data never moves to the driver;
expiry unpersists (frees executor memory) lazily on access.
"""

from __future__ import annotations

import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame


class TTLCache:
    def __init__(self, ttl_seconds: float = 3600.0, clock=time.monotonic):
        self.ttl = ttl_seconds
        self._clock = clock
        self._entries: dict[str, tuple[float, DataFrame]] = {}

    def get_or_compute(self, key: str, compute) -> DataFrame:
        now = self._clock()
        hit = self._entries.get(key)
        if hit is not None:
            stamp, df = hit
            if now - stamp <= self.ttl:
                return df
            df.unpersist()
            del self._entries[key]
        df = compute()
        df.persist(StorageLevel.MEMORY_AND_DISK)
        self._entries[key] = (now, df)
        return df

    def invalidate(self, key: str | None = None) -> None:
        keys = [key] if key is not None else list(self._entries)
        for k in keys:
            if k in self._entries:
                self._entries[k][1].unpersist()
                del self._entries[k]
