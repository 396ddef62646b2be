"""LRU query cache with a usage-tracking admission policy.

Re-expression of ``search/LRUQueryCache.java:79`` +
``search/UsageTrackingQueryCachingPolicy.java:28``: filter-context match
sets (doc-id frames, no scores) of frequently-reused queries are kept
persisted, so a standing filter costs its plan once instead of once per
request. The Spark translation: "cached bitset per segment core" becomes
a persisted (doc_id) DataFrame per canonical query; live-docs filtering
is applied by the searcher AFTER the cache (the reference also applies
deletes at read time — the cached DocIdSet is over the segment core), so
cached entries stay valid across delete epochs.

Admission mirrors the reference's policy:

- never cache the trivially-cheap shapes (TermQuery, MatchAll/MatchNo —
  ``UsageTrackingQueryCachingPolicy.java:42-60`` shouldNeverCache);
- "costly" queries (multi-term expansion: prefix / wildcard / fuzzy /
  regexp / ranges / term-in-set / point) admit after 2 recent uses,
  everything else after 5 (``:62-75``), counted over a bounded history
  of the most recent distinct queries (``FrequencyTrackingRingBuffer``).

Eviction is LRU on query count; evicted frames are unpersisted through
the searcher's deferred-unpersist queue when available (never mid-job).
"""

from __future__ import annotations

from collections import OrderedDict, deque

from lucene_spark.search import query as Q

__all__ = ["UsageTrackingQueryCachingPolicy", "LRUQueryCache"]

_COSTLY = (
    Q.PrefixQuery,
    Q.WildcardQuery,
    Q.RegexpQuery,
    Q.FuzzyQuery,
    Q.TermRangeQuery,
    Q.TermInSetQuery,
    Q.PointRangeQuery,
)
_NEVER = (Q.TermQuery, Q.MatchAllDocsQuery, Q.MatchNoDocsQuery)


class UsageTrackingQueryCachingPolicy:
    """Count recent uses in a bounded ring; admit when the count reaches
    the shape's threshold (2 costly / 5 default)."""

    def __init__(self, history_size: int = 256):
        self.history_size = history_size
        self._ring: deque = deque()
        self._counts: dict = {}

    def on_use(self, query) -> None:
        if isinstance(query, _NEVER):
            return
        key = repr(query)  # frozen dataclasses: deterministic identity
        self._ring.append(key)
        self._counts[key] = self._counts.get(key, 0) + 1
        if len(self._ring) > self.history_size:
            old = self._ring.popleft()
            n = self._counts.get(old, 0) - 1
            if n <= 0:
                self._counts.pop(old, None)
            else:
                self._counts[old] = n

    def min_frequency_to_cache(self, query) -> int:
        return 2 if isinstance(query, _COSTLY) else 5

    def should_cache(self, query) -> bool:
        if isinstance(query, _NEVER):
            return False
        return self._counts.get(repr(query), 0) >= self.min_frequency_to_cache(query)


class LRUQueryCache:
    """Persisted match-set frames keyed by the (frozen, hashable) query
    AST, LRU-evicted at ``max_queries``. Counters mirror the reference's
    ``getHitCount``/``getMissCount``/``getCacheCount``/
    ``getEvictionCount`` accessors."""

    def __init__(self, max_queries: int = 32, policy=None):
        self.max_queries = max_queries
        self.policy = policy or UsageTrackingQueryCachingPolicy()
        self._entries: OrderedDict = OrderedDict()
        self.hit_count = 0
        self.miss_count = 0
        self.cache_count = 0
        self.eviction_count = 0

    def get_or_compute(self, query, compute, *, defer_unpersist=None):
        """Return the match-set frame for `query`: the persisted cached
        frame on a hit; otherwise compute(), admitting per policy."""
        key = repr(query)
        cached = self._entries.get(key)
        if cached is not None:
            self.hit_count += 1
            self._entries.move_to_end(key)
            return cached
        self.miss_count += 1
        self.policy.on_use(query)
        df = compute()
        if self.policy.should_cache(query):
            df = df.persist()
            self._entries[key] = df
            self.cache_count += 1
            while len(self._entries) > self.max_queries:
                _, evicted = self._entries.popitem(last=False)
                self.eviction_count += 1
                if defer_unpersist is not None:
                    defer_unpersist(evicted)
                else:
                    evicted.unpersist()
        return df

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()
