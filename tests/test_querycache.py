"""LRU query cache: admission-policy semantics
(UsageTrackingQueryCachingPolicy.java:28), hit/miss/eviction counters
(LRUQueryCache.java:79), cached-result identity, and delete-epoch
validity (live docs filter after the cache)."""

import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.querycache import (
    LRUQueryCache,
    UsageTrackingQueryCachingPolicy,
)


def test_policy_never_caches_cheap_shapes():
    p = UsageTrackingQueryCachingPolicy()
    t = Q.TermQuery("text", "table")
    for _ in range(10):
        p.on_use(t)
    assert not p.should_cache(t)
    assert not p.should_cache(Q.MatchAllDocsQuery())


def test_policy_thresholds():
    p = UsageTrackingQueryCachingPolicy()
    costly = Q.PrefixQuery("text", "tab")
    default = Q.BooleanQuery.of(should=[Q.TermQuery("text", "a")])
    p.on_use(costly)
    assert not p.should_cache(costly)
    p.on_use(costly)
    assert p.should_cache(costly)  # costly: 2 uses
    for i in range(4):
        p.on_use(default)
        assert not p.should_cache(default), i
    p.on_use(default)
    assert p.should_cache(default)  # default: 5 uses


def test_policy_history_is_bounded():
    p = UsageTrackingQueryCachingPolicy(history_size=4)
    q = Q.PrefixQuery("text", "x")
    p.on_use(q)
    for i in range(4):  # push the first use out of the ring
        p.on_use(Q.PrefixQuery("text", f"filler{i}"))
    p.on_use(q)
    assert not p.should_cache(q)  # only 1 recent use survives


class _FakeDF:
    def __init__(self):
        self.persisted = False
        self.unpersisted = False

    def persist(self):
        self.persisted = True
        return self

    def unpersist(self):
        self.unpersisted = True
        return self


def test_lru_eviction_unpersists():
    cache = LRUQueryCache(max_queries=1)
    q1, q2 = Q.PrefixQuery("text", "a"), Q.PrefixQuery("text", "b")
    frames = {repr(q1): _FakeDF(), repr(q2): _FakeDF()}
    for q in (q1, q1, q2, q2):  # 2 uses each -> both admitted
        cache.get_or_compute(q, lambda q=q: frames[repr(q)])
    assert cache.cache_count == 2
    assert cache.eviction_count == 1
    assert frames[repr(q1)].unpersisted  # LRU evicted
    assert not frames[repr(q2)].unpersisted
    got = cache.get_or_compute(q2, lambda: pytest.fail("should be a hit"))
    assert got is frames[repr(q2)]
    assert cache.hit_count == 1


@pytest.fixture(scope="module")
def cached_searcher(spark):
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search.searcher import IndexSearcher

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = IndexConfig(
        text_col="text", field_name="text", doc_id_col="doc_id", docs_per_segment=256
    )
    idx = build_index(spark, docs, cfg)
    return IndexSearcher(idx, query_cache=LRUQueryCache(max_queries=4))


def test_cached_matches_identical_and_hits(cached_searcher):
    s = cached_searcher
    q = Q.PrefixQuery("text", "tab")
    uncached = sorted(r.doc_id for r in s._live(
        s._matches(q, s._resolve_stats(q))).collect())
    first = sorted(r.doc_id for r in s.matches(q).collect())
    second = sorted(r.doc_id for r in s.matches(q).collect())  # admitted now
    third = sorted(r.doc_id for r in s.matches(q).collect())  # cache hit
    assert first == second == third == uncached
    assert s.query_cache.hit_count >= 1
    assert s.query_cache.cache_count == 1


def test_cached_entry_respects_later_deletes(spark):
    from lucene_spark.index.build import IndexConfig, build_index
    from lucene_spark.search.searcher import IndexSearcher

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = IndexConfig(
        text_col="text", field_name="text", doc_id_col="doc_id", docs_per_segment=256
    )
    idx = build_index(spark, docs, cfg)
    s = IndexSearcher(idx, query_cache=LRUQueryCache())
    q = Q.PrefixQuery("text", "tab")
    before = {r.doc_id for r in s.matches(q).collect()}
    _ = s.matches(q).collect()  # admit + cache
    assert s.query_cache.cache_count == 1
    victim = sorted(before)[0]
    idx.deletes = spark.createDataFrame([(victim,)], "doc_id long")
    after = {r.doc_id for r in s.matches(q).collect()}  # cache HIT + new epoch
    assert s.query_cache.hit_count >= 1
    assert victim in before and victim not in after
    assert after == before - {victim}
