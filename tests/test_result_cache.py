"""Snapshot-keyed serving result cache: hits only at identical warehouse
state, commits rotate the key, session-local state opts out, big results
negative-cache. Correctness is by construction (fingerprint = every
table's commit pointer), so these tests drive real commits through the
engine and check both the answers and the hit/miss accounting."""

from __future__ import annotations

import pytest

from iceberg_metadata_pipeline_spark.serving import SQLServingEngine
from iceberg_metadata_pipeline_spark.serving.result_cache import (
    TOO_BIG,
    catalog_fingerprint,
    is_cacheable_statement,
    is_tainting_statement,
)


@pytest.fixture
def engine(spark, tmp_path):
    return SQLServingEngine(spark, str(tmp_path / "wh"))


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_repeat_select_hits_cache(engine):
    s = engine.open_session()
    engine.execute(s, "CREATE TABLE nyc.rc (id BIGINT, v DOUBLE)").collect()
    engine.execute(s, "INSERT INTO nyc.rc VALUES (1, 1.5), (2, 2.5)").collect()
    q = "SELECT id, v FROM nyc.rc ORDER BY id"
    first = _rows(engine.execute(s, q))
    assert engine.cache.hits == 0
    second = _rows(engine.execute(s, q))
    assert engine.cache.hits == 1
    assert first == second == [(1, 1.5), (2, 2.5)]


def test_cache_shared_across_sessions(engine):
    s1, s2 = engine.open_session(), engine.open_session()
    engine.execute(s1, "CREATE TABLE nyc.rcx (id BIGINT)").collect()
    engine.execute(s1, "INSERT INTO nyc.rcx VALUES (7)").collect()
    q = "SELECT id FROM nyc.rcx"
    a = _rows(engine.execute(s1, q))
    b = _rows(engine.execute(s2, q))  # second session: same key, cache hit
    assert a == b == [(7,)]
    assert engine.cache.hits == 1


def test_commit_invalidates(engine):
    s = engine.open_session()
    engine.execute(s, "CREATE TABLE nyc.rc2 (id BIGINT)").collect()
    engine.execute(s, "INSERT INTO nyc.rc2 VALUES (1)").collect()
    q = "SELECT COUNT(*) AS n FROM nyc.rc2"
    assert _rows(engine.execute(s, q)) == [(1,)]
    _rows(engine.execute(s, q))
    assert engine.cache.hits == 1
    engine.execute(s, "INSERT INTO nyc.rc2 VALUES (2)").collect()
    # the commit moved the table's version pointer → new fingerprint →
    # the stale entry is unreachable, the fresh answer is computed
    assert _rows(engine.execute(s, q)) == [(2,)]
    assert engine.cache.hits == 1


def test_tainted_session_bypasses_cache(engine):
    s = engine.open_session()
    engine.execute(s, "CREATE TABLE nyc.rc3 (id BIGINT)").collect()
    engine.execute(s, "INSERT INTO nyc.rc3 VALUES (5)").collect()
    engine.execute(s, "CREATE TEMPORARY VIEW tv AS SELECT 42 AS x").collect()
    # session-local view → this session must never read or write the cache
    assert _rows(engine.execute(s, "SELECT x FROM tv")) == [(42,)]
    assert _rows(engine.execute(s, "SELECT x FROM tv")) == [(42,)]
    assert engine.cache.hits == 0 and engine.cache.misses == 0
    # an untainted session still caches
    s2 = engine.open_session()
    _rows(engine.execute(s2, "SELECT id FROM nyc.rc3"))
    _rows(engine.execute(s2, "SELECT id FROM nyc.rc3"))
    assert engine.cache.hits == 1


def test_volatile_statements_not_cached(engine):
    s = engine.open_session()
    q = "SELECT current_timestamp() AS ts"
    engine.execute(s, q).collect()
    engine.execute(s, q).collect()
    assert engine.cache.hits == 0 and engine.cache.misses == 0


def test_big_results_negative_cached(engine):
    engine.cache.max_rows = 5
    s = engine.open_session()
    q = "SELECT id FROM RANGE(10) ORDER BY id"
    got = sorted(_rows(engine.execute(s, q)))
    assert got == [(i,) for i in range(10)]  # full result despite cap
    fp = catalog_fingerprint(engine._warehouse)
    assert engine.cache.lookup(q, fp) is TOO_BIG
    # the repeat recomputes (no partial answer served)
    assert sorted(_rows(engine.execute(s, q))) == got


def test_fingerprint_moves_only_on_commit(engine):
    s = engine.open_session()
    engine.execute(s, "CREATE TABLE nyc.rc4 (id BIGINT)").collect()
    fp1 = catalog_fingerprint(engine._warehouse)
    assert catalog_fingerprint(engine._warehouse) == fp1  # reads don't move it
    engine.execute(s, "INSERT INTO nyc.rc4 VALUES (1)").collect()
    assert catalog_fingerprint(engine._warehouse) != fp1


def test_eligibility_classifiers():
    assert is_cacheable_statement("  SELECT 1")
    assert is_cacheable_statement("WITH t AS (SELECT 1) SELECT * FROM t")
    assert not is_cacheable_statement("INSERT INTO t VALUES (1)")
    assert not is_cacheable_statement("SELECT rand() AS r")
    assert not is_cacheable_statement("SELECT current_date() AS d")
    assert is_tainting_statement("SET spark.wap.branch = audit")
    assert is_tainting_statement("CREATE TEMPORARY VIEW v AS SELECT 1")
    assert is_tainting_statement("create or replace temp view v as select 1")
    assert is_tainting_statement("USE nyc")
    assert is_tainting_statement("DECLARE x INT")
    assert not is_tainting_statement("SELECT 1")
    assert not is_tainting_statement("INSERT INTO t VALUES (1)")


def test_reap_idle_sessions(engine):
    s1 = engine.open_session()
    s2 = engine.open_session()
    engine.execute(s1, "SELECT 1 AS one").collect()
    engine.finish_statement(s1)
    # make s1 look idle past the TTL; s2 was just opened (fresh clock)
    with engine._lock:
        engine._sessions[s1].last_used -= 3600
    reaped = engine.reap_idle_sessions(max_idle_seconds=600)
    assert reaped == [s1]
    with pytest.raises(KeyError):
        engine.execute(s1, "SELECT 1")
    # survivor still works
    assert engine.execute(s2, "SELECT 2 AS two").collect()[0][0] == 2


def test_reap_skips_mid_statement_sessions(engine):
    s = engine.open_session()
    engine.execute(s, "SELECT 1 AS one").collect()
    with engine._lock:
        sess = engine._sessions[s]
        sess.last_used -= 3600
        sess.running_group = "fake-running"  # mid-statement: must survive
    assert engine.reap_idle_sessions(600) == []
    engine.finish_statement(s)
    assert engine.reap_idle_sessions(600) == [s]


def test_global_temp_view_never_cached_and_mutation_flushes(engine):
    from iceberg_metadata_pipeline_spark.serving.result_cache import (
        is_cacheable_statement,
        is_global_mutation,
    )

    # reads of cross-session global temp state are cache-ineligible
    assert not is_cacheable_statement("SELECT * FROM global_temp.g")
    # shared-state mutations flush the whole cache
    assert is_global_mutation("CREATE GLOBAL TEMPORARY VIEW g AS SELECT 1")
    assert is_global_mutation("CREATE OR REPLACE FUNCTION f AS 'x'")
    assert is_global_mutation("DROP FUNCTION f")
    assert not is_global_mutation("CREATE TEMPORARY VIEW v AS SELECT 1")
    assert not is_global_mutation("SELECT 1")

    s = engine.open_session()
    engine.execute(s, "CREATE TABLE nyc.rcg (id BIGINT)").collect()
    engine.execute(s, "INSERT INTO nyc.rcg VALUES (1)").collect()
    q = "SELECT id FROM nyc.rcg"
    engine.execute(s, q).collect()
    assert len(engine.cache._lru) == 1
    # a global mutation from ANY session wipes every entry
    s2 = engine.open_session()
    engine.execute(s2, "CREATE GLOBAL TEMPORARY VIEW gflush AS SELECT 9 AS x").collect()
    assert len(engine.cache._lru) == 0
    # and cross-session reads of the global view bypass the cache but work
    assert engine.execute(s, "SELECT x FROM global_temp.gflush").collect()[0][0] == 9
    assert all(
        "global_temp" not in stmt for stmt, _ in engine.cache._lru
    )


def test_cache_hit_refreshes_idle_clock(engine):
    s = engine.open_session()
    q = "SELECT 11 AS v"
    engine.execute(s, q).collect()
    engine.finish_statement(s)
    with engine._lock:
        engine._sessions[s].last_used -= 3600
    # a cache HIT is session activity: it must reset the idle clock
    engine.execute(s, q).collect()
    assert engine.cache.hits == 1
    assert engine.reap_idle_sessions(600) == []
