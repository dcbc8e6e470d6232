"""Prepared-plan cache semantics (__spark_entry__._prepared): pure lazy
entries reuse their analyzed DataFrame per (entry, corpus fingerprint);
eager/effectful entries rebuild every call; a session swap invalidates."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_pure_lazy_entry_reuses_plan(spark):
    qs = entrymod.queries()
    a = qs["db_stats"](spark, SF_DIR)
    b = qs["db_stats"](spark, SF_DIR)
    assert a is b  # plan cache hit — compilation amortized
    # execution still produces full results on every call
    assert a.count() == b.count() > 0


def test_eager_entry_not_cached(spark):
    qs = entrymod.queries()
    # BFS entries materialize during build (localCheckpoint) — caching
    # them would skip real compute, so they must rebuild per call
    a = qs["graph_expand"](spark, SF_DIR)
    b = qs["graph_expand"](spark, SF_DIR)
    assert a is not b


def test_stale_session_invalidates(spark):
    key_fn = entrymod._source_fingerprint
    name = "db_stats"
    qs = entrymod.queries()
    df = qs[name](spark, SF_DIR)
    key = (name, key_fn(SF_DIR))
    assert entrymod._PREPARED[key][1] is df
    # simulate a replaced session: poison the cached owner
    entrymod._PREPARED[key] = (object(), df)
    rebuilt = qs[name](spark, SF_DIR)
    assert rebuilt is not df
    assert entrymod._PREPARED[key][0] is spark


def test_index_cache_stale_session_invalidates(spark):
    """r15 ADVICE: the artifact memos (_INDEX_CACHE et al.) carry the
    same (session, value) identity guard as _PREPARED — a hit owned by
    a stopped/replaced session must rebuild, never serve the dead
    frame."""
    pair = entrymod._bm25_index(spark, SF_DIR)
    fp = entrymod._bm25_index_key(SF_DIR)
    assert entrymod._INDEX_CACHE[fp] == (spark, pair)
    sentinel = ("dead", "frames")
    entrymod._INDEX_CACHE[fp] = (object(), sentinel)
    rebuilt = entrymod._bm25_index(spark, SF_DIR)
    assert rebuilt is not sentinel
    assert entrymod._INDEX_CACHE[fp][0] is spark


def test_curation_cache_stale_session_invalidates(spark):
    art = entrymod._curation_artifact(spark, SF_DIR)
    assert art.count() > 0
    (fp,) = [
        k for k, v in entrymod._CURATION_CACHE.items() if v[1] is art
    ]
    # the key must carry the logic-version hash (regex-bank edits
    # invalidate, not just the numeric constants)
    assert fp.endswith(f"-v{entrymod._curation_logic_version()}")
    entrymod._CURATION_CACHE[fp] = (object(), art)
    rebuilt = entrymod._curation_artifact(spark, SF_DIR)
    assert rebuilt is not art
    assert entrymod._CURATION_CACHE[fp][0] is spark
