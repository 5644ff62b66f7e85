"""Round-5 fix pins: distinct-pair JW scoring, verify-key null handling,
match-cache crash recovery on write, PPM maxval guard, incremental-fold
precondition asserts, delta-sized silver maintenance, crash-atomic state swap.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from identity_matching_spark.functions.similarity import jaro_winkler, levenshtein_ratio
from identity_matching_spark.operators import cluster as cluster_mod
from identity_matching_spark.operators.blacklist import Blacklist
from identity_matching_spark.operators.cluster import reduce_people
from identity_matching_spark.operators.scoring import score_pairs


def _persons(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def _cands(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestDistinctPairScoring:
    """score_pairs must be edge-for-edge identical to the naive per-edge
    scorer — the distinct-pair dedupe and equal-name short-circuit are pure
    plan optimizations."""

    def test_matches_scalar_kernel_per_edge(self, spark):
        rows = [
            (1, "alice smith"),
            (2, "alice smith"),   # duplicate name -> shares a scored pair
            (3, "alcie smith"),   # typo
            (4, "bob jones"),
            (5, ""),              # empty name
            (6, None),            # null name
        ]
        persons = _persons(spark, rows)
        pairs = [
            (1, 2),  # equal non-empty -> trivial 1.0
            (1, 3),  # unequal -> UDF
            (2, 3),  # same name pair as (1,3) -> must reuse, same value
            (3, 4),
            (5, 5),  # empty==empty -> pinned 0.0 (NOT trivial)
            (1, 6),  # null side -> jw 0.0, lev null
            (6, 6),  # null==null
        ]
        out = {
            (r.src, r.dst): (r.jw, r.lev)
            for r in score_pairs(persons, _cands(spark, pairs), jw_threshold=0.0).collect()
        }
        names = dict(rows)
        for s, d in pairs:
            a, b = names[s], names[d]
            exp_jw = jaro_winkler("" if a is None else a, "" if b is None else b)
            if (s, d) == (1, 6) or (s, d) == (6, 6):
                # lev on null input is null -> cond(jw>=0.0) still keeps row
                assert out[(s, d)][0] == pytest.approx(exp_jw)
                assert out[(s, d)][1] is None
                continue
            assert out[(s, d)][0] == pytest.approx(exp_jw), (s, d)
        assert out[(1, 2)] == (1.0, 1.0)
        assert out[(5, 5)][0] == 0.0 and out[(5, 5)][1] == 1.0
        assert out[(1, 3)] == out[(2, 3)]

    def test_threshold_filter_unchanged(self, spark):
        persons = _persons(spark, [(1, "alice"), (2, "alice"), (3, "zzzz")])
        cands = _cands(spark, [(1, 2), (1, 3)])
        kept = score_pairs(persons, cands, jw_threshold=0.9).select("src", "dst").collect()
        assert [(r.src, r.dst) for r in kept] == [(1, 2)]

    def test_udf_sees_only_distinct_unequal_pairs(self, spark):
        """The physical plan's ArrowEvalPython must sit above the dedup, so
        equal-name edges never reach Python."""
        persons = _persons(spark, [(1, "alice"), (2, "alice"), (3, "alcie")])
        cands = _cands(spark, [(1, 2), (1, 3), (2, 3)])
        plan = score_pairs(persons, cands, jw_threshold=0.0)._jdf.queryExecution().optimizedPlan().toString()
        # the pandas UDF is evaluated on the deduplicated pair relation:
        # optimizer puts ArrowEvalPython after an Aggregate/Deduplicate node
        assert "ArrowEvalPython" in plan or "arrowevalpython" in plan.lower()
        assert "Deduplicate" in plan or "Aggregate" in plan


def _keyed_persons(spark, rows):
    # rows: (id, name_key, email) — name == name_key (pre-qualified)
    return spark.createDataFrame(
        [(i, n, n, e) for i, n, e in rows],
        "id long, name string, name_key string, email string",
    )


class TestVerifyKeys:
    def test_null_keys_no_spurious_collision_and_string_semantics(self, spark):
        """NULL name_key/email must neither trip the collision check (ADVICE
        r4) nor cluster via the hash-of-NULL constant: the surrogate stays
        NULL, reproducing the string key's join/group behavior exactly —
        NULL-email persons drop out of the email join like they always did."""
        rows = [
            (1, "alice", "a@x.com"),
            (2, "alicia", "a@x.com"),
            (3, "bob", None),
            (4, "carol", None),
            (5, None, "e@x.com"),
        ]
        out = reduce_people(
            _keyed_persons(spark, rows), Blacklist.testing(), max_identities=None
        )
        comps = {r["id"]: r["component"] for r in out.collect()}
        # 1,2 share an email; 5 clusters alone; NULL-email rows drop out of
        # the email equi-join (string-key behavior, preserved)
        assert comps[1] == comps[2] == 1
        assert comps.get(5) == 5
        assert 3 not in comps and 4 not in comps

    def test_planted_surrogate_collision_raises(self, spark, monkeypatch):
        rows = [(1, "alice", "a@x.com"), (2, "bob", "b@x.com")]
        real = F.xxhash64
        monkeypatch.setattr(
            cluster_mod.F, "xxhash64", lambda *cols: F.lit(7).cast("long")
        )
        try:
            with pytest.raises(ValueError, match="surrogate collision"):
                reduce_people(
                    _keyed_persons(spark, rows), Blacklist.testing(), max_identities=None
                )
        finally:
            monkeypatch.setattr(cluster_mod.F, "xxhash64", real)

    def test_verify_token_memoizes_verdict(self, spark, monkeypatch):
        rows = [(1, "alice", "a@x.com"), (2, "bob", "b@x.com")]
        persons = _keyed_persons(spark, rows)
        cluster_mod._VERIFIED_KEY_TOKENS.discard("r5-token")
        reduce_people(
            persons, Blacklist.testing(), max_identities=None, verify_token="r5-token"
        ).collect()
        assert "r5-token" in cluster_mod._VERIFIED_KEY_TOKENS
        # plant a collision: with the memoized token it must be skipped,
        # with a fresh token it must raise
        real = F.xxhash64
        monkeypatch.setattr(
            cluster_mod.F, "xxhash64", lambda *cols: F.lit(7).cast("long")
        )
        try:
            reduce_people(
                persons, Blacklist.testing(), max_identities=None, verify_token="r5-token"
            ).collect()
            with pytest.raises(ValueError, match="surrogate collision"):
                reduce_people(
                    persons, Blacklist.testing(), max_identities=None,
                    verify_token="r5-other",
                )
        finally:
            monkeypatch.setattr(cluster_mod.F, "xxhash64", real)
            cluster_mod._VERIFIED_KEY_TOKENS.discard("r5-token")
            cluster_mod._VERIFIED_KEY_TOKENS.discard("r5-other")


class TestMatchCacheWriteRecovery:
    def test_write_after_interrupted_swap_keeps_prior_entries(self, spark, tmp_path):
        """A crash that left only <path>__old must be recovered by the NEXT
        WRITE too (ADVICE r4): without recovery the merge starts empty and
        the aside cleanup destroys the sole surviving copy."""
        import os

        from identity_matching_spark.sources.io import (
            read_match_cache,
            write_match_cache,
        )

        path = str(tmp_path / "cache.csv")
        first = spark.createDataFrame(
            [("a@x.com", "ua", True), ("b@x.com", "ub", False)],
            "email string, user string, matched boolean",
        )
        write_match_cache(spark, path, first)
        # simulate the crash window: cache renamed aside, new cache missing
        os.rename(path, path + "__old")
        second = spark.createDataFrame(
            [("c@x.com", "uc", True)], "email string, user string, matched boolean"
        )
        write_match_cache(spark, path, second)
        got = {
            r["email"]: (r["user"], r["matched"])
            for r in read_match_cache(spark, path).collect()
        }
        assert got == {
            "a@x.com": ("ua", True),
            "b@x.com": ("ub", False),
            "c@x.com": ("uc", True),
        }
