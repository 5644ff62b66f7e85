"""Delta-scoped incremental clustering (VERDICT r3 #2).

The contract under test: ``incremental_fold`` resolves a batch of new
person rows against an existing resolution at cost proportional to the
TOUCHED clusters — and its output is bit-identical to a from-scratch
``reduce_people`` over the full corpus, including under the
max-identities cap (the closure argument in streaming/incremental.py).
"""

import pytest
from pyspark.sql import functions as F

from identity_matching_spark.operators.blacklist import Blacklist
from identity_matching_spark.operators.cluster import reduce_people
from identity_matching_spark.streaming.incremental import (
    derive_cluster_keys,
    incremental_fold,
    person_blocking_keys,
    touched_cluster_closure,
)

BL = Blacklist.testing()


def _persons(spark, rows):
    """rows: (id, name, email); name_key = name (no popular qualification)."""
    return spark.createDataFrame(
        [(i, n, n, e) for i, n, e in rows],
        "id long, name string, name_key string, email string",
    )


def _membership(df):
    return {(r["id"], r["component"]) for r in df.collect()}


def _fold_batches(spark, batches, max_identities=20):
    """Run batch 0 from scratch, fold the rest threading the maintained
    cluster-key state; return (silver, membership, cluster_keys)."""
    silver = _persons(spark, batches[0]).localCheckpoint()
    membership = reduce_people(silver, BL, max_identities=max_identities).localCheckpoint()
    keys = derive_cluster_keys(silver, membership, BL).localCheckpoint()
    for batch in batches[1:]:
        delta = _persons(spark, batch)
        membership, keys, _ = incremental_fold(
            silver, membership, delta, BL, max_identities=max_identities,
            cluster_keys=keys,
        )
        membership = membership.localCheckpoint()
        keys = keys.localCheckpoint()
        silver = silver.unionByName(delta).dropDuplicates(["id"]).localCheckpoint()
    return silver, membership, keys


def test_incremental_equals_from_scratch_mixed_links(spark):
    """Three batches with email links, name links, and cross-batch links —
    the folded result must equal one from-scratch resolution."""
    b0 = [
        (1, "a one", "e1@x.com"),
        (2, "a two", "e1@x.com"),       # email link with 1
        (3, "a two", "e3@x.com"),       # name link with 2
        (4, "b one", "e4@x.com"),       # singleton
        (5, "c one", "e5@x.com"),
    ]
    b1 = [
        (6, "z one", "e5@x.com"),       # email-links to old cluster of 5
        (7, "q one", "e7@x.com"),       # new singleton
        (8, "a one", "e8@x.com"),       # name-links to old cluster {1,2,3}
    ]
    b2 = [
        (9, "q one", "e4@x.com"),       # BRIDGES old singleton 4 and cluster {7}
        (10, "new", "e10@x.com"),       # new singleton
    ]
    silver, got, keys = _fold_batches(spark, [b0, b1, b2])
    want = reduce_people(_persons(spark, b0 + b1 + b2), BL, max_identities=20)
    assert _membership(got) == _membership(want)
    # membership rows are unique per person — no pass-through duplicates
    assert got.count() == got.select("id").distinct().count()
    # the incrementally-maintained key state equals a from-scratch derivation
    fresh = derive_cluster_keys(silver, got, BL)
    assert {(r["component"], r["key"]) for r in keys.collect()} == {
        (r["component"], r["key"]) for r in fresh.collect()
    }


def test_incremental_equals_from_scratch_under_cap(spark):
    """Cap-split blocks are the hard case: clusters that SHARE a blocking
    key but were separated by the max-identities cap must all re-enter the
    recompute scope (closure hop > 1), or the greedy re-packs differently
    than from-scratch."""
    # 6 email-pair components all sharing one name block "shared nm";
    # cap=4 packs them greedily into two clusters of 3 components each.
    rows = []
    pid = 1
    for c in range(6):
        rows.append((pid, f"nm {c}a", f"pair{c}@x.com")); pid += 1
        rows.append((pid, "shared nm", f"pair{c}@x.com")); pid += 1
    # delta: one new person in the shared name block re-packs the greedy
    delta = [(100, "shared nm", "new@x.com")]
    silver, got, _ = _fold_batches(spark, [rows, delta], max_identities=4)
    want = reduce_people(_persons(spark, rows + delta), BL, max_identities=4)
    assert _membership(got) == _membership(want)


def test_fold_cost_scales_with_delta(spark):
    """200 independent 3-row clusters; a 5-row delta touching 5 of them.
    The recompute scope must be those 5 clusters + the delta — never the
    corpus."""
    rows = []
    pid = 0
    for g in range(200):
        for j in range(3):
            rows.append((pid, f"name {g} {j}", f"g{g}@x.com"))
            pid += 1
    silver = _persons(spark, rows).localCheckpoint()
    membership = reduce_people(silver, BL, max_identities=20).localCheckpoint()
    delta = _persons(
        spark, [(1000 + g, f"fresh {g}", f"g{g}@x.com") for g in range(5)]
    )
    out, _, metrics = incremental_fold(
        silver, membership, delta, BL, max_identities=20,
        cluster_keys=derive_cluster_keys(silver, membership, BL),
    )
    assert metrics["touched_clusters"] == 5
    assert metrics["scope_rows"] == 5 * 3 + 5      # touched members + delta
    assert metrics["delta_rows"] == 5
    assert metrics["hops"] == 1                    # no cap-chaining here
    # equality still holds
    want = reduce_people(
        silver.unionByName(delta), BL, max_identities=20
    )
    assert _membership(out) == _membership(want)


def test_untouched_cluster_rows_pass_through_verbatim(spark):
    """Rows of untouched clusters must be the SAME rows (id, component,
    external_id), not recomputed lookalikes — id stability across batches."""
    rows = [(i, f"n {i}", f"e{i % 10}@x.com") for i in range(30)]
    silver = _persons(spark, rows).localCheckpoint()
    membership = reduce_people(silver, BL, max_identities=20).localCheckpoint()
    before = _membership(membership)
    delta = _persons(spark, [(999, "n 0", "e0@x.com")])  # touches e0's cluster only
    out, _, metrics = incremental_fold(silver, membership, delta, BL, max_identities=20)
    after = _membership(out)
    touched_before = {(i, c) for (i, c) in before if i % 10 == 0}
    untouched_before = before - touched_before
    assert untouched_before <= after
    assert metrics["touched_clusters"] == 1


def test_closure_converges_and_reports_hops(spark):
    """Direct closure unit: key shared by two clusters pulls both in one
    hop; their remaining keys pull nothing new → fixpoint at hop 2."""
    silver = _persons(
        spark,
        [(1, "na", "e1@x.com"), (2, "nb", "e1@x.com"), (3, "nb", "e3@x.com")],
    )
    membership = reduce_people(silver, BL, max_identities=20)
    cluster_keys = (
        person_blocking_keys(silver, BL)
        .join(membership.select("id", "component"), "id")
        .select("component", "key")
        .distinct()
    )
    seeds = person_blocking_keys(_persons(spark, [(9, "zz", "e3@x.com")]), BL)
    touched, hops = touched_cluster_closure(cluster_keys, seeds)
    assert touched.count() == 1  # {1,2,3} is one cluster
    assert hops >= 1


def test_streaming_driver_folds_incrementally(spark, tmp_path):
    """End-to-end through run_incremental_resolution: file-source stream,
    two slices, final membership equals a from-scratch resolution of the
    merged bronze signatures."""
    from identity_matching_spark.operators.people import build_persons, dedup_signatures
    from identity_matching_spark.operators.signatures import extract_signatures
    from identity_matching_spark.sources.synth import synth_transcripts
    from identity_matching_spark.streaming.incremental import run_incremental_resolution

    t = synth_transcripts(spark, n_convs=400, n_persons=40, seed=31)
    # far-future sentinel so the event-time watermark passes every real
    # session and append-mode emits them (same trick as test_streaming)
    sentinel = t.limit(1).select(
        F.lit("zzz-sentinel").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("name: Sentinel\nemail: s@s.org").alias("text"),
        F.lit("").alias("tool"),
        F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    t = t.unionByName(sentinel)
    src = str(tmp_path / "turns")
    t.write.parquet(src)
    stream = spark.readStream.schema(t.schema).parquet(src)
    store = str(tmp_path / "store")
    q = run_incremental_resolution(spark, stream, store, trigger_seconds=1)
    # availableNow isn't used by the driver (processingTime trigger);
    # wait for the single file-source batch to drain, then stop
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["numInputRows"] == 0 and p["batchId"] > 0:
            break
        time.sleep(2)
    q.stop()
    from identity_matching_spark.streaming.incremental import IncrementalState

    got = IncrementalState(spark, store).read("membership")
    bronze = spark.read.parquet(f"{store}/signatures_bronze")
    assert bronze.count() > 100, "sessions must actually have flushed"
    persons = build_persons(
        dedup_signatures(
            bronze.where((F.col("name") != "") & (F.col("email") != "")).select(
                "repo", "name", "email", "hash", "ts"
            )
        ),
        Blacklist.default(),
    )
    want = reduce_people(persons, Blacklist.default(), max_identities=20)
    assert _membership(got) == _membership(want)


def test_popular_key_rearrival_no_duplicate_rows(spark):
    """A re-arriving person whose keys are ALL popular seeds no closure, so
    its old membership row is untouched while the scope run also resolves
    it — the fold must emit it exactly once (and identically)."""
    rows = [
        (1, "popular", "popular@email.com"),  # both keys popular → singleton
        (2, "n two", "e2@x.com"),
        (3, "n two", "e3@x.com"),
    ]
    silver = _persons(spark, rows).localCheckpoint()
    membership = reduce_people(silver, BL, max_identities=20).localCheckpoint()
    delta = _persons(spark, [(1, "popular", "popular@email.com")])  # same id
    out, keys, metrics = incremental_fold(
        silver, membership, delta, BL, max_identities=20,
        cluster_keys=derive_cluster_keys(silver, membership, BL),
    )
    assert metrics["touched_clusters"] == 0
    assert out.count() == out.select("id").distinct().count() == 3
    want = reduce_people(silver, BL, max_identities=20)
    assert _membership(out) == _membership(want)
