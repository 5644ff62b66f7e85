"""Incremental (streaming) signature ingestion.

The reference is strictly batch (SURVEY §2.7: no watermarks, no event-time
windows anywhere), so the core engine needs no Structured Streaming. This
module covers the practical gap for a continuously-appended transcript
table: ingest turn streams, maintain per-conversation signature state, and
periodically fold finished conversations into the batch pipeline.

Design (Spark-first):

* ``stream_signatures`` — readStream → the same stateless projections the
  batch extractor uses (token regexes per turn) → watermarked groupBy on
  (conv_id, session window) so late turns within the allowed lateness still
  update the signature; output mode "update" into a sink the batch pipeline
  treats as the signatures source.
* clustering itself stays batch-incremental (foreachBatch → checkpointed
  pipeline stages): transitive closure is a global fixpoint — streaming it
  row-by-row would re-derive CC per update; re-running the checkpointed CC
  on the delta-merged signature table is the scalable contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from identity_matching_spark.operators.signatures import EMAIL_TOKEN, NAME_LINE, channel_of


def stream_signatures(
    turn_stream: DataFrame,
    watermark: str = "10 minutes",
    session_gap: str = "30 minutes",
) -> DataFrame:
    """Streaming per-conversation signature aggregation.

    ``turn_stream`` must be a streaming DataFrame with the transcript
    schema. Returns a streaming DataFrame keyed by conversation session:
    one signature row per (conv_id, session window), updated as turns
    arrive; late turns beyond the watermark are dropped (documented
    divergence from batch, which has no lateness bound).
    """
    turns = turn_stream.withWatermark("ts", watermark).select(
        "conv_id",
        "turn_idx",
        "ts",
        F.regexp_extract("text", NAME_LINE, 1).alias("name_tok"),
        F.regexp_extract("text", EMAIL_TOKEN, 0).alias("email_tok"),
        F.coalesce("tool", F.lit("")).alias("tool"),
    )
    return (
        turns.groupBy("conv_id", F.session_window("ts", session_gap))
        .agg(
            F.min_by("name_tok", F.when(F.col("name_tok") != "", F.col("turn_idx"))).alias(
                "name"
            ),
            F.min_by("email_tok", F.when(F.col("email_tok") != "", F.col("turn_idx"))).alias(
                "email"
            ),
            F.max("ts").alias("ts"),
            F.array_sort(F.collect_set(F.when(F.col("tool") != "", F.col("tool")))).alias(
                "tools"
            ),
        )
        .select(
            channel_of(F.col("conv_id")).alias("repo"),
            F.coalesce("name", F.lit("")).alias("name"),
            F.coalesce("email", F.lit("")).alias("email"),
            F.col("conv_id").alias("hash"),
            "ts",
            "tools",
            "conv_id",
        )
    )


def stateful_signatures(turn_stream: DataFrame) -> DataFrame:
    """Custom stateful signature accumulation via ``applyInPandasWithState``.

    Unlike the session-window aggregation above (which re-emits on window
    close), this keeps explicit per-conversation state — earliest name/email
    token by turn_idx, max ts, turn count — and emits the updated signature
    every micro-batch. The state schema is tiny (five scalars per live
    conversation), so state-store pressure stays bounded by the number of
    *active* conversations, not total corpus size.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    turns = turn_stream.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.regexp_extract("text", NAME_LINE, 1).alias("name_tok"),
        F.regexp_extract("text", EMAIL_TOKEN, 0).alias("email_tok"),
    )

    out_schema = "conv_id string, name string, email string, ts timestamp, n_turns long"
    state_schema = (
        "name string, name_idx long, email string, email_idx long, ts timestamp, n long"
    )

    def update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.exists:
            name, name_idx, email, email_idx, ts, n = state.get
        else:
            name, name_idx, email, email_idx, ts, n = "", 1 << 62, "", 1 << 62, None, 0
        for pdf in pdfs:
            for row in pdf.itertuples():
                n += 1
                if row.name_tok and row.turn_idx < name_idx:
                    name, name_idx = row.name_tok, row.turn_idx
                if row.email_tok and row.turn_idx < email_idx:
                    email, email_idx = row.email_tok, row.turn_idx
                ts = row.ts if ts is None or row.ts > ts else ts
        state.update((name, name_idx, email, email_idx, ts, n))
        yield pd.DataFrame(
            {"conv_id": [conv_id], "name": [name], "email": [email], "ts": [ts], "n_turns": [n]}
        )

    return turns.groupBy("conv_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


# --- delta-scoped incremental clustering ---------------------------------
#
# A continuously-appended corpus must not pay a full-corpus resolution per
# micro-batch (the r3 design did exactly that). The exact-delta contract:
#
# 1. the batch's new person rows contribute blocking keys (non-popular
#    email + name_key, same 64-bit surrogates ``reduce_people`` encodes);
# 2. the set of CURRENT final clusters that must be re-resolved is the
#    closure of those keys over the bipartite cluster↔key graph: a key
#    touches every cluster holding it, a touched cluster contributes all
#    its keys, iterate to fixpoint (iterated equi-joins, like CC rounds);
# 3. re-run ``reduce_people`` on the touched clusters' members plus the
#    delta; union every untouched membership row through unchanged.
#
# Why this is EXACT, not approximate: at fixpoint, no non-popular blocking
# key is shared between a scoped and an unscoped person (a shared key would
# have pulled the unscoped person's cluster into the closure). Email-phase
# edges, name blocks, per-component weights, and the capped greedy all
# operate strictly within a block, so the edge set — and therefore CC and
# every greedy packing decision — decomposes over the scope boundary.
# Popular keys produce no edges by construction, and popularity here is the
# static blacklist (per-key, data-independent), so flags cannot drift as
# the corpus grows. Cluster ids are min(member person id) over global hash
# ids: untouched clusters keep their ids verbatim, re-scoped ones get
# exactly the id a from-scratch run would assign.
# (Co-occurrence popularity — a global statistic — would break the
# decomposition; the incremental path pins static-blacklist popularity.)


def person_blocking_keys(persons: DataFrame, blacklist) -> DataFrame:
    """DataFrame[id, key] — one row per usable (non-popular) blocking key,
    encoded with the same domain-separated xxhash64 surrogates the batch
    clusterer uses (operators/cluster.py)."""
    names = persons.where(~blacklist.is_popular_name(F.col("name_key"))).select(
        "id", F.xxhash64(F.lit(1), "name_key").alias("key")
    )
    emails = persons.where(~blacklist.is_popular_email(F.col("email"))).select(
        "id", F.xxhash64(F.lit(2), "email").alias("key")
    )
    return names.union(emails)


def touched_cluster_closure(
    cluster_keys: DataFrame, seed_keys: DataFrame, max_hops: int = 25
) -> tuple[DataFrame, int]:
    """Fixpoint of clusters reachable from ``seed_keys`` over the bipartite
    (component, key) relation. Returns (DataFrame[component], hops).

    Each hop is two equi-joins + distincts — O(touched) work, never
    O(corpus). Raises if the closure hasn't converged after ``max_hops``
    (pathologically chained corpora): callers should fall back to a full
    re-resolution in that case.
    """
    touched = cluster_keys.select("component").limit(0)
    frontier = seed_keys.select("key").distinct()
    for hops in range(max_hops):
        new_comps = (
            cluster_keys.join(frontier, "key")
            .select("component")
            .distinct()
            .join(touched, "component", "left_anti")
            .localCheckpoint(eager=False)
        )
        if new_comps.isEmpty():
            return touched, hops
        touched = touched.union(new_comps).localCheckpoint(eager=False)
        frontier = cluster_keys.join(new_comps, "component").select("key").distinct()
    raise RuntimeError(
        f"cluster closure did not converge in {max_hops} hops — "
        "fall back to a full re-resolution for this batch"
    )


def derive_cluster_keys(
    silver_persons: DataFrame, membership: DataFrame, blacklist
) -> DataFrame:
    """Bootstrap the (component, key) state relation from scratch — one
    full-corpus shuffle. Run once at stream start (or recovery);
    ``incremental_fold`` maintains it incrementally afterwards."""
    return (
        person_blocking_keys(silver_persons, blacklist)
        .join(membership.select("id", "component"), "id")
        .select("component", "key")
        .distinct()
    )


def incremental_fold(
    silver_persons: DataFrame,
    membership: DataFrame,
    delta_persons: DataFrame,
    blacklist,
    max_identities: int | None = 20,
    cluster_keys: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, dict]:
    """Fold a batch of new person rows into an existing exact-mode
    resolution. Returns (new_membership, new_cluster_keys, metrics).

    ``membership`` must be the current resolution of ``silver_persons``
    (id, component, external_id); ``cluster_keys`` the matching
    (component, key) state (bootstrapped via :func:`derive_cluster_keys`
    and threaded through folds — deriving it per batch would re-shuffle the
    whole corpus, exactly the cost this operator exists to avoid; passing
    None does that derivation, for one-off/batch callers). The result
    equals ``reduce_people(silver ∪ delta)`` exactly (see the module note
    for the decomposition argument; pinned by
    tests/test_incremental_delta.py). Per-batch SHUFFLE cost is
    proportional to the touched clusters; the pass-through union of
    untouched membership/keys rows is narrow (no shuffle) — on a real
    deployment, partitioning the state by a bucket of ``component`` turns
    even that rewrite into touched-partition overwrites.
    """
    from identity_matching_spark.operators.cluster import reduce_people

    delta_persons = delta_persons.localCheckpoint(eager=False)
    seed_keys = person_blocking_keys(delta_persons, blacklist)
    if cluster_keys is None:
        cluster_keys = derive_cluster_keys(silver_persons, membership, blacklist)
    cluster_keys = cluster_keys.localCheckpoint(eager=False)
    touched, hops = touched_cluster_closure(cluster_keys, seed_keys)
    scope_ids = membership.join(touched, "component").select("id")
    scoped = (
        silver_persons.join(scope_ids, "id")
        .unionByName(delta_persons)
        .dropDuplicates(["id"])
        .localCheckpoint(eager=False)
    )
    rescoped = reduce_people(
        scoped, blacklist, max_identities=max_identities, verify_keys=False
    ).localCheckpoint(eager=False)
    # untouched rows pass through verbatim — minus any id the scoped
    # re-resolution re-emitted. (A re-arriving person whose keys are all
    # popular seeds no closure — its old row stays untouched while the
    # scope run also resolves it; without this anti-join it would appear
    # twice. The rescoped side is delta-sized, so this broadcasts.)
    untouched = membership.join(touched, "component", "left_anti").join(
        rescoped.select("id"), "id", "left_anti"
    )
    out = untouched.unionByName(rescoped)
    # maintain the key state the same way: touched clusters' keys are
    # replaced by the re-scoped ones, everything else passes through
    new_cluster_keys = (
        cluster_keys.join(touched, "component", "left_anti")
        .unionByName(
            person_blocking_keys(scoped, blacklist)
            .join(rescoped.select("id", "component"), "id")
            .select("component", "key")
            .distinct()
        )
    )
    metrics = {
        "hops": hops,
        "touched_clusters": touched.count(),
        "scope_rows": scoped.count(),
        "delta_rows": delta_persons.count(),
    }
    return out, new_cluster_keys, metrics


def run_incremental_resolution(
    spark,
    turn_stream: DataFrame,
    store_root: str,
    config=None,
    trigger_seconds: int = 60,
):
    """foreachBatch driver: append each micro-batch of signatures to a
    bronze table, then fold the NEW persons into the maintained resolution
    via the delta-scoped closure above — per-batch cost follows the delta,
    not the bronze table. Returns the StreamingQuery (caller awaits/stops
    it). State under ``store_root``: ``persons_silver`` (resolved person
    rows) and ``membership`` (current clusters)."""
    import datetime as dt
    import os

    from identity_matching_spark.operators.blacklist import Blacklist
    from identity_matching_spark.operators.cluster import reduce_people
    from identity_matching_spark.operators.people import build_persons, dedup_signatures
    from identity_matching_spark.plans.pipeline import PipelineConfig

    cfg = config or PipelineConfig(reference_time=dt.datetime.now())
    bl = Blacklist.default()
    sigs = stream_signatures(turn_stream)
    bronze = f"{store_root}/signatures_bronze"
    silver = f"{store_root}/persons_silver"
    member = f"{store_root}/membership"
    keys = f"{store_root}/cluster_keys"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.drop("tools").write.mode("append").parquet(bronze)
        delta = build_persons(
            dedup_signatures(
                batch_df.where((F.col("name") != "") & (F.col("email") != "")).select(
                    "repo", "name", "email", "hash", "ts"
                )
            ),
            bl,
        )
        if os.path.exists(silver):
            silver_df = spark.read.parquet(silver)
            membership = spark.read.parquet(member)
            key_state = (
                spark.read.parquet(keys)
                if os.path.exists(keys)
                else None  # pre-round-4 state: one-off bootstrap derivation
            )
            new_membership, new_keys, _ = incremental_fold(
                silver_df, membership, delta, bl, cfg.max_identities,
                cluster_keys=key_state,
            )
            merged_persons = (
                silver_df.unionByName(delta)
                .groupBy("id", "repo", "name", "email", "name_key", "popular_name")
                .agg(F.max("hash").alias("hash"), F.max("ts").alias("ts"))
                .select(silver_df.columns)
            )
        else:
            merged_persons = delta
            new_membership = reduce_people(delta, bl, cfg.max_identities)
            new_keys = derive_cluster_keys(delta, new_membership, bl)
        # state swap via tmp dirs. The plans READ the old state lazily, so
        # all must materialize to tmp before any old dir is replaced.
        import shutil

        outputs = (
            (silver, merged_persons),
            (member, new_membership),
            (keys, new_keys),
        )
        for path, df in outputs:
            df.write.mode("overwrite").parquet(path + "__tmp")
        for path, _ in outputs:
            shutil.rmtree(path, ignore_errors=True)
            os.rename(path + "__tmp", path)

    return (
        sigs.writeStream.outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .foreachBatch(fold)
        .option("checkpointLocation", f"{store_root}/_stream_checkpoint")
        .start()
    )
