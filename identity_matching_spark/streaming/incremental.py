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

from dataclasses import dataclass

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
    clusterer uses (operators/cluster.py). NULL keys are excluded — the
    clusterer masks their surrogate to NULL (never equi-joins), so they
    couple nothing and must not seed or carry closure edges."""
    names = persons.where(
        F.col("name_key").isNotNull() & ~blacklist.is_popular_name(F.col("name_key"))
    ).select("id", F.xxhash64(F.lit(1), "name_key").alias("key"))
    emails = persons.where(
        F.col("email").isNotNull() & ~blacklist.is_popular_email(F.col("email"))
    ).select("id", F.xxhash64(F.lit(2), "email").alias("key"))
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


@dataclass
class FoldParts:
    """Delta-scoped pieces of one fold, for state stores that persist only
    the affected partitions (see :class:`IncrementalState`). ``membership``
    and ``cluster_keys`` are the full logical results (pass-through union);
    the small frames let a bucketed store rewrite only what changed."""

    membership: DataFrame      # full new membership (untouched ∪ rescoped)
    cluster_keys: DataFrame    # full new (component, key) state
    touched: DataFrame         # DataFrame[component] — re-resolved clusters
    scope_ids: DataFrame       # DataFrame[id] — old members of touched clusters
    rescoped: DataFrame        # membership rows re-emitted by the scope run
    new_keys: DataFrame        # (component, key) rows of the rescoped clusters
    metrics: dict


def _require_exact_mode(membership: DataFrame) -> None:
    """The closure covers name/email blocking keys ONLY: external-id and
    similarity/LSH edges couple clusters through relations the (component,
    key) state does not track, so folding such state silently under-scopes
    (ADVICE r4). Resolutions carrying external ids must take the full
    recompute path; reject them loudly."""
    bad = (
        membership.where(
            F.col("external_id").isNotNull() & (F.col("external_id") != "")
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            "incremental_fold requires an exact-mode resolution (no external "
            f"ids, no similarity edges); found external_id={bad[0]['external_id']!r}"
            " — re-resolve such corpora from scratch instead"
        )


def incremental_fold_parts(
    silver_persons: DataFrame,
    membership: DataFrame,
    delta_persons: DataFrame,
    blacklist,
    max_identities: int | None = 20,
    cluster_keys: DataFrame | None = None,
    check_exact: bool = True,
) -> FoldParts:
    """Core of :func:`incremental_fold`; returns the delta-scoped parts."""
    from identity_matching_spark.operators.cluster import reduce_people

    if check_exact:
        _require_exact_mode(membership)
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
    new_keys = (
        person_blocking_keys(scoped, blacklist)
        .join(rescoped.select("id", "component"), "id")
        .select("component", "key")
        .distinct()
        .localCheckpoint(eager=False)
    )
    new_cluster_keys = cluster_keys.join(touched, "component", "left_anti").unionByName(
        new_keys
    )
    metrics = {
        "hops": hops,
        "touched_clusters": touched.count(),
        "scope_rows": scoped.count(),
        "delta_rows": delta_persons.count(),
    }
    return FoldParts(
        membership=out,
        cluster_keys=new_cluster_keys,
        touched=touched,
        scope_ids=scope_ids,
        rescoped=rescoped,
        new_keys=new_keys,
        metrics=metrics,
    )


def incremental_fold(
    silver_persons: DataFrame,
    membership: DataFrame,
    delta_persons: DataFrame,
    blacklist,
    max_identities: int | None = 20,
    cluster_keys: DataFrame | None = None,
    check_exact: bool = True,
) -> tuple[DataFrame, DataFrame, dict]:
    """Fold a batch of new person rows into an existing exact-mode
    resolution. Returns (new_membership, new_cluster_keys, metrics).

    ``membership`` must be the current EXACT-MODE resolution of
    ``silver_persons`` (id, component, external_id; external ids and
    similarity-mode extra edges are rejected — their couplings are not in
    the key state, see :func:`_require_exact_mode`); ``cluster_keys`` the
    matching (component, key) state (bootstrapped via
    :func:`derive_cluster_keys` and threaded through folds — deriving it
    per batch would re-shuffle the whole corpus, exactly the cost this
    operator exists to avoid; passing None does that derivation, for
    one-off/batch callers). The result equals ``reduce_people(silver ∪
    delta)`` exactly (see the module note for the decomposition argument;
    pinned by tests/test_incremental_delta.py). Per-batch SHUFFLE cost is
    proportional to the touched clusters; the pass-through union of
    untouched membership/keys rows is narrow (no shuffle) —
    :class:`IncrementalState` persists it as touched-bucket-only
    overwrites.
    """
    parts = incremental_fold_parts(
        silver_persons,
        membership,
        delta_persons,
        blacklist,
        max_identities=max_identities,
        cluster_keys=cluster_keys,
        check_exact=check_exact,
    )
    return parts.membership, parts.cluster_keys, parts.metrics


# --- bucketed, manifest-committed state store ------------------------------
#
# The three state tables (persons_silver, membership, cluster_keys) are laid
# out as <root>/<table>/bucket=K/gen=G/ parquet leaves, with a SINGLE
# atomically-replaced manifest JSON naming the live generation per bucket.
# Per batch only the AFFECTED buckets are rewritten under gen=<batch_id>
# (dynamic partition overwrite — untouched buckets are neither read nor
# written), and the one os.replace of the manifest is the commit point:
#
# * crash anywhere before the manifest replace → the old manifest still
#   names only old generations; all three tables stay mutually consistent;
# * foreachBatch replays the batch → gen=<batch_id> leaves are deterministic
#   overwrites of themselves, the commit re-applies idempotently;
# * a manifest batch_id >= the replayed batch's id → the fold is skipped
#   (already committed);
# * generations no manifest references are garbage-collected after commit.
#
# Bronze appends are keyed by batch_id partition (overwrite-in-place), so a
# replayed batch never double-appends.


class IncrementalState:
    """Versioned bucket-partitioned state with an atomic manifest commit."""

    TABLES = (
        "persons_silver",
        "membership",
        "cluster_keys",
        "members_by_comp",
        "key_index",
    )
    # bucket keys: silver/membership by person id (affected buckets are the
    # delta/rescoped ids — never requires scanning old state to discover),
    # cluster_keys by component (removals are keyed by touched components).
    # members_by_comp and key_index are second copies of membership's
    # (id, component) and cluster_keys' (component, key) bucketed by the
    # OTHER side of each relation, so the per-batch closure and scope probes
    # read only matching buckets instead of the whole table (the fold's
    # reads then track the delta like its shuffles already did).
    BUCKET_COL = {
        "persons_silver": "id",
        "membership": "id",
        "cluster_keys": "component",
        "members_by_comp": "component",
        "key_index": "key",
    }

    def __init__(self, spark, root: str, n_buckets: int = 64):
        import os

        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.manifest_path = os.path.join(root, "state_manifest.json")
        self._manifest = self._load()
        if self._manifest and self._manifest.get("n_buckets") != n_buckets:
            raise ValueError(
                f"state at {root} was written with n_buckets="
                f"{self._manifest.get('n_buckets')}, opened with {n_buckets}"
            )
        self.exact_mode_checked = False
        if self._manifest:
            # full sweep once per open: commit-time GC is scoped to the
            # batch's affected buckets, so orphans left by a crash between
            # a commit and its GC (or by a pre-scoped-GC writer) are
            # collected here instead of on every commit
            self._gc(None)

    # -- manifest ----------------------------------------------------------

    def _load(self) -> dict | None:
        import json
        import os

        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as fh:
            return json.load(fh)

    def exists(self) -> bool:
        return self._manifest is not None

    def committed_batch(self) -> int:
        return self._manifest["batch_id"] if self._manifest else -1

    def bucket_expr(self, table: str):
        return F.pmod(F.xxhash64(F.col(self.BUCKET_COL[table])), F.lit(self.n_buckets))

    def _leaf(self, table: str, bucket: int, gen: int) -> str:
        import os

        return os.path.join(self.root, table, f"bucket={bucket}", f"gen={gen}")

    def has_table(self, table: str) -> bool:
        """Whether the manifest knows this table (stores written before the
        index tables existed lack them until their first fold migrates)."""
        return bool(self._manifest) and table in self._manifest["tables"]

    def exact_mode(self) -> bool:
        """True when the manifest records that this state was produced by an
        exact-mode resolution (no external ids, no similarity edges) — set
        at bootstrap by :func:`fold_batch`, whose reduce_people call can
        produce nothing else, and preserved across commits. Legacy stores
        without the marker fall back to the membership scan probe once
        (see ADVICE r5: column shapes alone cannot distinguish a
        similarity-mode resolution, so state NOT written through
        ``fold_batch`` must be re-resolved rather than folded)."""
        return bool(self._manifest) and self._manifest.get("exact_mode", False)

    def read(self, table: str) -> DataFrame:
        """Current contents of a table (live generation of every bucket).
        An empty table (e.g. state bootstrapped from a zero-row first
        micro-batch) reads as an empty frame with its committed schema."""
        gens = self._manifest["tables"][table]
        paths = [self._leaf(table, int(k), g) for k, g in sorted(gens.items())]
        if not paths:
            import json

            from pyspark.sql.types import StructType

            schema = StructType.fromJson(
                json.loads(self._manifest["schemas"][table])
            )
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*paths)

    def read_buckets(self, table: str, buckets: list[int]) -> DataFrame | None:
        """Only the named buckets (partition-pruned read); None if none of
        them currently hold data."""
        gens = self._manifest["tables"][table]
        paths = [self._leaf(table, b, gens[str(b)]) for b in buckets if str(b) in gens]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    # -- commit ------------------------------------------------------------

    def commit(self, batch_id: int, writes: dict[str, tuple[DataFrame, list[int]]]) -> None:
        """Persist ``{table: (content, affected_buckets)}`` as generation
        ``batch_id`` of the affected buckets, then atomically publish the
        new manifest. ``content`` must hold exactly the new rows of the
        affected buckets (pass-through rows of other buckets excluded)."""
        import json
        import os

        new_tables = {}
        schemas = dict(self._manifest.get("schemas", {})) if self._manifest else {}
        for table in self.TABLES:
            df, affected = writes[table]
            schemas[table] = df.schema.json()
            (
                df.withColumn("bucket", self.bucket_expr(table))
                .withColumn("gen", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket", "gen")
                .parquet(os.path.join(self.root, table))
            )
            gens = (
                dict(self._manifest["tables"].get(table, {}))
                if self._manifest
                else {}
            )
            for b in affected:
                # dynamic overwrite writes no leaf for an empty bucket: the
                # manifest entry is dropped and the bucket reads as empty
                if os.path.exists(self._leaf(table, b, batch_id)):
                    gens[str(b)] = batch_id
                else:
                    gens.pop(str(b), None)
            new_tables[table] = gens
        manifest = {
            "batch_id": batch_id,
            "n_buckets": self.n_buckets,
            "exact_mode": True,
            "tables": new_tables,
            "schemas": schemas,
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self.manifest_path)  # the commit point
        self._manifest = manifest
        # commit already knows exactly which buckets changed — GC only
        # those (the per-commit full walk was O(n_buckets × tables) of
        # driver listdir calls per batch; orphans elsewhere are swept once
        # at open, see __init__)
        self._gc({t: writes[t][1] for t in self.TABLES})

    def _gc(self, affected: dict[str, list[int]] | None = None) -> None:
        """Delete generations the manifest no longer references. Runs after
        the commit point — a crash mid-GC leaves only unreferenced leaves.
        ``affected`` limits the walk to those buckets per table (commit
        path); None sweeps every bucket (open-time recovery sweep)."""
        import os
        import shutil

        for table in self.TABLES:
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            gens = self._manifest["tables"].get(table, {})
            if affected is None:
                bdirs = [d for d in os.listdir(tdir) if d.startswith("bucket=")]
            else:
                bdirs = [f"bucket={b}" for b in affected.get(table, [])]
            for bdir in bdirs:
                bucket = bdir.split("=", 1)[1]
                live = gens.get(bucket)
                bpath = os.path.join(tdir, bdir)
                if not os.path.isdir(bpath):
                    continue
                for gdir in os.listdir(bpath):
                    if not gdir.startswith("gen="):
                        continue
                    if live is None or int(gdir.split("=", 1)[1]) != live:
                        shutil.rmtree(os.path.join(bpath, gdir), ignore_errors=True)
                if live is None and not os.listdir(bpath):
                    os.rmdir(bpath)


def _collect_buckets(df: DataFrame, expr) -> list[int]:
    """Distinct bucket values of a delta-scoped frame (small by contract)."""
    return [r[0] for r in df.select(expr.alias("b")).distinct().collect()]


def _touched_closure_bucketed(
    state: IncrementalState, seed_keys: DataFrame, max_hops: int = 25
) -> tuple[DataFrame, int, int]:
    """Bucket-probing twin of :func:`touched_cluster_closure`: each hop
    reads ONLY the key_index buckets matching the frontier keys and the
    cluster_keys buckets matching the newly touched components, so the
    fold's read volume tracks the delta the way its shuffles already do.
    Exact for the same reason the full-table closure is — a bucket is a
    pure function of the equi-join key, so probing matching buckets loses
    no join partner. Returns (touched components, hops, buckets_read)."""
    spark = seed_keys.sparkSession
    kidx_expr = state.bucket_expr("key_index")
    comp_expr = state.bucket_expr("cluster_keys")
    touched = spark.createDataFrame([], "component long")
    frontier = seed_keys.select("key").distinct().localCheckpoint(eager=False)
    buckets_read = 0
    for hops in range(max_hops):
        fb = _collect_buckets(frontier, kidx_expr)
        ki = state.read_buckets("key_index", fb)
        buckets_read += len(fb)
        if ki is None:
            return touched, hops, buckets_read
        new_comps = (
            ki.join(frontier, "key")
            .select("component")
            .distinct()
            .join(touched, "component", "left_anti")
            .localCheckpoint(eager=False)
        )
        if new_comps.isEmpty():
            return touched, hops, buckets_read
        touched = touched.union(new_comps).localCheckpoint(eager=False)
        cb = _collect_buckets(new_comps, comp_expr)
        ck = state.read_buckets("cluster_keys", cb)
        buckets_read += len(cb)
        if ck is None:
            return touched, hops + 1, buckets_read
        frontier = (
            ck.join(new_comps, "component")
            .select("key")
            .distinct()
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(
        f"cluster closure did not converge in {max_hops} hops — "
        "fall back to a full re-resolution for this batch"
    )


def fold_batch(
    state: IncrementalState,
    delta_persons: DataFrame,
    blacklist,
    max_identities: int | None = 20,
    batch_id: int = 0,
    collect_metrics: bool = False,
) -> dict:
    """Fold one batch of person rows into the maintained state — every
    Spark job in here is delta-scoped, READS included:

    * the touched-cluster closure probes the key_index / cluster_keys
      tables bucket-by-bucket (never a full-table scan);
    * the scope expands through the component-bucketed members_by_comp
      copy, and the silver rows it re-reads come from the matching id
      buckets only;
    * silver maintenance merges ONLY ids colliding with the delta
      (broadcast semi/anti joins; the groupBy shuffles colliding ∪ delta
      rows, never the corpus — metric ``merge_rows``);
    * membership/cluster_keys/index rewrites touch only the buckets
      holding scoped/rescoped rows;
    * the commit rewrites only those buckets' leaves (manifest publish is
      the atomic point).

    Stores written before the index tables existed are migrated in place:
    their first fold derives members_by_comp and key_index with one full
    (narrow) scan and commits them alongside the batch; subsequent folds
    are fully delta-scoped. ``metrics['buckets_read']`` reports the probe
    volume so tests can assert reads track the delta, not the corpus.
    """
    import logging

    from identity_matching_spark.operators.cluster import reduce_people

    if state.committed_batch() >= batch_id:
        if state.committed_batch() > batch_id:
            # A batch id BELOW the committed one means the streaming
            # checkpoint was lost and ids restarted — silently dropping
            # every "new" batch until ids catch up is the ADVICE-r5
            # failure. Refuse loudly; equal ids are normal replays.
            raise ValueError(
                f"incoming batch_id={batch_id} is below the committed "
                f"batch {state.committed_batch()} — the streaming "
                "checkpoint was likely deleted while the state manifest "
                "survived. Restore the checkpoint or start a fresh "
                "store_root; refusing to silently drop batches."
            )
        logging.getLogger(__name__).warning(
            "fold_batch: batch %s already committed (manifest batch %s) — "
            "replay skipped",
            batch_id,
            state.committed_batch(),
        )
        return {"skipped_replay": True}
    delta = delta_persons.localCheckpoint(eager=False)

    if not state.exists():
        membership = reduce_people(delta, blacklist, max_identities=max_identities)
        keys = derive_cluster_keys(delta, membership, blacklist)
        all_buckets = list(range(state.n_buckets))
        state.commit(
            batch_id,
            {
                "persons_silver": (delta, all_buckets),
                "membership": (membership, all_buckets),
                "cluster_keys": (keys, all_buckets),
                "members_by_comp": (membership.select("id", "component"), all_buckets),
                "key_index": (keys, all_buckets),
            },
        )
        return {"bootstrap": True, "delta_rows": delta.count() if collect_metrics else None}

    silver_expr = state.bucket_expr("persons_silver")
    member_expr = state.bucket_expr("membership")
    keys_expr = state.bucket_expr("cluster_keys")
    mcomp_expr = state.bucket_expr("members_by_comp")
    kidx_expr = state.bucket_expr("key_index")

    # exact-mode precondition: the manifest marker covers state maintained
    # by this path; legacy stores (no marker) pay the membership probe once
    # per process, then the next commit writes the marker.
    if not state.exact_mode() and not state.exact_mode_checked:
        _require_exact_mode(state.read("membership"))
    state.exact_mode_checked = True

    legacy = not (state.has_table("members_by_comp") and state.has_table("key_index"))
    metrics: dict = {}
    buckets_read = 0

    delta_ids = delta.select("id").distinct().localCheckpoint(eager=False)
    seed_keys = person_blocking_keys(delta, blacklist)

    # --- touched closure + scope (bucket probes; full reads on legacy) ----
    if legacy:
        cluster_keys_full = state.read("cluster_keys").localCheckpoint(eager=False)
        touched, hops = touched_cluster_closure(cluster_keys_full, seed_keys)
        membership_full = state.read("membership")
        scope_ids = membership_full.join(touched, "component").select("id")
    else:
        touched, hops, buckets_read = _touched_closure_bucketed(state, seed_keys)
        tb = _collect_buckets(touched, mcomp_expr)
        mbc = state.read_buckets("members_by_comp", tb)
        buckets_read += len(tb)
        scope_ids = (
            mbc.join(touched, "component").select("id")
            if mbc is not None
            else delta_ids.limit(0)
        )
    scope_ids = scope_ids.localCheckpoint(eager=False)
    touched = touched.localCheckpoint(eager=False)
    metrics["hops"] = hops

    # --- re-resolve the scoped slice --------------------------------------
    scope_read_ids = scope_ids.unionByName(delta_ids).distinct()
    sread_buckets = _collect_buckets(scope_read_ids, silver_expr)
    silver_subset = state.read_buckets("persons_silver", sread_buckets)
    buckets_read += len(sread_buckets)
    scoped_old = (
        silver_subset.join(scope_ids, "id") if silver_subset is not None
        else delta.limit(0)
    )
    scoped = (
        scoped_old.unionByName(delta)
        .dropDuplicates(["id"])
        .localCheckpoint(eager=False)
    )
    rescoped = reduce_people(
        scoped, blacklist, max_identities=max_identities, verify_keys=False
    ).localCheckpoint(eager=False)
    new_keys = (
        person_blocking_keys(scoped, blacklist)
        .join(rescoped.select("id", "component"), "id")
        .select("component", "key")
        .distinct()
        .localCheckpoint(eager=False)
    )
    if collect_metrics:
        metrics["touched_clusters"] = touched.count()
        metrics["scope_rows"] = scoped.count()
        metrics["delta_rows"] = delta.count()

    # --- silver: merge colliding ids only (delta-sized) -------------------
    silver_buckets = _collect_buckets(delta_ids, silver_expr)
    old_silver = state.read_buckets("persons_silver", silver_buckets)
    if old_silver is None:
        silver_content = delta
        merge_rows = delta.count() if collect_metrics else None
    else:
        colliding = old_silver.join(F.broadcast(delta_ids), "id", "semi")
        keep = old_silver.join(F.broadcast(delta_ids), "id", "left_anti")
        merge_input = colliding.unionByName(delta)
        merged = (
            merge_input.groupBy("id", "repo", "name", "email", "name_key", "popular_name")
            .agg(F.max("hash").alias("hash"), F.max("ts").alias("ts"))
            .select(old_silver.columns)
        )
        silver_content = keep.unionByName(merged)
        merge_rows = merge_input.count() if collect_metrics else None
    metrics["merge_rows"] = merge_rows

    # --- membership: affected buckets are the scoped/delta/rescoped ids' --
    changed_ids = (
        scope_ids.unionByName(delta_ids).unionByName(rescoped.select("id"))
    ).distinct().localCheckpoint(eager=False)
    member_buckets = _collect_buckets(changed_ids, member_expr)
    old_member = state.read_buckets("membership", member_buckets)
    if old_member is None:
        member_content = rescoped
        old_changed_rows = None
    else:
        # old rows of re-resolved ids: needed both for the anti-join below
        # and to locate their members_by_comp buckets (an id re-arriving
        # with only popular keys seeds no closure, so its OLD component is
        # not touched — its stale by-component row must still be replaced)
        old_changed_rows = old_member.join(
            F.broadcast(changed_ids), "id", "semi"
        ).localCheckpoint(eager=False)
        surviving = old_member.join(
            F.broadcast(touched), "component", "left_anti"
        ).join(F.broadcast(rescoped.select("id")), "id", "left_anti")
        member_content = surviving.unionByName(rescoped)

    # --- cluster_keys: removals by touched comps, additions by rescoped ---
    key_comps = touched.unionByName(new_keys.select("component")).distinct()
    key_buckets = _collect_buckets(key_comps, keys_expr)
    old_keys = state.read_buckets("cluster_keys", key_buckets)
    buckets_read += len(key_buckets)
    if old_keys is None:
        keys_content = new_keys
        touched_old_keys = None
    else:
        keys_content = old_keys.join(
            F.broadcast(touched), "component", "left_anti"
        ).unionByName(new_keys)
        # the touched components' OLD keys locate the key_index buckets
        # whose rows must be dropped
        touched_old_keys = old_keys.join(
            F.broadcast(touched), "component", "semi"
        ).localCheckpoint(eager=False)

    # --- members_by_comp: same rows as membership, bucketed by component --
    mbc_comps = touched.unionByName(rescoped.select("component")).distinct()
    if old_changed_rows is not None:
        mbc_comps = mbc_comps.unionByName(old_changed_rows.select("component")).distinct()
    if legacy:
        # migration: derive the full by-component copy from the pre-fold
        # membership, then apply the same removals/additions
        mbc_buckets = list(range(state.n_buckets))
        old_mbc = membership_full.select("id", "component")
    else:
        mbc_buckets = _collect_buckets(mbc_comps, mcomp_expr)
        old_mbc = state.read_buckets("members_by_comp", mbc_buckets)
    if old_mbc is None:
        mbc_content = rescoped.select("id", "component")
    else:
        mbc_surviving = old_mbc.join(
            F.broadcast(touched), "component", "left_anti"
        ).join(F.broadcast(changed_ids), "id", "left_anti")
        mbc_content = mbc_surviving.unionByName(rescoped.select("id", "component"))

    # --- key_index: same rows as cluster_keys, bucketed by key ------------
    if legacy:
        kidx_buckets = list(range(state.n_buckets))
        old_kidx = cluster_keys_full
    else:
        kidx_key_rows = new_keys.select("key")
        if touched_old_keys is not None:
            kidx_key_rows = kidx_key_rows.unionByName(touched_old_keys.select("key"))
        kidx_buckets = _collect_buckets(kidx_key_rows.distinct(), kidx_expr)
        old_kidx = state.read_buckets("key_index", kidx_buckets)
        buckets_read += len(kidx_buckets)
    if old_kidx is None:
        kidx_content = new_keys
    else:
        kidx_content = old_kidx.join(
            F.broadcast(touched), "component", "left_anti"
        ).unionByName(new_keys)

    if collect_metrics:
        metrics["silver_buckets"] = len(silver_buckets)
        metrics["member_buckets"] = len(member_buckets)
        metrics["key_buckets"] = len(key_buckets)
        metrics["buckets_read"] = buckets_read
        metrics["legacy_migration"] = legacy

    state.commit(
        batch_id,
        {
            "persons_silver": (silver_content, silver_buckets),
            "membership": (member_content, member_buckets),
            "cluster_keys": (keys_content, key_buckets),
            "members_by_comp": (mbc_content, mbc_buckets),
            "key_index": (kidx_content, kidx_buckets),
        },
    )
    return metrics


def migrate_flat_bronze(bronze: str) -> int:
    """Pre-manifest bronze was written as flat part files at the bronze
    root; once any ``batch_id=`` dir exists, partition discovery silently
    ignores those root files (verified on this Spark), so a bootstrap over
    mixed layouts would rebuild from a PARTIAL corpus — exactly the failure
    the bootstrap exists to prevent (ADVICE r5). Move the flat files into a
    synthetic ``batch_id=-1`` partition; idempotent (re-running moves
    nothing) and crash-safe (each file is os.replace'd individually, and a
    half-moved root reads fully once the rest move on the next attempt).
    Returns the number of files migrated."""
    import os

    if not os.path.isdir(bronze):
        return 0
    flat = [
        f
        for f in os.listdir(bronze)
        if f.startswith("part-") and not f.endswith(".crc")
    ]
    if not flat:
        return 0
    legacy_dir = os.path.join(bronze, "batch_id=-1")
    os.makedirs(legacy_dir, exist_ok=True)
    for f in flat:
        os.replace(os.path.join(bronze, f), os.path.join(legacy_dir, f))
    success = os.path.join(bronze, "_SUCCESS")
    if os.path.exists(success):
        os.replace(success, os.path.join(legacy_dir, "_SUCCESS"))
    return len(flat)


def run_incremental_resolution(
    spark,
    turn_stream: DataFrame,
    store_root: str,
    config=None,
    trigger_seconds: int = 60,
    n_buckets: int = 64,
):
    """foreachBatch driver: write each micro-batch of signatures to a
    batch_id-partitioned bronze table (idempotent under replay), then fold
    the NEW persons into the maintained resolution via the delta-scoped
    closure above — per-batch cost follows the delta, not the bronze table.
    Returns the StreamingQuery (caller awaits/stops it). State under
    ``store_root``: bucketed ``persons_silver``/``membership``/
    ``cluster_keys`` behind a manifest (:class:`IncrementalState`; read the
    current resolution via ``IncrementalState(spark, root).read(
    "membership")``). If the manifest is missing but bronze data exists
    (state lost or pre-manifest layout), the fold REBUILDS from the full
    bronze table instead of silently restarting from one batch."""
    import datetime as dt
    import os

    from identity_matching_spark.operators.blacklist import Blacklist
    from identity_matching_spark.operators.people import build_persons, dedup_signatures
    from identity_matching_spark.plans.pipeline import PipelineConfig

    cfg = config or PipelineConfig(reference_time=dt.datetime.now())
    bl = Blacklist.default()
    sigs = stream_signatures(turn_stream)
    bronze = f"{store_root}/signatures_bronze"
    state = IncrementalState(spark, store_root, n_buckets=n_buckets)

    def _persons_of(sig_df: DataFrame) -> DataFrame:
        return build_persons(
            dedup_signatures(
                sig_df.where((F.col("name") != "") & (F.col("email") != "")).select(
                    "repo", "name", "email", "hash", "ts"
                )
            ),
            bl,
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.drop("tools").write.mode("overwrite").parquet(
            f"{bronze}/batch_id={batch_id}"
        )
        if state.exists():
            delta = _persons_of(batch_df)
        else:
            # bootstrap — from ALL bronze (which already includes this
            # batch), so a lost manifest recovers the corpus, not one slice;
            # pre-manifest flat-layout files are migrated into a batch_id
            # partition first so partition discovery cannot drop them
            migrate_flat_bronze(bronze)
            delta = _persons_of(spark.read.parquet(bronze))
        fold_batch(
            state, delta, bl, max_identities=cfg.max_identities, batch_id=batch_id
        )

    return (
        sigs.writeStream.outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .foreachBatch(fold)
        .option("checkpointLocation", f"{store_root}/_stream_checkpoint")
        .start()
    )
