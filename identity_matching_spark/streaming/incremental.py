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


def run_incremental_resolution(
    spark,
    turn_stream: DataFrame,
    store_root: str,
    config=None,
    trigger_seconds: int = 60,
):
    """foreachBatch driver: append each micro-batch of signatures to a
    bronze table, then re-run the checkpointed batch pipeline over the
    merged table. Returns the StreamingQuery (caller awaits/stops it)."""
    import datetime as dt

    from identity_matching_spark.plans.pipeline import PipelineConfig

    cfg = config or PipelineConfig(reference_time=dt.datetime.now())
    sigs = stream_signatures(turn_stream)
    bronze = f"{store_root}/signatures_bronze"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.drop("tools").write.mode("append").parquet(bronze)
        merged = spark.read.parquet(bronze)
        # conv-level turns aren't needed again: signatures ARE the pipeline
        # input; run from the persons stage on
        from identity_matching_spark.operators.blacklist import Blacklist
        from identity_matching_spark.operators.cluster import reduce_people
        from identity_matching_spark.operators.people import build_persons, dedup_signatures

        persons = build_persons(
            dedup_signatures(
                merged.where((F.col("name") != "") & (F.col("email") != "")).select(
                    "repo", "name", "email", "hash", "ts"
                )
            ),
            Blacklist.default(),
        )
        membership = reduce_people(persons, Blacklist.default(), cfg.max_identities)
        membership.write.mode("overwrite").parquet(f"{store_root}/membership")

    return (
        sigs.writeStream.outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .foreachBatch(fold)
        .option("checkpointLocation", f"{store_root}/_stream_checkpoint")
        .start()
    )
