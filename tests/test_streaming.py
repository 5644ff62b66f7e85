"""Streaming signature extraction: file-source stream → watermarked
session aggregation produces the same signatures as the batch extractor."""

import time

from pyspark.sql import functions as F

from identity_matching_spark.operators.signatures import extract_signatures
from identity_matching_spark.sources.synth import synth_transcripts
from identity_matching_spark.streaming.incremental import stream_signatures


def test_stream_signatures_match_batch(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=120, n_persons=12, seed=11)
    src = str(tmp_path / "turns")
    # sentinel turn far in the future: the watermark only advances with event
    # time, so without it the newest session never closes in append mode
    sentinel = t.limit(1).select(
        F.lit("zzz-sentinel").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("name: Sentinel\nemail: s@s.org").alias("text"),
        F.lit("").alias("tool"),
        F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    t.unionByName(sentinel).write.parquet(src)

    stream = spark.readStream.schema(t.schema).parquet(src)
    sigs = stream_signatures(stream, watermark="1 minute", session_gap="10 minutes")
    out_dir = str(tmp_path / "sigs")
    q = (
        sigs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append-mode session windows only emit once the watermark passes; with
    # availableNow the final trigger flushes all closed sessions
    got = (
        spark.read.parquet(out_dir)
        .where(F.col("conv_id") != "zzz-sentinel")
        .select("repo", "name", "email", "conv_id")
    )
    batch = extract_signatures(t).select("repo", "name", "email", "conv_id")
    missing = batch.exceptAll(got).count()
    extra = got.exceptAll(batch).count()
    assert missing == 0 and extra == 0, (missing, extra)


def test_stateful_signatures_match_batch(spark, tmp_path):
    """applyInPandasWithState accumulator converges to the batch extraction
    (latest update per conversation)."""
    from identity_matching_spark.streaming.incremental import stateful_signatures

    t = synth_transcripts(spark, n_convs=80, n_persons=8, seed=13)
    src = str(tmp_path / "turns2")
    t.write.parquet(src)
    stream = spark.readStream.schema(t.schema).parquet(src)
    sigs = stateful_signatures(stream)
    out_dir = str(tmp_path / "state_sigs")
    q = (
        sigs.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_sigs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("state_sigs")
        .groupBy("conv_id")
        .agg(
            F.max_by("name", "n_turns").alias("name"),
            F.max_by("email", "n_turns").alias("email"),
        )
    )
    batch = extract_signatures(t).select(
        "conv_id",
        F.col("name").alias("b_name"),
        F.col("email").alias("b_email"),
    )
    joined = got.join(batch, "conv_id")
    bad = joined.where(
        (F.col("name") != F.col("b_name")) | (F.col("email") != F.col("b_email"))
    ).count()
    assert bad == 0 and joined.count() == 80
