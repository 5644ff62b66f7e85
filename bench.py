#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers the engine's hot paths: full transcript identity
resolution (extraction → blocking → CC → clusters), standalone CC, the
flagship customer-derived clustering, exact/near dedup, simhash, and
brute-force cosine top-k. Also reports pairs-scored/sec for the identity
pipeline (BASELINE.md throughput metric).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import functions as F

    from identity_matching_spark.plans.driver_queries import QUERIES
    from identity_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
    from identity_matching_spark.session import get_spark
    from identity_matching_spark.sources.synth import synth_transcripts

    # Scaling-protocol fairness: the shuffle partitioning is part of the
    # PLAN, not the cluster size — hold it constant across parallelism
    # levels (default 128 ≈ 4 waves at 32 threads, amortizing stragglers)
    # so an N-vs-4N comparison changes only the executor thread count.
    # Smaller scan splits keep the read stage as parallel as the shuffles.
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "128"))
    spark = get_spark(
        app_name="idmatch-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            # the pipeline's AQE-replanned queries produce ~300 distinct
            # codegen fragments per run — the default 100-entry compile
            # cache cycles, so Janino recompiles on the driver inside every
            # run (measured ~40s of stage-launch delay at the 3M-conv
            # corpus, tools/profile_e2e.py). Size the cache to hold them.
            "spark.sql.codegen.cache.maxEntries": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def clear_storage():
        # localCheckpoint blocks of a previous (warm) run otherwise occupy
        # executor memory through the timed run (measured: GC 8.5 s/core
        # when the warm pass's blocks stay resident)
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(True)
        spark.catalog.clearCache()

    # Min-of-N interleaved reps (default 3): this host has hypervisor CPU
    # steal that swings single-shot timings ±40% — one slow rep must not
    # read as an engine regression (VERDICT r4: untouched queries "regressed"
    # 71–217% under the old single-rep protocol). Reps are interleaved
    # (rep loop outside the query loop) so weather hits all queries of a rep
    # alike; the JSON reports the per-query minimum plus every rep.
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    rep_times: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    def record(name: str, seconds: float) -> None:
        rep_times.setdefault(name, []).append(round(seconds, 3))

    # --- identity pipeline over a synthetic transcript corpus sized to sf ---
    # The corpus is materialized to parquet first (generation is harness, not
    # engine), and every measured query runs once untimed to absorb
    # whole-stage-codegen/JIT compilation — a fixed driver cost that is noise
    # at production runtimes but dominates second-scale local runs.
    ncust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    mult = int(os.environ.get("SPARK_GRAFT_CONV_MULT", "20"))
    n_convs = ncust * mult        # sf0.1 default → 300k convs ≈ 1.8M turns
    # latent persons scale with the corpus (20 convs/person): the clustering
    # stages carry data proportional to the input, as production would —
    # a fixed tiny person count would leave everything after extraction
    # data-free and measure only the driver's serial floor
    n_persons = max(n_convs // 20, 10)

    corpus_dir = os.environ.get(
        "SPARK_GRAFT_CORPUS_DIR", f"/tmp/idmatch_bench_corpus_{n_convs}_{n_persons}"
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_transcripts(spark, n_convs=n_convs, n_persons=n_persons, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    transcripts = spark.read.parquet(corpus_dir)

    # --- operator benchmarks from the driver query set ---
    # (before the e2e run: the large-corpus pipeline leaves checkpointed
    # blocks in executor memory that would distort the small-query timings)
    # scaling-protocol runs skip these second-scale operator rows: their cost
    # is dominated by fixed per-job overhead at sf0.1 (they don't grow with
    # the scaling corpus), so they say nothing about N→4N data scaling and
    # only stretch the pinned low-core legs
    small_queries = () if os.environ.get("SPARK_GRAFT_E2E_ONLY") else (
        "q06_connected_components",
        "q07_identity_clusters",
        "q10_exact_dedup",
        "q12_ngram_jaccard_pairs",
        "q13_simhash",
        "q14_topk_cosine",
    )
    for name in small_queries:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm

    def run_e2e(df, similarity: bool = False) -> tuple[int, dict]:
        out = run_pipeline(
            spark,
            df,
            PipelineConfig(
                reference_time=dt.datetime(2026, 1, 1), similarity_mode=similarity
            ),
        )
        return out["membership"].count(), out

    # warmup: full corpus at the default bench scale (plan + JIT + page
    # cache all warm, like a long-running production session); stress-scale
    # corpora (>1M convs) warm on a 10%-size same-shape corpus — big enough
    # that AQE makes the same plan choices, so the timed run's codegen
    # fragments are already compiled (measured: a tiny warm corpus leaves
    # ~300 Janino fragments compiling inside the timed window)
    def warm(similarity: bool = False):
        # SPARK_GRAFT_WARM_FRAC overrides the warm-corpus size (scaling legs
        # at 1 pinned core can't afford a full untimed pass; 1/3-size keeps
        # AQE making the same plan choices so the fragments match)
        frac = float(
            os.environ.get(
                "SPARK_GRAFT_WARM_FRAC", "1.0" if n_convs <= 1_000_000 else "0.1"
            )
        )
        if frac >= 1.0:
            run_e2e(transcripts, similarity)
        else:
            wc = max(int(n_convs * frac), 15000)
            wp = max(wc // 20, 10)
            warm_dir = f"/tmp/idmatch_bench_warm_{wc}_{wp}"
            if not os.path.exists(os.path.join(warm_dir, "_SUCCESS")):
                synth_transcripts(spark, n_convs=wc, n_persons=wp, seed=42).write.mode(
                    "overwrite"
                ).parquet(warm_dir)
            run_e2e(spark.read.parquet(warm_dir), similarity)
        clear_storage()  # the warm run's localCheckpoint blocks must not
        #                  occupy executor memory during the timed run

    # both e2e shapes warm ONCE (plan/JIT state persists across reps; the
    # localCheckpoint blocks are cleared after every run)
    warm()
    warm(similarity=True)

    for rep in range(n_reps):
        for name in small_queries:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            record(name, time.time() - t0)

        t0 = time.time()
        n_members, out = run_e2e(transcripts)
        elapsed = time.time() - t0
        record("identity_e2e", elapsed)
        if rep == 0:
            # corpus-derived counts are rep-invariant; compute them once,
            # BEFORE clear_storage (unpersisting a localCheckpoint deletes
            # its only copy — the truncated lineage cannot recompute).
            # pairs scored = candidate edges examined (star edges per key)
            persons = out["persons"]
            pairs = 0
            for key in ("email", "name_key"):
                sizes = (
                    persons.groupBy(key).count().agg(F.sum(F.col("count") - 1)).collect()[0][0]
                )
                pairs += int(sizes or 0)
            extras["pairs_scored"] = pairs
            extras["turns"] = n_convs  # conversations resolved
            extras["members"] = n_members
        clear_storage()

        # the FULL north-rule pipeline — blocking + MinHash-LSH candidates +
        # batched Jaro-Winkler scoring + clustering (exact mode skips stage 3)
        t0 = time.time()
        n_members_sim, out_sim = run_e2e(transcripts, similarity=True)
        record("identity_e2e_sim", time.time() - t0)
        if rep == 0:
            sim_extra = out_sim["scored_pairs"]
            extras["sim_pairs_kept"] = int(sim_extra.count()) if sim_extra is not None else 0
            extras["sim_members"] = n_members_sim
        clear_storage()

    timings = {name: min(times) for name, times in rep_times.items()}
    extras["pairs_per_sec"] = round(extras["pairs_scored"] / timings["identity_e2e"], 1)
    extras["rows_per_sec"] = round(n_convs / timings["identity_e2e"], 1)
    extras["sim_rows_per_sec"] = round(n_convs / timings["identity_e2e_sim"], 1)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "reps": rep_times,
                "n_reps": n_reps,
                "sf": sf,
                "cpus": int(cpus),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
