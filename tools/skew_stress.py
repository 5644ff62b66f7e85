#!/usr/bin/env python
"""Adversarial skew stress (VERDICT r3 #6): residual mega-blocks.

The engine's skew story is semantic (popular keys eliminated, star edges,
partial aggs) plus AQE for residuals — this tool measures it adversarially
instead of arguing it. The corpus injects two mega-blocks that survive
popular-key elimination because the hot values are NOT in the static
popular lists:

* one email shared by ``hot_n`` conversations with distinct names — a
  mega email block (single phase-1 component, star edges);
* one name shared by ``hot_n`` conversations with distinct emails — a
  mega over-cap name block (``hot_n`` components into one capped greedy
  group, the worst case for the applyInPandas path).

Runs the exact-mode pipeline with the event log on, then asserts the
straggler rule: in every timed stage with ≥ 8 tasks, the slowest task is
≤ 4× the stage median, unless the task is under 2 s (sub-second skew is
noise, not a scale risk). Writes BENCH/skew_stress.json.

Usage: taskset -c 0-7 python tools/skew_stress.py [cpus] [base_convs] [hot_n]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, n_convs: int, hot_n: int):
    from pyspark.sql import functions as F

    from identity_matching_spark.sources.synth import synth_transcripts

    base = synth_transcripts(spark, n_convs=n_convs, n_persons=max(n_convs // 20, 10), seed=42)

    def hot(prefix: str, text_fmt):
        return (
            spark.range(hot_n)
            .select(
                F.concat(F.lit(prefix), F.col("id").cast("string")).alias("conv_id"),
                F.lit(0).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                text_fmt.alias("text"),
                F.lit("").alias("tool"),
                (
                    F.lit("2025-06-01 00:00:00").cast("timestamp")
                    + F.make_interval(secs=F.col("id").cast("double"))
                ).alias("ts"),
            )
        )

    # hot email: distinct names, one shared address (not in popular_emails)
    hot_email = hot(
        "hotmail-",
        F.format_string("name: Hotuser %s\nemail: hotshared@corp-stress.example", F.col("id")),
    )
    # hot name: one shared name (not in popular_names), distinct emails
    hot_name = hot(
        "hotname-",
        F.format_string("name: Hot Shared\nemail: u%s@hot-stress.example", F.col("id")),
    )
    return base.unionByName(hot_email).unionByName(hot_name)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    hot_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000
    log_dir = "/tmp/idmatch_skew_log"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    from identity_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
    from identity_matching_spark.session import get_spark

    spark = get_spark(
        app_name="idmatch-skew-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "128")),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.sql.codegen.cache.maxEntries": "2000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = f"/tmp/idmatch_skew_corpus_{n_convs}_{hot_n}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        build_corpus(spark, n_convs, hot_n).write.mode("overwrite").parquet(corpus_dir)
    transcripts = spark.read.parquet(corpus_dir)

    def run(df):
        out = run_pipeline(
            spark, df, PipelineConfig(reference_time=dt.datetime(2026, 1, 1))
        )
        return out["membership"].count()

    t0_ms = time.time() * 1000
    t0 = time.time()
    n = run(transcripts)
    wall = time.time() - t0
    print(f"=== skew stress: wall {wall:.2f}s members={n} cpus={cpus} "
          f"base={n_convs} hot={hot_n}+{hot_n} ===")
    spark.stop()

    # --- event log: per-stage task duration distribution -------------------
    log_path = max(
        (os.path.join(log_dir, f) for f in os.listdir(log_dir)), key=os.path.getmtime
    )
    stage_durs: dict[int, list[float]] = {}
    stage_names: dict[int, str] = {}
    with open(log_path) as fh:
        for line in fh:
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerTaskEnd":
                ti = ev.get("Task Info") or {}
                if ti.get("Launch Time", 0) >= t0_ms and ti.get("Finish Time"):
                    stage_durs.setdefault(ev["Stage ID"], []).append(
                        (ti["Finish Time"] - ti["Launch Time"]) / 1000
                    )
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_names[si["Stage ID"]] = si["Stage Name"]

    rows = []
    violations = []
    for sid, durs in sorted(stage_durs.items()):
        if len(durs) < 8:
            continue
        mx, med = max(durs), statistics.median(durs)
        ratio = mx / max(med, 1e-3)
        flagged = mx > 2.0 and ratio > 4.0
        rows.append(
            {
                "stage": sid,
                "name": stage_names.get(sid, "?")[:60],
                "tasks": len(durs),
                "median_s": round(med, 3),
                "max_s": round(mx, 3),
                "ratio": round(ratio, 2),
                "straggler": flagged,
            }
        )
        if flagged:
            violations.append(rows[-1])

    rows.sort(key=lambda r: r["max_s"], reverse=True)
    print(f"{'stage':>6} {'tasks':>6} {'median':>8} {'max':>8} {'ratio':>6}  name")
    for r in rows[:15]:
        print(
            f"{r['stage']:6d} {r['tasks']:6d} {r['median_s']:8.3f} "
            f"{r['max_s']:8.3f} {r['ratio']:6.2f}  {r['name']}"
        )

    os.makedirs("BENCH", exist_ok=True)
    report = {
        "cpus": cpus,
        "base_convs": n_convs,
        "hot_block": hot_n,
        "wall_sec": round(wall, 2),
        "members": n,
        "stages": rows,
        "straggler_rule": "max task <= 4x stage median for tasks > 2s, stages >= 8 tasks",
        "violations": violations,
    }
    with open("BENCH/skew_stress.json", "w") as fh:
        json.dump(report, fh, indent=1)
    if violations:
        print(f"\nSTRAGGLER RULE VIOLATED in {len(violations)} stage(s):")
        for v in violations:
            print(f"  {v}")
        sys.exit(1)
    print("\nstraggler rule PASSED: no stage has a >2s task above 4x its median")


if __name__ == "__main__":
    main()
