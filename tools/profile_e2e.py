#!/usr/bin/env python
"""Decompose the e2e pipeline's wall-clock into per-job/per-stage costs.

The two-point scaling fit (BENCH/BASELINE.md) shows a ~50 s parallelism-
independent component at the 3M-conv corpus. This tool attributes it: runs
the identity pipeline once (warm plans) with the Spark event log enabled,
then parses the log into

* per-job wall-clock + the sum of executor task time (so `wall - tasks/cores`
  is scheduling/skew/driver overhead),
* inter-job gaps (driver think time: planning, py4j, Python),
* the top stages by wall-clock with their task counts.

Usage: taskset -c 0-7 python tools/profile_e2e.py [cpus] [n_convs]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    n_persons = max(n_convs // 20, 10)
    log_dir = "/tmp/idmatch_profile_log"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    from identity_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
    from identity_matching_spark.session import get_spark
    from identity_matching_spark.sources.synth import synth_transcripts

    spark = get_spark(
        app_name="idmatch-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "128")),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.sql.codegen.cache.maxEntries": os.environ.get(
                "SPARK_GRAFT_CODEGEN_CACHE", "2000"
            ),
            **(
                {"spark.sql.autoBroadcastJoinThreshold": os.environ["SPARK_GRAFT_BROADCAST"]}
                if os.environ.get("SPARK_GRAFT_BROADCAST")
                else {}
            ),
            **(
                {"spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ["SPARK_GRAFT_ADVISORY"]}
                if os.environ.get("SPARK_GRAFT_ADVISORY")
                else {}
            ),
            **(
                {"spark.sql.adaptive.coalescePartitions.parallelismFirst": os.environ["SPARK_GRAFT_PFIRST"]}
                if os.environ.get("SPARK_GRAFT_PFIRST")
                else {}
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = f"/tmp/idmatch_bench_corpus_{n_convs}_{n_persons}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synth_transcripts(spark, n_convs=n_convs, n_persons=n_persons, seed=42).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
    transcripts = spark.read.parquet(corpus_dir)

    sim = bool(os.environ.get("SPARK_GRAFT_PROFILE_SIM"))

    def run(df):
        out = run_pipeline(
            spark,
            df,
            PipelineConfig(reference_time=dt.datetime(2026, 1, 1), similarity_mode=sim),
        )
        return out["membership"].count()

    # warm plans. SPARK_GRAFT_WARM=full warms on the actual corpus (same AQE
    # decisions → same codegen fragments → compile cache hot, like a
    # steady-state production session); 'small' warms on a small same-shape
    # corpus (r2 protocol — AQE re-plans at full size, so fragment compiles
    # land inside the timed window).
    warm_mode = os.environ.get("SPARK_GRAFT_WARM", "small")
    if warm_mode == "full":
        run(transcripts)
    else:
        wc = 15000 if warm_mode == "small" else max(n_convs // 10, 15000)
        wp = max(wc // 20, 10)
        warm_dir = f"/tmp/idmatch_bench_warm_{wc}_{wp}"
        if not os.path.exists(os.path.join(warm_dir, "_SUCCESS")):
            synth_transcripts(spark, n_convs=wc, n_persons=wp, seed=42).write.mode(
                "overwrite"
            ).parquet(warm_dir)
        run(spark.read.parquet(warm_dir))
    # release the warm run's localCheckpoint blocks before timing
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(True)
    spark.catalog.clearCache()

    def codegen_stats():
        # Scala object → static forwarders; Histogram values are nanos
        cm = spark._jvm.org.apache.spark.metrics.source.CodegenMetrics
        h = cm.METRIC_COMPILATION_TIME()
        return h.getCount(), h.getSnapshot().getMean() * h.getCount() / 1e6

    c0, ms0 = codegen_stats()
    t0_ms = time.time() * 1000
    t0 = time.time()
    n = run(transcripts)
    wall = time.time() - t0
    c1, ms1 = codegen_stats()
    print(f"\n=== e2e wall {wall:.2f}s, members={n}, cpus={cpus}, convs={n_convs} ===")
    print(f"janino compiles in timed window: {c1 - c0} fragments, ~{(ms1 - ms0)/1000:.1f}s driver compile time")
    spark.stop()

    # --- parse the event log -------------------------------------------------
    log_path = max(
        (os.path.join(log_dir, f) for f in os.listdir(log_dir)),
        key=os.path.getmtime,
    )
    if os.path.isdir(log_path):  # rolling event log (v2) — a dir of parts
        parts = sorted(
            os.path.join(log_path, f)
            for f in os.listdir(log_path)
            if "events" in f
        )
    else:
        parts = [log_path]

    def lines():
        for p in parts:
            with open(p) as fh:
                yield from fh

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_tasks: dict[int, dict] = {}
    task_spans: list[tuple[float, float]] = []
    if True:
        for line in lines():
            ev = json.loads(line)
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "site": ev.get("Properties", {}).get("callSite.short", ""),
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                # AQE stage names are all "withThreadLocalCaptured" futures;
                # the RDD scope chain carries the physical operators
                scopes: list[str] = []
                for r in si.get("RDD Info", []):
                    sc = r.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except (ValueError, AttributeError):
                            nm = str(sc)
                        if nm and not nm.startswith("WholeStageCodegen"):
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "name": " ".join(dict.fromkeys(scopes)) or si["Stage Name"],
                    "start": si.get("Submission Time", 0),
                    "end": si.get("Completion Time", 0),
                    "tasks": si["Number of Tasks"],
                }
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                ti = ev.get("Task Info") or {}
                sm = m.get("Shuffle Read Metrics") or {}
                agg = stage_tasks.setdefault(
                    sid,
                    {"run": 0, "n": 0, "deser": 0, "gc": 0, "fetch": 0,
                     "rser": 0, "span": 0, "launch0": 1 << 62, "finishN": 0,
                     "spill_mem": 0, "spill_disk": 0},
                )
                agg["spill_mem"] += m.get("Memory Bytes Spilled", 0)
                agg["spill_disk"] += m.get("Disk Bytes Spilled", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                agg["shuf_w"] = agg.get("shuf_w", 0) + sw.get("Shuffle Bytes Written", 0)
                agg["shuf_r"] = agg.get("shuf_r", 0) + sm.get(
                    "Local Bytes Read", 0
                ) + sm.get("Remote Bytes Read", 0)
                agg["run"] += m.get("Executor Run Time", 0)
                agg["deser"] += m.get("Executor Deserialize Time", 0)
                agg["gc"] += m.get("JVM GC Time", 0)
                agg["fetch"] += sm.get("Fetch Wait Time", 0)
                agg["rser"] += m.get("Result Serialization Time", 0)
                agg["span"] += ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                agg["launch0"] = min(agg["launch0"], ti.get("Launch Time", 1 << 62))
                agg["finishN"] = max(agg["finishN"], ti.get("Finish Time", 0))
                agg["n"] += 1
                if ti.get("Launch Time") and ti.get("Finish Time"):
                    task_spans.append((ti["Launch Time"], ti["Finish Time"]))

    timed_jobs = sorted(
        (j for j in jobs.values() if j.get("start", 0) >= t0_ms and "end" in j),
        key=lambda j: j["start"],
    )
    print(f"\n{len(timed_jobs)} jobs in the timed window")
    total_job_wall = 0.0
    gaps = 0.0
    prev_end = t0_ms
    rows = []
    for j in timed_jobs:
        jw = (j["end"] - j["start"]) / 1000
        gap = max(0.0, (j["start"] - prev_end) / 1000)
        gaps += gap
        prev_end = max(prev_end, j["end"])
        total_job_wall += jw
        trun = sum(stage_tasks.get(s, {}).get("run", 0) for s in j["stages"]) / 1000
        ntask = sum(stage_tasks.get(s, {}).get("n", 0) for s in j["stages"])
        rows.append((jw, gap, trun, ntask, j["site"]))
    print(f"sum(job wall) = {total_job_wall:.2f}s   sum(inter-job gaps) = {gaps:.2f}s")
    # per-job task-time sums, keyed by job order — the job sequence of one
    # pipeline is deterministic, so two runs at different core counts can be
    # diffed job-by-job to find the stages whose CPU inflates with threads
    dump = os.environ.get("SPARK_GRAFT_PROFILE_DUMP")
    if dump:
        with open(dump, "w") as fh:
            json.dump(
                [
                    {"idx": i, "wall": jw, "run": trun, "tasks": ntask}
                    for i, (jw, gap, trun, ntask, site) in enumerate(rows)
                ],
                fh,
            )
    print(f"{'job_wall':>9} {'gap_before':>10} {'task_sum':>9} {'ideal@n':>8} {'tasks':>6}  site")
    for jw, gap, trun, ntask, site in rows:
        print(f"{jw:9.2f} {gap:10.2f} {trun:9.1f} {trun / cpus:8.2f} {ntask:6d}  {site[:60]}")

    # --- core-occupancy timeline: how much of the wall had idle cores? ----
    if task_spans:
        pts = []
        for a, b in task_spans:
            if a >= t0_ms:
                pts.append((a, 1))
                pts.append((b, -1))
        pts.sort()
        busy = idle = 0.0
        cur = 0
        prev = pts[0][0] if pts else t0_ms
        for ts, d in pts:
            dt_s = (ts - prev) / 1000
            busy += min(cur, cpus) * dt_s
            idle += max(0, cpus - cur) * dt_s
            cur += d
            prev = ts
        print(
            f"\ncore-occupancy inside the task window: busy {busy:.0f} core·s, "
            f"idle {idle:.0f} core·s ({idle / cpus:.1f}s of all-core wall equivalent)"
        )

    print("\ntop stages by (wall - task_sum/cores) [scheduling/skew overhead]:")
    print("  all per-task columns are SUMS over the stage's tasks, seconds")
    srows = []
    for sid, s in stages.items():
        if s["start"] < t0_ms or not s["end"]:
            continue
        swall = (s["end"] - s["start"]) / 1000
        t = stage_tasks.get(sid, {})
        trun = t.get("run", 0) / 1000
        srows.append((swall - trun / cpus, swall, trun, s["tasks"], sid, t))
    srows.sort(key=lambda r: r[0], reverse=True)
    tot = {"launch_delay": 0.0, "sched": 0.0, "deser": 0.0, "gc": 0.0, "fetch": 0.0}
    for ovh, swall, trun, ntasks, sid, t in srows:
        if not t:
            continue
        launch_delay = max(0, t["launch0"] - stages[sid]["start"]) / 1000
        span = t["span"] / 1000
        sched = max(0.0, span - trun - t["deser"] / 1000 - t["rser"] / 1000)
        tot["launch_delay"] += launch_delay
        tot["sched"] += sched / max(1, cpus)
        tot["deser"] += t["deser"] / 1000 / max(1, cpus)
        tot["gc"] += t["gc"] / 1000 / max(1, cpus)
        tot["fetch"] += t["fetch"] / 1000 / max(1, cpus)
    print(f"  across ALL timed stages: submit→first-launch {tot['launch_delay']:.1f}s, "
          f"per-core: in-task-unattributed {tot['sched']:.1f}s, deser {tot['deser']:.1f}s, "
          f"gc {tot['gc']:.1f}s, fetch-wait {tot['fetch']:.1f}s")
    for ovh, swall, trun, ntasks, sid, t in srows[:20]:
        if not t:
            continue
        launch_delay = max(0, t["launch0"] - stages[sid]["start"]) / 1000
        tail_gap = max(0, stages[sid]["end"] - t["finishN"]) / 1000
        print(
            f"  ovh {ovh:6.2f}s wall {swall:6.2f}s tasks {ntasks:4d} "
            f"| launch_delay {launch_delay:5.2f} tail {tail_gap:5.2f} "
            f"| sums: run {trun:6.1f} deser {t['deser']/1000:5.2f} gc {t['gc']/1000:5.2f} "
            f"fetch {t['fetch']/1000:5.2f} span {t['span']/1000:6.1f} "
            f"spill {t.get('spill_disk', 0)/1e6:6.0f}MB"
        )
    print("\ntop stages by task run-time [where the busy core·s go]:")
    for ovh, swall, trun, ntasks, sid, t in sorted(
        srows, key=lambda r: r[2], reverse=True
    )[:12]:
        name = stages[sid]["name"].split("\n")[0][:90]
        print(f"  run {trun:7.1f}s wall {swall:6.2f}s tasks {ntasks:4d}  {name}")

    tot_spill = sum(t.get("spill_disk", 0) for t in stage_tasks.values())
    print(f"\ntotal disk bytes spilled across timed stages: {tot_spill/1e9:.2f} GB")
    # only stages inside the timed window (the warm run also shuffles)
    timed_sids = {s for j in timed_jobs for s in j["stages"]}
    tot_sw = sum(stage_tasks[s].get("shuf_w", 0) for s in timed_sids if s in stage_tasks)
    tot_sr = sum(stage_tasks[s].get("shuf_r", 0) for s in timed_sids if s in stage_tasks)
    print(f"total shuffle bytes in timed window: written {tot_sw/1e9:.3f} GB, read {tot_sr/1e9:.3f} GB")


if __name__ == "__main__":
    main()
