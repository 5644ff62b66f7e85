#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol).

Runs bench.py twice in fresh JVMs — local[8] (N) and local[32] (4N) — on the
identical input, then reports throughput at both plus scaling efficiency
  eff = (T_8 / T_32) / 4
into BENCH/BASELINE.md. The synthetic corpus is a pure function of its
parameters (no RNG state, no partition-order dependence), so both runs
resolve byte-identical inputs.

Usage: python bench/scaling.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        PYTHONPATH=REPO,
        # larger corpus than the per-round bench: the scaling claim needs
        # compute-bound stages, not fixed per-job scheduling latency
        # (450k convs at sf0.1 → the fixed inter-job floor is <15% of the
        # 4-core legs and <4% of the 1-core legs)
        SPARK_GRAFT_CONV_MULT=os.environ.get("SPARK_GRAFT_CONV_MULT", "30"),
        # 1/3-size untimed warm pass: full-size warm would double the pinned
        # 1-core legs; 1/3 is large enough that AQE makes the same plan
        # choices, so the timed runs' codegen fragments are already compiled
        SPARK_GRAFT_WARM_FRAC=os.environ.get("SPARK_GRAFT_WARM_FRAC", "0.34"),
        # identical heap at both parallelism levels (GC capacity is part of
        # the machine, not the parallelism knob under test)
        SPARK_DRIVER_MEMORY=os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        # only the e2e pipelines scale with the corpus; the sf0.1 operator
        # rows are fixed-overhead-dominated and just stretch the pinned
        # low-core legs (see bench.py)
        SPARK_GRAFT_E2E_ONLY=os.environ.get("SPARK_GRAFT_E2E_ONLY", "1"),
        # this harness interleaves its own repeats across fresh JVMs (the
        # stronger protocol); bench.py's internal min-of-3 would triple the
        # pinned legs for no added signal
        SPARK_GRAFT_BENCH_REPS=os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"),
    )
    # Pin the JVM to exactly `cpus` physical cores: without pinning the
    # local[8] run still borrows the other 24 cores for GC/JIT/shuffle-IO
    # threads, overstating the small-cluster baseline and understating the
    # N→4N ratio. A 4N-executor cluster really has 4× the cores.
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    for line in out.stdout.splitlines():
        line = line.strip()
        if "{" in line:
            return json.loads(line[line.index("{"):])
    raise RuntimeError(f"no JSON line in bench output:\n{out.stdout}\n{out.stderr}")


def _min_combine(runs: list[dict]) -> dict:
    """Min over repeats — the noise-robust estimator on a VM with hypervisor
    CPU steal (single-shot timings here vary ±40%)."""
    best = dict(min(runs, key=lambda r: r["value"]))  # copy: runs are dumped raw
    best["queries"] = {
        k: min(r["queries"][k] for r in runs) for k in best["queries"]
    }
    best["value"] = round(sum(best["queries"].values()), 3)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # default pair 1→4: BENCH/BASELINE.md's taskset microbenchmarks show this
    # host's memory bandwidth scales linearly only up to ~4 streams and
    # saturates by 8 (2→8 bw ceiling 0.74, 1→4 ≈ 1.0) — so 1→4 is the one
    # 4×-cores window in which the hardware itself can express a 4× speedup,
    # i.e. where measured efficiency reflects plan shape rather than the
    # single shared memory bus (which real N→4N clusters don't share).
    lo = int(os.environ.get("SPARK_GRAFT_N_LO", "1"))
    hi = int(os.environ.get("SPARK_GRAFT_N_HI", "4"))
    factor = hi / lo
    # raw per-leg evidence next to the analysis (min-combined + every rep),
    # rewritten after every rep so an interrupted run still leaves evidence
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)

    tag = os.environ.get("SPARK_GRAFT_SCALING_TAG", "")

    def dump_raw(runs_lo: list, runs_hi: list) -> None:
        for name, runs in (
            (f"scaling_{tag}local{lo}.json", runs_lo),
            (f"scaling_{tag}local{hi}.json", runs_hi),
        ):
            if not runs:
                continue
            with open(os.path.join(REPO, "BENCH", name), "w") as fh:
                json.dump(
                    {"min_combined": _min_combine(list(runs)), "repeats": runs},
                    fh,
                    indent=1,
                )

    # interleaved legs: drifting hypervisor noise hits both levels equally
    runs_lo, runs_hi = [], []
    for i in range(repeats):
        runs_lo.append(run_bench(sf_dir, lo))
        print(f"rep {i} local[{lo}]: {json.dumps(runs_lo[-1])}", flush=True)
        dump_raw(runs_lo, runs_hi)
        runs_hi.append(run_bench(sf_dir, hi))
        print(f"rep {i} local[{hi}]: {json.dumps(runs_hi[-1])}", flush=True)
        dump_raw(runs_lo, runs_hi)
    r8 = _min_combine(runs_lo)
    r32 = _min_combine(runs_hi)

    t8, t32 = r8["value"], r32["value"]
    e8, e32 = r8["queries"]["identity_e2e"], r32["queries"]["identity_e2e"]
    s8 = r8["queries"].get("identity_e2e_sim")
    s32 = r32["queries"].get("identity_e2e_sim")
    eff_total = (t8 / t32) / factor
    eff_e2e = (e8 / e32) / factor
    eff_sim = (s8 / s32) / factor if s8 and s32 else None
    sim_line = (
        f"- scaling efficiency (identity_e2e_sim — the FULL north-rule pipeline "
        f"with the MinHash-LSH + Jaro-Winkler pairwise-scoring stage): "
        f"**{eff_sim:.3f}**\n" if eff_sim else ""
    )
    md = f"""# BENCH — scaling evidence ({dt.datetime.now():%Y-%m-%d %H:%M})

Protocol (BASELINE.md): identical input at two parallelism levels in fresh
JVMs, pinned with taskset to exactly N cores, interleaved min-of-{repeats};
sandbox proxy for N vs {factor:.0f}N executors. Identical plan at both legs
(fixed shuffle partitioning, fixed heap) — only the core count changes.

| config | headline total (s) | identity_e2e (s) | identity_e2e_sim (s) | pairs/s | rows/s |
|---|---|---|---|---|---|
| local[{lo}]  (N)  | {t8} | {e8} | {s8} | {r8["pairs_per_sec"]} | {r8["rows_per_sec"]} |
| local[{hi}] ({factor:.0f}N) | {t32} | {e32} | {s32} | {r32["pairs_per_sec"]} | {r32["rows_per_sec"]} |

- input: `{sf_dir}` + synthetic transcript corpus ({r8["turns"]} conversations,
  pure function of parameters — identical at both parallelism levels)
- scaling efficiency (headline total): **{eff_total:.3f}**
- scaling efficiency (identity_e2e, exact mode): **{eff_e2e:.3f}**
{sim_line}- per-query seconds at local[{lo}]: `{json.dumps(r8["queries"])}`
- per-query seconds at local[{hi}]: `{json.dumps(r32["queries"])}`

Note: local-mode scaling under-states cluster scaling for the CC driver loop
(fixed per-iteration JVM scheduling latency dominates at small data); the
shuffle-bound stages (blocking, dedup, scoring) are the ones that grow with
data volume and they partition linearly.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # BASELINE.md is hand-curated analysis; the raw auto-summary goes to its
    # own file so a detached run can never clobber the acceptance narrative
    # (it did once, round 5 — the round-4 header had to be restored from git).
    out_file = os.path.join(REPO, "BENCH", f"scaling_{tag}last_run.md")
    with open(out_file, "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
