#!/usr/bin/env python
"""Characterize this host's parallel-scaling ceilings, independent of Spark.

Two microbenchmarks, both pinned with taskset to exactly N cores:

* compute  — sha256 over a 4 MB buffer per process (cache-resident ALU work)
* bandwidth — 64 MB numpy copy per process (streams far past LLC; the shape
  every columnar scan/shuffle stage has)

The N→4N efficiency of any measured Spark job is bounded by these numbers:
a virtualized host that tops out its memory system below the core count
cannot show linear scaling for data-streaming stages no matter how well the
job partitions. Emits a markdown block for BENCH/BASELINE.md.

Usage: python tools/machine_ceiling.py [seconds_per_point]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import os
import subprocess
import sys
import time

import numpy as np

SECS = (
    float(sys.argv[1])
    if len(sys.argv) > 1 and sys.argv[1] != "--child"
    else 6.0
)


def _hash_worker(_):
    buf = os.urandom(4 << 20)
    t_end = time.time() + SECS
    c = 0
    while time.time() < t_end:
        hashlib.sha256(buf).digest()
        c += 1
    return c


def _bw_worker(_):
    a = np.zeros(64 << 20, dtype=np.uint8)
    b = np.empty_like(a)
    t_end = time.time() + SECS
    n = 0
    while time.time() < t_end:
        np.copyto(b, a)
        n += 1
    return n * a.nbytes * 2  # read + write


def _probe_worker(_):
    # DRAM random-access (hash-join/aggregation probe shape): gather from a
    # 2 GB private table at random indices — LLC-defeating, latency-bound,
    # the memory pattern of Spark hash joins/aggs that streaming-copy
    # bandwidth cannot characterize
    table = np.arange(256 << 20, dtype=np.int64)  # 2 GB
    rng = np.random.RandomState(42)
    idx = rng.randint(0, table.size, size=8 << 20)
    t_end = time.time() + SECS
    n = 0
    while time.time() < t_end:
        table[idx].sum()
        n += idx.size
    return n  # probes


def _run_pinned(kind: str, n: int) -> float:
    """Re-exec under taskset so ALL pool workers inherit the pinned mask."""
    cmd = ["taskset", "-c", f"0-{n - 1}", sys.executable, os.path.abspath(__file__),
           "--child", kind, str(n), str(SECS)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])


def _child(kind: str, n: int) -> None:
    worker = {"hash": _hash_worker, "bw": _bw_worker, "probe": _probe_worker}[kind]
    with mp.Pool(n) as p:
        rs = p.map(worker, range(n))
    print(sum(rs) / SECS)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        global SECS
        SECS = float(sys.argv[4])
        _child(sys.argv[2], int(sys.argv[3]))
        return

    ns = [1, 2, 4, 8, 16, 32]
    lines = [
        "\n## Machine scaling ceilings (taskset-pinned microbenchmarks, no Spark)\n",
        "| procs | sha256 (ops/s) | copy bandwidth (GB/s) |",
        "|---|---|---|",
    ]
    hashes = {n: _run_pinned("hash", n) for n in ns}
    bws = {n: _run_pinned("bw", n) for n in ns}
    for n in ns:
        lines.append(f"| {n} | {hashes[n]:.0f} | {bws[n] / 1e9:.1f} |")
    lines.append("")
    for lo, hi in ((1, 4), (2, 8), (4, 16), (8, 32)):
        eff_h = (hashes[hi] / hashes[lo]) / 4
        eff_b = (bws[hi] / bws[lo]) / 4
        lines.append(
            f"- {lo}→{hi} cores: compute ceiling **{eff_h:.2f}**, "
            f"memory-bandwidth ceiling **{eff_b:.2f}**"
        )
    md = "\n".join(lines) + "\n"
    print(md)
    if "--append" in sys.argv:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, "BENCH", "BASELINE.md"), "a") as fh:
            fh.write(md)


if __name__ == "__main__":
    main()
