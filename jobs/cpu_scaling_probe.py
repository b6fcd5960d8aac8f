"""Hardware parallel-scaling ceiling of THIS sandbox, without Spark.

The north_rule's two-cluster-size criterion presumes hardware whose
aggregate throughput grows with worker count. Rounds 2-4 measured
engine-side 8->32 efficiencies of 0.23-0.51 even in probe-certified
clean windows, with the postings stage *anti-scaling* (41.4 s @8 ->
45.7 s @32 on identical input). Before attributing that to the engine,
this probe measures what the guest ITSELF does when P independent
processes each run fixed work with zero coordination, zero shared
state, and zero Spark:

- ``stream``  — NumPy triad over 128 MB/process: DRAM-bandwidth-bound.
- ``sort``    — repeated 2M-element sorts: mixed bandwidth/compute
  (same kernel as the stage_scaling host-phase probe).
- ``compute`` — 256x256 matmul chain, fits in L2: pure CPU, no DRAM.

Perfect scaling means wall time is FLAT as P grows (fixed work per
process). efficiency(lo->hi) = wall@lo / wall@hi. If even ``compute``
fails to hold wall time at P=32, the guest does not have 32 vCPUs of
real capacity (host oversubscription); if ``compute`` scales but
``stream`` doesn't, the DRAM path saturates below 32 workers and any
memory-bound Spark stage inherits that ceiling. Either way the number
is the sandbox's ceiling, and engine efficiency should be read
RELATIVE to it — a real 1000-executor cluster adds memory channels
with every node, which no local[N] level change can emulate.

Workers pre-fault their arrays before the start barrier, so the
round-3 degraded-fault-path pathology is excluded by construction;
the stage_scaling cpu_probe brackets every cell as usual.

    python jobs/cpu_scaling_probe.py [--levels 1,2,4,8,16,32] [--reps 3]

Writes BENCH/cpu_ceiling_latest.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "jobs"))

from stage_scaling import PHASE_FACTOR, cpu_probe  # noqa: E402

KERNELS = ("stream", "sort", "compute")


def _worker(kind: str, ready, go, out_q) -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    if kind == "stream":
        a = rng.standard_normal(8_000_000)
        b = rng.standard_normal(8_000_000)

        def work() -> float:
            acc = 0.0
            for _ in range(12):
                c = a * 2.0 + b
                acc += float(c[-1])
            return acc

    elif kind == "sort":
        base = rng.standard_normal(2_000_000)

        def work() -> float:
            x = base
            for _ in range(8):
                x = np.sort(x)[::-1].copy()
            return float(x[0])

    else:  # compute: in-cache matmul chain

        def work() -> float:
            m = rng.standard_normal((256, 256))
            x = m
            for _ in range(600):
                x = m @ m
            return float(x[0, 0])

    # single-threaded BLAS inside each worker — P is the only
    # parallelism knob (set before numpy import in child would be
    # ideal; OPENBLAS vars are honored at first-use on this build)
    work()  # warm: pre-fault every array, JIT any lazy init
    ready.release()
    go.wait()
    t0 = time.monotonic()
    work()
    out_q.put(time.monotonic() - t0)


def run_cell(kind: str, procs: int) -> float:
    """Max per-worker wall across P concurrent workers (fixed work
    per worker; flat-vs-P means perfect scaling)."""
    ctx = mp.get_context("fork")
    ready = ctx.Semaphore(0)
    go = ctx.Event()
    out_q = ctx.Queue()
    ps = [
        ctx.Process(target=_worker, args=(kind, ready, go, out_q))
        for _ in range(procs)
    ]
    for p in ps:
        p.start()
    for _ in ps:
        ready.acquire()
    go.set()
    walls = [out_q.get() for _ in ps]
    for p in ps:
        p.join()
    return max(walls)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")

    base = min(cpu_probe() for _ in range(3))
    results: dict[str, dict] = {}
    for kind in KERNELS:
        per_level: dict[str, dict] = {}
        for procs in levels:
            pre = cpu_probe()
            walls = [round(run_cell(kind, procs), 3) for _ in range(args.reps)]
            post = cpu_probe()
            base = min(base, pre, post)
            per_level[str(procs)] = {
                "min_sec": min(walls),
                "all": walls,
                "probes": [round(pre, 3), round(post, 3)],
            }
            sys.stderr.write(
                f"[cpu-ceiling] {kind}@{procs}: {walls} "
                f"probes {pre:.2f}/{post:.2f}\n"
            )
        pairs = {}
        for lo in levels:
            hi = lo * 4
            if str(lo) in per_level and str(hi) in per_level:
                eff = per_level[str(lo)]["min_sec"] / per_level[str(hi)]["min_sec"]
                pairs[f"{lo}->{hi}"] = round(eff, 3)
        results[kind] = {"levels": per_level, "pairs_efficiency": pairs}

    # retro-tag cleanliness against the campaign-wide min probe
    for kind in results:
        for cell in results[kind]["levels"].values():
            cell["phase_clean"] = all(
                p <= PHASE_FACTOR * base for p in cell["probes"]
            )

    report = {
        "generated_utc": datetime.now(timezone.utc).isoformat(),
        "probe_base_sec": round(base, 3),
        "levels": levels,
        "reps": args.reps,
        "kernels": results,
        "note": (
            "fixed work per process; perfect scaling = flat wall vs P; "
            "efficiency(lo->hi) = wall@lo / wall@hi"
        ),
    }
    out = os.path.join(REPO, "BENCH", "cpu_ceiling_latest.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out + ".tmp", "w") as f:
        json.dump(report, f, indent=1)
    os.replace(out + ".tmp", out)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
