"""Two-cluster-size scaling evidence (north rule): run the identical CPG
construction job on the same input at local[N] and local[4N], report
throughput at both and the scaling efficiency
(throughput_4N / throughput_N) / 4. Writes/updates BENCH.md.

The sandbox is a virtualized 32-core guest whose deliverable CPU drifts with
host load (measured 3x swings in a single-process busy-loop calibration).
Single-shot timings at two parallelism levels can therefore invert purely
from host noise. Mitigation: runs ALTERNATE between the two configs, each
config keeps its fastest sample (least-contended), and a one-process
calibration burn is recorded next to every sample so drift is visible in the
report.

Usage: python tools/bench_scaling.py [n_files] [rounds] [N_lo] [N_hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def calibrate() -> float:
    """Single-process busy-loop units/sec — a host-speed yardstick."""
    t0 = time.time()
    x = 0
    n = 0
    while time.time() - t0 < 1.5:
        for i in range(100000):
            x += i * i
        n += 1
    return round(n / (time.time() - t0), 1)


def run(cpus: int, n_files: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "BENCH_FILES": str(n_files),
        "BENCH_CPG_ONLY": "1",
    })
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 24000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * n_lo

    samples: dict[int, list[dict]] = {n_lo: [], n_hi: []}
    for r in range(rounds):
        for cpus in (n_hi, n_lo) if r % 2 == 0 else (n_lo, n_hi):
            cal = calibrate()
            res = run(cpus, n_files)
            res["calibration_units_per_sec"] = cal
            samples[cpus].append(res)
            print(json.dumps({"round": r, "cpus": cpus, "cal": cal,
                              "cpg_build": res["queries"]["cpg_build"]}),
                  flush=True)

    best = {c: min(s, key=lambda x: x["queries"]["cpg_build"])
            for c, s in samples.items()}
    t_lo = best[n_lo]["queries"]["cpg_build"]
    t_hi = best[n_hi]["queries"]["cpg_build"]
    fps_lo, fps_hi = n_files / t_lo, n_files / t_hi
    eff = (fps_hi / fps_lo) / (n_hi / n_lo)
    report = {
        "n_files": n_files,
        "rounds": rounds,
        f"local{n_lo}": {"cpg_build_sec": t_lo, "files_per_sec": round(fps_lo, 2),
                         "all_sec": [s["queries"]["cpg_build"] for s in samples[n_lo]],
                         "cal": [s["calibration_units_per_sec"] for s in samples[n_lo]]},
        f"local{n_hi}": {"cpg_build_sec": t_hi, "files_per_sec": round(fps_hi, 2),
                         "all_sec": [s["queries"]["cpg_build"] for s in samples[n_hi]],
                         "cal": [s["calibration_units_per_sec"] for s in samples[n_hi]]},
        f"speedup_{n_lo}_to_{n_hi}": round(fps_hi / fps_lo, 3),
        "scaling_efficiency": round(eff, 3),
        "nodes": best[n_hi]["cpg_nodes"], "edges": best[n_hi]["cpg_edges"],
    }
    print(json.dumps(report))

    lo_rows = "\n".join(
        f"| local[{n_lo}] r{i} | {s['queries']['cpg_build']:.1f} | "
        f"{n_files / s['queries']['cpg_build']:.1f} | {s['calibration_units_per_sec']} |"
        for i, s in enumerate(samples[n_lo]))
    hi_rows = "\n".join(
        f"| local[{n_hi}] r{i} | {s['queries']['cpg_build']:.1f} | "
        f"{n_files / s['queries']['cpg_build']:.1f} | {s['calibration_units_per_sec']} |"
        for i, s in enumerate(samples[n_hi]))
    md = f"""# BENCH — scaling evidence

Two-parallelism-level run of the identical CPG-construction job (parse →
base link → call graph → fused CFG/DDG) on the same {n_files}-file synthetic
skewed C corpus (FIXTURES.md §8), per the north rule's N vs 4N criterion
(sandbox has no multi-node cluster; parallelism levels stand in for executor
counts; N = {n_lo}).

The guest's deliverable CPU drifts with host load (the calibration column is
a single-process busy-loop, units/sec — higher = faster host at that
moment). Runs alternate configs and each config scores its fastest sample.

| run | cpg build (s) | files/sec | host calibration |
|---|---|---|---|
{lo_rows}
{hi_rows}

* best local[{n_lo}]: {t_lo:.1f}s ({fps_lo:.1f} files/sec)
* best local[{n_hi}]: {t_hi:.1f}s ({fps_hi:.1f} files/sec)
* speedup {n_lo}→{n_hi} cores: **{fps_hi / fps_lo:.2f}×** (ideal {n_hi // n_lo}×)
* **scaling efficiency: {eff:.3f}** (target ≥ 0.8)
* output graph: {best[n_hi]["cpg_nodes"]:,} nodes / {best[n_hi]["cpg_edges"]:,} edges
* per-run JSON: see `BENCH_r*.json` (driver) and `bench.py`

Reproduce: `python tools/bench_scaling.py {n_files} {rounds} {n_lo} {n_hi}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
