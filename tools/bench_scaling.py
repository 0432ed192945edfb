"""Two-cluster-size scaling evidence (north rule): run the identical CPG
construction job on the same input at local[8] (N) and local[32] (4N),
report throughput at both and the scaling efficiency
(throughput_4N / throughput_N) / 4. Writes/updates BENCH.md.

Usage: python tools/bench_scaling.py [n_files]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    lo = run(8, n_files)
    hi = run(32, n_files)
    t_lo = lo["queries"]["cpg_build"]
    t_hi = hi["queries"]["cpg_build"]
    fps_lo, fps_hi = n_files / t_lo, n_files / t_hi
    eff = (fps_hi / fps_lo) / 4
    report = {
        "n_files": n_files,
        "local8": {"cpg_build_sec": t_lo, "files_per_sec": round(fps_lo, 2)},
        "local32": {"cpg_build_sec": t_hi, "files_per_sec": round(fps_hi, 2)},
        "speedup_8_to_32": round(fps_hi / fps_lo, 3),
        "scaling_efficiency": round(eff, 3),
        "nodes": hi["cpg_nodes"], "edges": hi["cpg_edges"],
    }
    print(json.dumps(report))
    md = f"""# BENCH — scaling evidence

Two-parallelism-level run of the identical CPG-construction job (parse →
base link → call graph → fused CFG/DDG) on the same {n_files}-file synthetic
skewed C corpus (FIXTURES.md §8), per the north rule's N vs 4N criterion
(sandbox has no multi-node cluster; parallelism levels stand in for executor
counts).

| config | cpg build (s) | files/sec |
|---|---|---|
| local[8]  (N)  | {t_lo:.1f} | {fps_lo:.1f} |
| local[32] (4N) | {t_hi:.1f} | {fps_hi:.1f} |

* speedup 8→32 cores: **{fps_hi / fps_lo:.2f}×** (ideal 4×)
* **scaling efficiency: {eff:.3f}** (target ≥ 0.8)
* output graph: {hi["cpg_nodes"]:,} nodes / {hi["cpg_edges"]:,} edges
* per-run JSON: see `BENCH_r*.json` (driver) and `bench.py`

Reproduce: `python tools/bench_scaling.py {n_files}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
