"""Two-parallelism scaling evidence (BASELINE.json north rule).

No real cluster exists in the sandbox, so per the driver instruction the
N -> 4N executor criterion is evidenced by running the SAME job on the
SAME input at local[8] and local[32] and reporting throughput at both
plus scaling efficiency = T8 / T32 / 4 ... i.e.
    efficiency = (throughput at 32 cores) / (4 * throughput at 8 cores)

Each level runs `bench.py` in a fresh subprocess (own JVM) so JIT/session
state cannot leak between levels. Writes BENCH/BASELINE.md.

Usage:  python3 scripts/scaling_bench.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
LEVELS = (8, 32)


def run_level(cpus: int) -> dict:
    best: dict | None = None
    for _ in range(REPEATS):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        r = json.loads(line)
        if best is None or r["value"] < best["value"]:
            best = r
    return best


def main() -> None:
    results = {}
    for cpus in LEVELS:
        t0 = time.time()
        results[cpus] = run_level(cpus)
        print(f"local[{cpus}]: {results[cpus]['value']}s total "
              f"({time.time()-t0:.0f}s incl. startup)", file=sys.stderr)

    n, n4 = LEVELS
    r8, r32 = results[n], results[n4]
    assign_tp8 = r8["tile_assignments_per_sec"]
    assign_tp32 = r32["tile_assignments_per_sec"]
    eff_assign = assign_tp32 / (4.0 * assign_tp8)
    # suite-level efficiency from total wall time
    eff_suite = (1.0 / r32["value"]) / (4.0 / r8["value"])

    lines = []
    lines.append("# BENCH/BASELINE — measured throughput + scaling evidence\n")
    lines.append(f"Input: `{SF_DIR}` (same parquet for both levels); best of {REPEATS} runs;")
    lines.append("fresh JVM per level via subprocess. Sandbox proxy for N vs 4N executors")
    lines.append("per the driver instruction (no real cluster available).\n")
    lines.append("| metric | local[8] | local[32] | scale 8->32 | efficiency (x/4) |")
    lines.append("|---|---|---|---|---|")
    lines.append(
        f"| tile-assignments/sec (z0-24) | {assign_tp8:,} | {assign_tp32:,} | "
        f"{assign_tp32/assign_tp8:.2f}x | **{eff_assign:.2f}** |"
    )
    pip8 = r8["pip_join_rows_per_sec"]
    pip32 = r32["pip_join_rows_per_sec"]
    lines.append(
        f"| PIP-join rows/sec | {pip8:,} | {pip32:,} | {pip32/pip8:.2f}x | "
        f"{pip32/(4.0*pip8):.2f} |"
    )
    lines.append(
        f"| headline suite total (sec, lower=better) | {r8['value']} | {r32['value']} | "
        f"{r8['value']/r32['value']:.2f}x | {eff_suite:.2f} |"
    )
    lines.append("\nPer-query seconds:\n")
    lines.append("| query | local[8] | local[32] |")
    lines.append("|---|---|---|")
    for k in r8["queries"]:
        lines.append(f"| {k} | {r8['queries'][k]} | {r32['queries'][k]} |")
    lines.append("")
    lines.append("Gate (BASELINE.md): throughput scaling efficiency >= 0.8 from N to 4N.")
    lines.append(f"Measured headline (tile assignment) efficiency: **{eff_assign:.2f}**.")
    lines.append("")
    lines.append("Caveats: local-mode levels share one machine; 8-thread runs get more")
    lines.append("memory bandwidth per core, so x/4 understates true multi-node scaling")
    lines.append("of this embarrassingly parallel plan (zero shuffles before the sink).")
    lines.append("")
    lines.append("Raw JSON:\n")
    lines.append("```json")
    lines.append(json.dumps({"local8": r8, "local32": r32}, indent=2))
    lines.append("```")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({
        "efficiency_assign": round(eff_assign, 3),
        "efficiency_suite": round(eff_suite, 3),
        "assign_tp8": assign_tp8, "assign_tp32": assign_tp32,
    }))


if __name__ == "__main__":
    main()
