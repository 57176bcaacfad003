"""Back-to-back same-session A/B of per-target kernel rates on the real TPU.

Usage:  python tools/ab_bench.py <ref_a> <ref_b> [targets...]
        (refs are git revisions; 'WT' means the working tree as-is)

Creates throwaway worktrees under .ab/ for non-WT refs, runs bench.py's
chained-loop measurement (BENCH_FAST per-target subsets) in one subprocess
per side, alternating A/B/A/B to average out tunnel drift, and reports
per-target medians + deltas.  Worktrees are removed afterwards.

Methodology note (CLAUDE.md): per-mode deltas sit inside tunnel noise;
trust back-to-back aggregates.  This driver alternates sides twice for the
same reason.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, sys
import numpy as np
import bench

targets = sys.argv[1:]
blocks = bench.build_batch(bench.N_BLOCKS)
out = {}
for t in targets:
    out[t] = bench.bench_target(t, blocks)
print("ABRESULT " + json.dumps(out))
"""


def run_side(workdir: Path, targets: list[str]) -> dict[str, float]:
    env = dict(os.environ, BENCH_NO_SUPERVISOR="1")
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, *targets],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
    raise RuntimeError(f"side {workdir} produced no result (rc={p.returncode})")


def main() -> None:
    ref_a, ref_b = sys.argv[1], sys.argv[2]
    targets = sys.argv[3:] or ["bc7", "etc1", "etc2"]
    rounds = int(os.environ.get("AB_ROUNDS", 2))

    dirs = {}
    made = []
    for ref in (ref_a, ref_b):
        if ref == "WT":
            dirs[ref] = REPO
        elif ref not in dirs:
            wt = REPO / ".ab" / ref
            if not wt.exists():
                subprocess.run(
                    ["git", "worktree", "add", "--detach", str(wt), ref],
                    cwd=REPO, check=True, capture_output=True,
                )
                made.append(wt)
            dirs[ref] = wt

    try:
        acc: dict[str, dict[str, list[float]]] = {ref_a: {}, ref_b: {}}
        for r in range(rounds):
            for ref in (ref_a, ref_b):
                res = run_side(dirs[ref], targets)
                for t, v in res.items():
                    acc[ref].setdefault(t, []).append(v)
                print(
                    f"round {r} {ref:>12}: "
                    + "  ".join(f"{t} {v/1e9:6.2f}" for t, v in res.items()),
                    flush=True,
                )
        print("\n=== medians (Gtex/s) ===")
        summary = {}
        for t in targets:
            a = sorted(acc[ref_a][t])[len(acc[ref_a][t]) // 2]
            b = sorted(acc[ref_b][t])[len(acc[ref_b][t]) // 2]
            summary[t] = {"a": a / 1e9, "b": b / 1e9, "delta_pct": (b / a - 1) * 100}
            print(f"{t:>6}: {a/1e9:6.2f} -> {b/1e9:6.2f}  ({(b/a-1)*100:+.1f}%)")
        print("ABSUMMARY " + json.dumps(summary))
    finally:
        for wt in made:
            subprocess.run(
                ["git", "worktree", "remove", "--force", str(wt)],
                cwd=REPO, capture_output=True,
            )


if __name__ == "__main__":
    main()
