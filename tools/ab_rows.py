#!/usr/bin/env python
"""Back-to-back aggregate A/B of candidate ROWS_BY_TARGET changes.

Runs bench.bench_target (all-19-mode golden mix, chained-loop timing) for
each target twice in ONE process - shipped tile vs candidate tile - so the
comparison shares tunnel/chip conditions.  Per CLAUDE.md, this aggregate
A/B is the decider for retunes; single-mode sweeps sit inside tunnel noise.

    python tools/ab_rows.py bc7=128 astc=64 rgba=64 [--n 2097152]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench  # noqa: E402  (configures the jit cache)
from basisu_rs_tpu.ops import pallas_kernels as PK  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("changes", nargs="+", help="target=rows pairs")
    ap.add_argument("--n", type=int, default=1 << 21)
    args = ap.parse_args()

    blocks = bench.build_batch(args.n)

    def set_rows(target, rows):
        # rows_for_target reads the lru-cached _tuned_rows() snapshot, which
        # holds a REFERENCE to ROWS_BY_TARGET: mutate in place and clear the
        # cache, else the B run silently reuses the A tiles (the same stale-
        # cache failure the ETC1S retune note documents).
        PK.ROWS_BY_TARGET[target] = rows
        PK._tuned_rows.cache_clear()
        assert PK.rows_for_target(target) == rows, "retune did not take"

    for spec in args.changes:
        target, rows = spec.split("=")
        rows = int(rows)
        base_rows = PK.ROWS_BY_TARGET[target]
        bench.log(f"--- {target}: A rows={base_rows} vs B rows={rows}")
        a = bench.bench_target(target, blocks)
        set_rows(target, rows)
        b = bench.bench_target(target, blocks)
        set_rows(target, base_rows)
        print(
            f"{target}: rows {base_rows} -> {rows}: "
            f"{a/1e9:.1f} -> {b/1e9:.1f} Gtex/s ({(b/a-1)*100:+.1f}%)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
