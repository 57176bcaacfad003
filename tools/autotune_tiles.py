#!/usr/bin/env python
"""Re-derive the per-target Pallas grid tiles (ops/pallas_kernels.ROWS_BY_TARGET)
on the attached hardware.

Sweeps row-tile candidates over a representative mode subset per target (and
the ETC1S kernel kinds, cached as etc1s_<kind>) using
bench.py's contention-robust chained-loop timing, prints a per-(target, mode)
table plus the per-target winner by aggregate time.  Run on new hardware (or
after major kernel changes) and update ROWS_BY_TARGET if the winners move:

    python tools/autotune_tiles.py [--rows 8,16,32,64] [--n 1048576]

Findings that produced the current table (v5e, 2026-08): 32-row tiles win on
every target, including BC7.  Per-mode 16-vs-32 sweeps for BC7 are noisy
(inside the shared-tunnel run-to-run drift), but the back-to-back full
aggregate A/B separates cleanly (61.9 @ 16 vs 66.0 @ 32 Gtex/s) — per
CLAUDE.md, trust the aggregate A/B over single-mode sweeps when retuning.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# heavy + light + multi-subset modes: enough spread to pick a tile
PROBE_MODES = {
    "bc7": (2, 3, 5, 9, 17),
    "rgba": (0, 9, 15),
    "astc": (0, 9),
    "etc1": (0, 9, 18),
    "etc2": (0, 9, 14, 18),
}

# ETC1S kernel kinds (ops/etc1s_pallas.ROWS_BY_KIND); cached under the
# "etc1s_<kind>" keys that rows_for_kind consults
ETC1S_KINDS = ("rgba", "alpha", "etc1", "rgba_alpha")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="16,32", help="comma-separated candidates")
    ap.add_argument("--n", type=int, default=1 << 21, help="batch size in blocks")
    ap.add_argument(
        "--targets",
        default=",".join(PROBE_MODES) + ","
        + ",".join(f"etc1s_{k}" for k in ETC1S_KINDS),
    )
    ap.add_argument(
        "--write", action="store_true",
        help="persist the winning tiles to .jax_cache/tiles_<device-kind>.json "
        "(ops.pallas_kernels.rows_for_target consults it on non-default hardware)",
    )
    args = ap.parse_args()
    candidates = [int(r) for r in args.rows.split(",")]

    import bench
    from basisu_rs_tpu.ops.bits import lanes_from_bytes_np
    from basisu_rs_tpu.ops.dispatch import block_modes
    from basisu_rs_tpu.ops.pallas_kernels import LANE, _pallas_build

    blocks = bench.build_batch(args.n)
    modes = block_modes(blocks)
    lanes = lanes_from_bytes_np(blocks, 4)

    def rate(target, mode_id, rows):
        idx = np.nonzero(modes == mode_id)[0]
        n = len(idx)
        build, tables, _ = _pallas_build(target, mode_id, rows)
        tile = rows * LANE
        n_pad = ((n + tile - 1) // tile) * tile
        import jax.numpy as jnp
        from functools import partial

        xp = jnp.zeros((n_pad, 4), jnp.uint32).at[:n].set(jnp.asarray(lanes[idx]))
        call = build(n_pad // LANE)

        @partial(jax.jit, static_argnums=1)
        def chained(x, reps):
            def body(i, c):
                planes = [(x[:, w] ^ c).reshape(n_pad // LANE, LANE) for w in range(4)]
                return call(*planes, *tables)[0][0, 0]

            return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

        per = bench._measure_chained(chained, xp)
        return n_pad / per

    def rate_etc1s(kind, rows, e=2048, s=2048):
        import jax.numpy as jnp
        from functools import partial

        import basisu_rs_tpu.ops.etc1s_pallas as EP
        from basisu_rs_tpu.ops import bits
        from basisu_rs_tpu.ops.etc1s import selector_wire_words_np

        EP.ROWS_BY_KIND = {**EP.ROWS_BY_KIND, kind: rows}
        EP._build.cache_clear()
        rng = np.random.default_rng(5)
        endpoints = np.zeros((e, 4), np.uint8)
        endpoints[:, :3] = rng.integers(0, 32, (e, 3))
        endpoints[:, 3] = rng.integers(0, 8, e)
        selectors = rng.integers(0, 256, (s, 4)).astype(np.uint8)
        ep_tab = jnp.asarray(EP.pack_endpoints_np(endpoints))
        tab = jnp.asarray(
            EP.pack_wire_np(selector_wire_words_np(selectors)) if kind == "etc1"
            else EP.pack_selectors_np(selectors)
        )
        mods = jnp.asarray(bits.pad_table_for_kernel(EP._packed_mods_np()))
        tile = rows * EP.LANE
        n_pad = ((args.n + tile - 1) // tile) * tile
        n_idx = EP.N_IDX[kind]
        idxs = [
            jnp.asarray(np.resize(rng.integers(0, e, args.n).astype(np.int32), n_pad)
                        .reshape(-1, EP.LANE))
            for _ in range(n_idx)
        ]
        call = EP._build(kind, ep_tab.shape[0], tab.shape[0], n_pad // EP.LANE, False)

        @partial(jax.jit, static_argnums=1)
        def chained(x, reps):
            def body(i, c):
                outs = call(ep_tab, tab, x ^ (c & 1023), *idxs[1:], mods)
                return outs[0][0, 0].astype(jnp.int32)

            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        per = bench._measure_chained(lambda x, reps: chained(x, reps), idxs[0])
        return n_pad / per

    winners = {}
    for target in args.targets.split(","):
        if target.startswith("etc1s_"):
            kind = target[len("etc1s_"):]
            line = [f"{target}:"]
            best_r, best = None, 0.0
            for rows in candidates:
                r = rate_etc1s(kind, rows)
                line.append(f"rows {rows}: {r/1e6:7.1f} Mblk/s")
                if r > best:
                    best_r, best = rows, r
            winners[target] = best_r
            print("  ".join(line) + f"  ==> {best_r}", flush=True)
            continue
        # Weight each mode's seconds-per-block by its block count in the probe
        # batch, so the aggregate reflects the corpus mode mix rather than
        # over-weighting rare modes.
        totals = {r: 0.0 for r in candidates}
        n_total = 0
        for mode_id in PROBE_MODES[target]:
            n_mode = int((modes == mode_id).sum())
            n_total += n_mode
            line = [f"{target} mode {mode_id:2d}:"]
            for rows in candidates:
                r = rate(target, mode_id, rows)
                totals[rows] += n_mode / r  # seconds for this mode's share
                line.append(f"rows {rows}: {r/1e6:7.1f} Mblk/s")
            print("  ".join(line), flush=True)
        best = min(totals, key=totals.get)
        winners[target] = best
        print(f"==> {target}: best tile {best} rows, probe-mix-weighted "
              f"({'; '.join(f'{r}: {totals[r]/n_total*1e9:.3f}ns/blk' for r in candidates)})",
              flush=True)

    if args.write:
        import json

        from basisu_rs_tpu.ops.pallas_kernels import tile_cache_path

        path = tile_cache_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(winners, indent=1))
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
