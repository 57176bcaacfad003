#!/usr/bin/env python
"""Throughput benchmark: aggregate UASTC->BC7 on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mtexels/s", "vs_baseline": N}

vs_baseline is against the BASELINE.json north star of 5 Gtexels/s aggregate
UASTC->BC7 on a v5e-8, scaled to the locally attached chip count (1.0 means
on-track for the 8-chip target; the workload is embarrassingly data-parallel,
so per-chip rates compose linearly across a mesh).

Methodology mirrors the reference's criterion harness (benches/benchmark.rs):
the workload is the golden block corpus - a realistic all-19-mode mix - tiled
to a large batch.  Headline number = steady-state device throughput of the
mode-partitioned kernels (inputs resident in HBM, outputs materialized,
block_until_ready between iterations).  End-to-end (host partition + H2D +
D2H) is reported on stderr.  BENCH_ALL=1 additionally benches the other four
targets.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(Path(__file__).parent / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import numpy as np

import jax
import jax.numpy as jnp

from basisu_rs_tpu.ops.bits import lanes_from_bytes_np
from basisu_rs_tpu.ops.dispatch import _mode_kernel, block_modes, transcode_blocks

FIXTURE = Path(__file__).parent / "tests" / "fixtures" / "golden_blocks.npz"
TARGET_GTEXELS_V5E8 = 5.0e9  # BASELINE.json north star, 8 chips
N_BLOCKS = int(os.environ.get("BENCH_N", 1 << 22))  # 4M blocks = 64 MiB in, 67M texels


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_batch(n_blocks: int) -> np.ndarray:
    blocks = np.load(FIXTURE)["bc7_in"]
    reps = -(-n_blocks // len(blocks))
    return np.tile(blocks, (reps, 1))[:n_blocks]


def bench_device_only(blocks: np.ndarray, target: str, iters: int = 10) -> float:
    """Steady-state rate with device-resident inputs.  Returns texels/sec."""
    modes = block_modes(blocks)
    lanes = lanes_from_bytes_np(blocks, 4)
    groups = []
    for mode_id in np.unique(modes):
        if mode_id == 19:
            continue
        idx = np.nonzero(modes == mode_id)[0]
        groups.append((int(mode_id), jax.device_put(jnp.asarray(lanes[idx]))))

    def run_all():
        outs = [_mode_kernel(target, m)(g) for m, g in groups]
        jax.block_until_ready(outs)

    run_all()  # compile
    run_all()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        run_all()
    dt = (time.perf_counter() - t0) / iters
    return blocks.shape[0] * 16 / dt


def bench_end_to_end(blocks: np.ndarray, target: str, iters: int = 3) -> float:
    transcode_blocks(blocks, target)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        transcode_blocks(blocks, target)
    dt = (time.perf_counter() - t0) / iters
    return blocks.shape[0] * 16 / dt


def main() -> None:
    n_chips = len(jax.devices())
    log(f"devices: {[str(d) for d in jax.devices()]}, N={N_BLOCKS} blocks")
    blocks = build_batch(N_BLOCKS)

    rate_dev = bench_device_only(blocks, "bc7")
    log(f"UASTC->BC7 device-only: {rate_dev/1e9:.2f} Gtexels/s")
    if os.environ.get("BENCH_E2E"):
        # NB: under the axon tunnel D2H is ~0.3 MB/s (measured), so this
        # number reflects the tunnel, not the pipeline; on host-attached
        # TPUs D2H runs at PCIe rates.
        rate_e2e = bench_end_to_end(blocks, "bc7")
        log(f"UASTC->BC7 end-to-end:  {rate_e2e/1e9:.2f} Gtexels/s")

    if os.environ.get("BENCH_ALL"):
        for target in ("rgba", "astc", "etc1", "etc2"):
            r = bench_device_only(blocks, target, iters=5)
            log(f"UASTC->{target.upper()} device-only: {r/1e9:.2f} Gtexels/s")

    per_chip_target = TARGET_GTEXELS_V5E8 / 8
    print(
        json.dumps(
            {
                "metric": "UASTC->BC7 aggregate transcode throughput (device-resident)",
                "value": round(rate_dev / 1e6, 1),
                "unit": "Mtexels/s",
                "vs_baseline": round(rate_dev / (per_chip_target * n_chips), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
