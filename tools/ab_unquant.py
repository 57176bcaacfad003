#!/usr/bin/env python
"""Interleaved A/B: unquant LUT vs old scatter/mul/xor dequant chain."""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from basisu_rs_tpu.ops import uastc_decode as ud
from basisu_rs_tpu.ops.bits import lanes_from_bytes_np
from basisu_rs_tpu.ops.dispatch import block_modes
from basisu_rs_tpu.tables import BISE_RANGES, MODES

from ab_weights import build_timer, xor_all  # noqa: E402


def old_unquant(trit_quint, bits, range_index):
    rng = BISE_RANGES[range_index]
    if rng.trits == 0 and rng.quints == 0 and rng.bits > 0:
        val = jnp.zeros_like(bits)
        sh = 8 - rng.bits
        while sh > -rng.bits:
            val = val | (bits << sh if sh >= 0 else bits >> -sh)
            sh -= rng.bits
        return val & 0xFF
    a = (bits & 1) * 511
    b = jnp.zeros_like(bits)
    for out_bit, in_bit in rng.scatter_pairs:
        b = b | (((bits >> in_bit) & 1) << out_bit)
    val = (trit_quint * rng.deq_c + b) ^ a
    return (a & 0x80) | (val >> 2)


def main():
    from basisu_rs_tpu.ops import bc7 as bc7_mod

    modes = [int(m) for m in sys.argv[1:]] or [3, 7, 4, 12]
    fix = np.load(Path(__file__).parent.parent / "tests/fixtures/golden_blocks.npz")
    blocks = np.tile(fix["bc7_in"], (1 << 12, 1))
    all_modes = block_modes(blocks)

    for mode_id in modes:
        cfg = MODES[mode_id]
        idx = np.nonzero(all_modes == mode_id)[0]
        lanes = lanes_from_bytes_np(blocks[idx], 4)

        def full(lanes, cfg=cfg):
            words, err = bc7_mod.uastc_to_bc7_mode(cfg, lanes)
            return xor_all(words) ^ err.astype(jnp.uint32)

        sample_new, n_pad = build_timer(full, lanes)
        orig = ud.unquant_endpoint
        ud.unquant_endpoint = old_unquant
        try:
            sample_old, _ = build_timer(full, lanes)
        finally:
            ud.unquant_endpoint = orig

        news, olds = [], []
        for _ in range(7):
            news.append(sample_new())
            olds.append(sample_old())
        mn, mo = min(news), min(olds)
        print(
            f"mode {mode_id}: new {n_pad/mn/1e6:7.1f} Mblk/s  old {n_pad/mo/1e6:7.1f} Mblk/s"
            f"  speedup x{mo/mn:.3f}"
        )


if __name__ == "__main__":
    main()
