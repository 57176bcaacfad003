#!/usr/bin/env python
"""Interleaved A/B: new static-window weight decode vs old extract_dyn path,
same process, alternating samples (the tunnel's run-to-run drift makes
separate-run comparisons meaningless)."""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from basisu_rs_tpu.ops import bits, uastc_decode as ud
from basisu_rs_tpu.ops.bits import U32, extract_dyn, lanes_from_bytes_np, mask
from basisu_rs_tpu.ops.dispatch import block_modes
from basisu_rs_tpu.tables import MODES

from ablate_bc7 import ROWS, LANE, build_stage_kernel, xor_all  # noqa: E402

I32 = jnp.int32


def old_decode_weights(cfg, lanes, pat):
    """The pre-window implementation (extract_dyn per texel)."""
    wb = cfg.weight_bits
    planes = cfg.plane_count
    base = cfg.field_offsets["weights"]
    anchors = ud.decode_anchors(cfg, pat)
    from basisu_rs_tpu.tables import fam_anchor_mask, fam_weight_offsets_packed, get_family

    fam = get_family(cfg)
    amask = bits.lut_lookup(fam_anchor_mask(fam.name), pat)
    offs_words = [
        bits.lut_lookup(fam_weight_offsets_packed(fam.name, wb, planes)[:, k], pat)
        for k in range(4)
    ]
    weights = []
    max_anchors = len(anchors)
    for i in range(16):
        ia = (amask >> i) & 1
        bits_i = wb - ia
        texel_ofs = base + ((offs_words[i // 4] >> (8 * (i % 4))) & 0xFF)
        wmask = (U32(mask(wb)) >> ia.astype(U32)).astype(I32)
        ofs_min = base + planes * (wb * i) - planes * min(i, max_anchors)
        for p in range(planes):
            ofs = texel_ofs + p * bits_i
            ofs_max = base + planes * (wb * i) + p * wb
            raw = extract_dyn(lanes, ofs, wb, bit_range=(ofs_min, ofs_max)).astype(I32)
            weights.append(raw & wmask)
    return weights, anchors


def build_timer(stage_fn, lanes_np):
    n = lanes_np.shape[0]
    build, tables = build_stage_kernel(stage_fn)
    tile = ROWS * LANE
    n_pad = ((n + tile - 1) // tile) * tile
    xp = jnp.zeros((n_pad, 4), jnp.uint32).at[:n].set(jnp.asarray(lanes_np))
    call = build(n_pad // LANE)

    @partial(jax.jit, static_argnums=1)
    def chained(x, reps):
        def body(i, c):
            planes = [(x[:, w] ^ c).reshape(n_pad // LANE, LANE) for w in range(4)]
            return call(*planes, *tables)[0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    int(chained(xp, 2))
    int(chained(xp, 1026))

    def sample():
        """Long-region min-friendly sample (see bench._measure_chained)."""
        t0 = time.perf_counter()
        int(chained(xp, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chained(xp, 1026))
        t1026 = time.perf_counter() - t0
        return max((t1026 - t2) / 1024, 1e-9)

    return sample, n_pad


def main():
    from basisu_rs_tpu.ops import bc7 as bc7_mod

    modes = [int(m) for m in sys.argv[1:]] or [9, 2, 3]
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
        orig = ud.decode_weights
        ud.decode_weights = old_decode_weights
        try:
            sample_old, _ = build_timer(full, lanes)
        finally:
            ud.decode_weights = orig

        news, olds = [], []
        for _ in range(9):
            news.append(sample_new())
            olds.append(sample_old())
        mn, mo = sorted(news)[len(news) // 2], sorted(olds)[len(olds) // 2]
        print(
            f"mode {mode_id}: new {n_pad/mn/1e6:7.1f} Mblk/s  old {n_pad/mo/1e6:7.1f} Mblk/s"
            f"  speedup x{mo/mn:.3f}"
        )


if __name__ == "__main__":
    main()
