#!/usr/bin/env python
"""Ablation timing for BC7 kernel stages on the real TPU.

Times arbitrary lane-stage functions through the same Pallas plumbing as the
production kernels (word-plane layout, VMEM tables, chained-loop timing that
survives the axon tunnel's non-blocking block_until_ready).

Usage: python tools/ablate_bc7.py [mode ...]
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).parent.parent))

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from basisu_rs_tpu.ops import bits
from basisu_rs_tpu.ops.bits import lanes_from_bytes_np
from basisu_rs_tpu.ops.dispatch import block_modes
from basisu_rs_tpu.tables import MODES

LANE = 128
ROWS = 8


def build_stage_kernel(stage_fn, rows=ROWS):
    """stage_fn(cfg-free): lanes-tuple -> single uint32[N] checksum lane."""
    collected = {}
    dummy = tuple(jax.ShapeDtypeStruct((rows, LANE), jnp.uint32) for _ in range(4))
    with bits.table_mode("collect", collected):
        jax.eval_shape(lambda lanes: stage_fn(lanes), dummy)
    keys = list(collected.keys())
    tables = [jnp.asarray(bits.pad_table_for_kernel(collected[k])) for k in keys]

    def kernel(*refs):
        in_refs = refs[:4]
        tab_refs = refs[4 : 4 + len(keys)]
        out_ref = refs[4 + len(keys)]
        provide = {k: tab_refs[i][...] for i, k in enumerate(keys)}
        with bits.table_mode("provide", provide):
            out_ref[...] = stage_fn(tuple(r[...] for r in in_refs)).astype(jnp.uint32)

    def build(n_rows):
        plane_spec = pl.BlockSpec((rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(n_rows, rows),),
            in_specs=[plane_spec] * 4 + [table_spec] * len(keys),
            out_specs=plane_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANE), jnp.uint32),
        )

    return build, tables


def time_stage(name, stage_fn, lanes_np):
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
    int(chained(xp, 130))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(chained(xp, 2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(chained(xp, 130))
        t130 = time.perf_counter() - t0
        samples.append((t130 - t2) / 128)
    per = max(sorted(samples)[1], 1e-9)
    print(f"  {name:34s}: {n_pad/per/1e6:8.1f} Mblocks/s  ({per*1e6:7.1f} us/iter)")
    return per


def xor_all(arrs):
    out = None
    for a in arrs:
        a = a.astype(jnp.uint32)
        out = a if out is None else out ^ a
    return out


def main():
    from basisu_rs_tpu.ops import bc7 as bc7_mod
    from basisu_rs_tpu.ops import uastc_decode as ud

    modes = [int(m) for m in sys.argv[1:]] or [9, 2, 3, 4, 1]
    fix = np.load(Path(__file__).parent.parent / "tests/fixtures/golden_blocks.npz")
    blocks = np.tile(fix["bc7_in"], (1 << 12, 1))
    all_modes = block_modes(blocks)

    for mode_id in modes:
        cfg = MODES[mode_id]
        idx = np.nonzero(all_modes == mode_id)[0]
        lanes = lanes_from_bytes_np(blocks[idx], 4)
        print(f"mode {mode_id} (fmt={cfg.format} subsets={cfg.subset_count} "
              f"wb={cfg.weight_bits} range={cfg.endpoint_range_index} "
              f"E={cfg.endpoint_count}), {len(idx)} blocks")

        def full(lanes, cfg=cfg):
            words, err = bc7_mod.uastc_to_bc7_mode(cfg, lanes)
            return xor_all(words) ^ err.astype(jnp.uint32)

        def endpoints_only(lanes, cfg=cfg):
            tq, qbits, unq = ud.decode_endpoints(cfg, lanes)
            return xor_all(unq)

        def weights_only(lanes, cfg=cfg):
            pat, _ = ud.decode_pattern(cfg, lanes)
            w, anchors = ud.decode_weights(cfg, lanes, pat)
            return xor_all(w) ^ xor_all(anchors)

        def fields_only(lanes, cfg=cfg):
            f = ud.decode_fields(cfg, lanes)
            return xor_all(f.endpoints) ^ xor_all(f.weights) ^ f.compsel ^ f.pat

        def pbit_only(lanes, cfg=cfg):
            # cheap fake endpoints (static extracts), real p-bit search x2
            e_lo = [bits.extract(lanes, 8 * c, 8).astype(jnp.int32) for c in range(4)]
            e_hi = [bits.extract(lanes, 32 + 8 * c, 8).astype(jnp.int32) for c in range(4)]
            acc = None
            for _ in range(cfg.subset_count):
                lo, hi, p0, p1 = bc7_mod.determine_unique_pbits(4, 5, e_lo, e_hi)
                v = xor_all(lo) ^ xor_all(hi) ^ p0 ^ p1
                acc = v if acc is None else acc ^ v
            return acc

        def permute_invert(lanes, cfg=cfg):
            # fields + the BC7 permutation/anchor/invert half, no pbit/emit
            from basisu_rs_tpu.tables import get_family, np_tables

            t = np_tables()
            f = ud.decode_fields(cfg, lanes)
            pairs = ud.assemble_endpoint_pairs(cfg, f.endpoints)
            w = [[bc7_mod.remap_weight_to_bc7(f.weights[i], cfg.weight_bits, 4)
                  for i in range(16)]]
            fam = get_family(cfg)
            nsub7 = cfg.subset_count
            bc7_pat = bits.lut_lookup(fam.bc7_index, f.pat)
            pat_packed = bits.lut_lookup(fam.bc7_pat_packed, f.pat)
            subs7 = [(pat_packed >> (2 * i)) & 3 for i in range(16)]
            anch_packed = bits.lut_lookup(fam.bc7_anchors_packed, f.pat)
            anchors = [jnp.zeros_like(f.pat)] + [
                (anch_packed >> (4 * k)) & 15 for k in range(1, nsub7)
            ]
            perm_packed = bits.lut_lookup(fam.perm_packed, f.pat)
            acc = bc7_pat
            inv = [
                ((bc7_mod._dyn_select(w[0], anchors[s]) >> 3) & 1).astype(bool)
                for s in range(nsub7)
            ]
            for j in range(nsub7):
                pj = (perm_packed >> (4 * j)) & 15
                for c in range(4):
                    lo = bc7_mod._dyn_select(
                        [pairs[s][0][c] for s in range(cfg.subset_count)], pj)
                    hi = bc7_mod._dyn_select(
                        [pairs[s][1][c] for s in range(cfg.subset_count)], pj)
                    acc = acc ^ jnp.where(inv[j], hi, lo)
            for i in range(16):
                inv_i = bc7_mod._dyn_select(
                    [inv[s].astype(jnp.int32) for s in range(nsub7)], subs7[i])
                acc = acc ^ jnp.where(inv_i == 1, (~w[0][i]) & 15, w[0][i])
            return acc

        time_stage("full kernel", full, lanes)
        time_stage("decode_endpoints", endpoints_only, lanes)
        time_stage("decode_weights", weights_only, lanes)
        time_stage("decode_fields (all)", fields_only, lanes)
        time_stage("pbit search (fake endpoints)", pbit_only, lanes)
        if cfg.subset_count > 1:
            time_stage("fields+permute+invert", permute_invert, lanes)


if __name__ == "__main__":
    main()
