"""UASTC -> ASTC 4x4 block repack, vectorized per mode.

Mirrors `convert_block_from_uastc` (reference: src/target_formats/astc.rs:8-181):
blue-contraction avoidance (endpoint swap + weight inversion), block-mode /
partition / CEM header, quantized endpoints re-encoded into ASTC integer
sequence encoding via the trit/quint pack LUTs, and weights emitted
bit-reversed from the end of the block (dual writer; here: one OR-accumulating
writer with static mirrored offsets).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tables import BISE_RANGES, LA, RGB, RGBA, ModeCfg, get_family, np_tables
from .bits import lane_shape, lut_lookup, LaneWriter, U32, bitrev, mask
from .uastc_decode import (
    decode_compsel,
    decode_endpoints,
    decode_mode8_rgba,
    decode_pattern,
    decode_weights,
    subsets_for_texels,
    unquant_endpoint,
)

I32 = jnp.int32


def _mode8_to_astc(lanes):
    """Void-extent block (astc.rs:17-43)."""
    rgba = decode_mode8_rgba(lanes)
    shape = rgba[0].shape
    w = LaneWriter(shape, 4)
    w.put_const(0b1101_1111_1100, 0, 12)
    w.put_const(0x000F_FFFF, 12, 20)
    w.put_const(0xFFFF_FFFF, 32, 32)
    ofs = 64
    for c in range(4):
        v = rgba[c].astype(U32)
        w.put((v << 8) | v, ofs, 16)
        ofs += 16
    return w.lanes, jnp.zeros(shape, bool)


def uastc_to_astc_mode(cfg: ModeCfg, lanes):
    """uint32[N,4] UASTC lanes -> (list of 4 ASTC output words, err[N])."""
    if cfg.id == 8:
        return _mode8_to_astc(lanes)

    t = np_tables()
    shape = lane_shape(lanes)
    rng = BISE_RANGES[cfg.endpoint_range_index]
    e_count = cfg.endpoint_count
    wb = cfg.weight_bits

    compsel = decode_compsel(cfg, lanes)
    pat, err = decode_pattern(cfg, lanes)
    tq, qbits, _ = decode_endpoints(cfg, lanes)
    weights, _ = decode_weights(cfg, lanes, pat)

    # ---- blue-contraction avoidance (astc.rs:55-78) ----
    # Per subset: if sum of unquantized lo endpoints (first 3 channels) exceeds
    # the hi sum, swap every quantized pair and invert that subset's weights.
    per_subset = e_count // cfg.subset_count
    invert = [jnp.zeros(shape, bool) for _ in range(3)]
    if cfg.has_blue:
        for s in range(cfg.subset_count):
            base = s * per_subset
            unq = [
                unquant_endpoint(tq[base + k], qbits[base + k], cfg.endpoint_range_index)
                if k < per_subset
                else jnp.zeros(shape, I32)
                for k in range(6)
            ]
            s0 = unq[0] + unq[2] + unq[4]
            s1 = unq[1] + unq[3] + unq[5]
            inv = s0 > s1
            invert[s] = inv
            for k in range(base, base + per_subset, 2):
                a_tq, b_tq = tq[k], tq[k + 1]
                tq[k] = jnp.where(inv, b_tq, a_tq)
                tq[k + 1] = jnp.where(inv, a_tq, b_tq)
                a_b, b_b = qbits[k], qbits[k + 1]
                qbits[k] = jnp.where(inv, b_b, a_b)
                qbits[k + 1] = jnp.where(inv, a_b, b_b)

    writer = LaneWriter(shape, 4)

    # ---- header (astc.rs:80-96) ----
    block_mode_13 = int(t["UASTC_TO_ASTC_BLOCK_MODE_13"][cfg.id])
    writer.put_const(block_mode_13, 0, 13)
    ofs = 13
    fam = get_family(cfg)
    if fam is not None and cfg.id != 1:
        idx10 = lut_lookup(fam.astc_index10, pat).astype(U32)
        writer.put(idx10, ofs, 10)
        ofs += 10 + 2  # +2 zero bits: all endpoints share one CEM
    cem = {RGB: 8, RGBA: 12, LA: 4}[cfg.format]
    writer.put_const(cem, ofs, 4)
    ofs += 4

    # ---- endpoints in ASTC integer sequence encoding (astc.rs:98-141) ----
    bit_count = rng.bits
    if rng.quints:
        enc = t["ASTC_QUINT_ENCODE"]
        for chunk in range(0, e_count, 3):
            members = min(3, e_count - chunk)
            lut_id = jnp.zeros(shape, I32)
            for k in reversed(range(members)):
                lut_id = lut_id * 5 + tq[chunk + k]
            q = lut_lookup(enc, lut_id)
            for k, qbits_slice in ((0, (0, 3)), (1, (3, 2)), (2, (5, 2))):
                v = qbits[chunk + k] if k < members else jnp.zeros(shape, I32)
                writer.put(v, ofs, bit_count)
                ofs += bit_count
                writer.put(q >> qbits_slice[0], ofs, qbits_slice[1])
                ofs += qbits_slice[1]
    elif rng.trits:
        enc = t["ASTC_TRIT_ENCODE"]
        for chunk in range(0, e_count, 5):
            members = min(5, e_count - chunk)
            lut_id = jnp.zeros(shape, I32)
            for k in reversed(range(members)):
                lut_id = lut_id * 3 + tq[chunk + k]
            tt = lut_lookup(enc, lut_id)
            for k, t_slice in ((0, (0, 2)), (1, (2, 2)), (2, (4, 1)), (3, (5, 2)), (4, (7, 1))):
                v = qbits[chunk + k] if k < members else jnp.zeros(shape, I32)
                writer.put(v, ofs, bit_count)
                ofs += bit_count
                writer.put(tt >> t_slice[0], ofs, t_slice[1])
                ofs += t_slice[1]
    else:
        for k in range(e_count):
            writer.put(qbits[k], ofs, bit_count)
            ofs += bit_count

    # ---- weights, bit-reversed from the end (astc.rs:143-178) ----
    # The k-th decoded weight lands at bits [128-(k+1)*wb, 128-k*wb), with its
    # wb bits reversed; inverted (!w) when its texel's subset was swapped.
    # Inversion as a per-texel XOR mask (inv * wmask, hoisted per subset):
    # wv ^ m replaces the not/and/select chain at one op per weight.
    wmask = mask(wb)
    if cfg.subset_count == 1:
        m0 = invert[0].astype(I32) * wmask
        inv_m = [m0] * 16
    else:
        subsets = subsets_for_texels(cfg, pat)
        inv_stack = [invert[s].astype(I32) * wmask for s in range(cfg.subset_count)]
        inv_m = []
        for i in range(16):
            v = inv_stack[0]
            for s in range(1, cfg.subset_count):
                v = jnp.where(subsets[i] == s, inv_stack[s], v)
            inv_m.append(v)

    n_weights = 16 * cfg.plane_count
    for k in range(n_weights):
        texel = k // cfg.plane_count
        wv = weights[k] ^ inv_m[texel]
        writer.put(bitrev(wv.astype(U32), wb), 128 - (k + 1) * wb, wb)

    if cfg.plane_count != 1:
        # CCS, not bit-reversed (astc.rs:174-177)
        writer.put(compsel.astype(U32), 128 - n_weights * wb - 2, 2)

    return writer.lanes, err
