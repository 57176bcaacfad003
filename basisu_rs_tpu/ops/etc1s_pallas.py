"""Pallas TPU kernels for the ETC1S back-end.

The ETC1S device stage is a codebook gather + palette select per block
(ops/etc1s.py documents the math).  XLA's scalar TPU gather lowering makes
the jnp.take path unusable at scale on TPU, so these kernels gather the
codebooks - packed one word per entry and shipped as `[chunks, 128]` VMEM
inputs - with the chunked 128-lane `take_along_axis` scheme from ops/bits.

Codebook packing (host side):
  endpoint entry -> u32: r5 | g5<<5 | b5<<10 | inten3<<15
  selector entry -> u32: the four 2-bit-selector row bytes, row y at byte y
  ETC1 wire entry -> u32: precomputed Selector::etc1_bytes word

Codebook lengths are padded to a multiple of 128; the chunk count is part of
the kernel's shape signature (one compile per codebook-size bucket).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import np_tables
from . import bits
from .bits import U32, gather_chunked

LANE = 128
ROWS = 8  # legacy default; see rows_for_kind

# Measured per-kind grid tiles (v5e sweep over 8/16/32): the RGBA kernels
# prefer 32-row tiles (37.9 -> 67.8 Gtex/s vs the old 8), the tiny ETC1
# repack peaks at 16 (80.6 -> 104.6).  8-row tiles are uniformly worst.
# rgba_alpha = 64: the fused pair kernel amortizes grid overhead over twice
# the gathers; back-to-back sweep 16/32/64 gave 41.5/41.9/45.0 Gtex/s
# (128 compiles pathologically - not a candidate)
# Round-5 on-chip retune (tools/autotune_tiles.py --rows 32,64,128 plus a
# back-to-back aggregate A/B with _build.cache_clear() between runs - an
# earlier A/B without the cache clear silently reused the old tiles):
# rgba 74.9 -> 86.8 Gtex/s at 128 rows (+15.9%), etc1 105.0 -> 106.5; the
# sweep puts alpha and the fused rgba_alpha at 128 as well (+1-8%).
ROWS_BY_KIND = {"rgba": 128, "alpha": 128, "etc1": 128, "rgba_alpha": 128}


def rows_for_kind(kind: str) -> int:
    # on non-default hardware the per-kind autotune cache may carry
    # "etc1s_<kind>" overrides (see pallas_kernels._tuned_rows)
    from .pallas_kernels import _tuned_rows

    return _tuned_rows().get(f"etc1s_{kind}", ROWS_BY_KIND.get(kind, ROWS))

I32 = jnp.int32

# kernel-kind shape signatures, shared with parallel/mesh.py
OUT_WORDS = {"rgba": 16, "alpha": 16, "etc1": 2, "rgba_alpha": 16}
N_IDX = {"rgba": 2, "alpha": 2, "etc1": 2, "rgba_alpha": 4}


def bucket_rows(n: int, kind: str) -> int:
    """Rows of the padded [rows, 128] index layout for an n-block stream:
    whole tiles, pow2-bucketed so varied slice sizes hit a bounded set of
    kernel shapes (one Mosaic compile per bucket)."""
    tile = rows_for_kind(kind) * LANE
    p2 = tile
    while p2 < n:
        p2 *= 2
    return p2 // LANE


def _pad_chunks(word: np.ndarray) -> np.ndarray:
    """Pad a packed 1-D table to a power-of-two number of 128-lane chunks so
    corpora with varied codebook sizes hit a bounded set of kernel shapes."""
    chunks = max(1, -(-len(word) // LANE))
    p2 = 1
    while p2 < chunks:
        p2 *= 2
    out = np.zeros(p2 * LANE, np.uint32)
    out[: len(word)] = word
    return out.reshape(-1, LANE)


def pack_endpoints_np(endpoints: np.ndarray) -> np.ndarray:
    """uint8 [E,4] (r5,g5,b5,inten3) -> uint32 [chunks,128] (chunks = pow2)."""
    e = endpoints.astype(np.uint32)
    word = e[:, 0] | (e[:, 1] << 5) | (e[:, 2] << 10) | (e[:, 3] << 15)
    return _pad_chunks(word)


def pack_selectors_np(selectors: np.ndarray) -> np.ndarray:
    """uint8 [S,4] row bytes -> uint32 [chunks,128] (chunks = pow2)."""
    s = selectors.astype(np.uint32)
    word = s[:, 0] | (s[:, 1] << 8) | (s[:, 2] << 16) | (s[:, 3] << 24)
    return _pad_chunks(word)


def pack_wire_np(wire: np.ndarray) -> np.ndarray:
    return _pad_chunks(wire.astype(np.uint32))


def _packed_mods_np() -> np.ndarray:
    """int32 [8]: (small | big<<8) modifier magnitudes per intensity row -
    rows are [-big, -small, small, big], so one gather serves all 4 levels."""
    mods = np_tables()["ETC1_MODIFIERS"]
    return (mods[:, 2] | (mods[:, 3] << 8)).astype(np.int32)


def _palette(ep_word):
    """ep packed word [R,128] -> (pal[level][channel] int32, base expanded)."""
    r5 = (ep_word & 31).astype(I32)
    g5 = ((ep_word >> 5) & 31).astype(I32)
    b5 = ((ep_word >> 10) & 31).astype(I32)
    inten = ((ep_word >> 15) & 7).astype(I32)
    base = [(c << 3) | (c >> 2) for c in (r5, g5, b5)]
    w = bits.lut_lookup(_packed_mods_np(), inten)
    small = w & 255
    big = w >> 8
    # one-sided clamps: base is 0..255 and the modifier sign is static per
    # level (see ops/etc.etc1_palette)
    return [
        [jnp.maximum(base[c] - big, 0) for c in range(3)],
        [jnp.maximum(base[c] - small, 0) for c in range(3)],
        [jnp.minimum(base[c] + small, 255) for c in range(3)],
        [jnp.minimum(base[c] + big, 255) for c in range(3)],
    ]


def _rgba_kernel_body(ep_words, sel_words, out_refs, alpha_only: bool):
    pal = _palette(ep_words)
    if not alpha_only:
        # pack each palette level ONCE per block; the per-texel 4-way select
        # then routes one packed word instead of three channels (3 wheres
        # per texel instead of 9, plus no per-texel repacking)
        palw = [
            (pal[k][0].astype(U32) | (pal[k][1].astype(U32) << 8)
             | (pal[k][2].astype(U32) << 16) | U32(0xFF000000))
            for k in range(4)
        ]
    for y in range(4):
        row = (sel_words >> (8 * y)) & 0xFF
        for x in range(4):
            s = ((row >> (2 * x)) & 3).astype(I32)
            if alpha_only:
                g = pal[0][1]
                for k in range(1, 4):
                    g = jnp.where(s == k, pal[k][1], g)
                out_refs[y * 4 + x][...] = g.astype(U32)
            else:
                px = palw[0]
                for k in range(1, 4):
                    px = jnp.where(s == k, palw[k], px)
                out_refs[y * 4 + x][...] = px


def _rgba_alpha_kernel_body(ep_words, sel_words, a_ep_words, a_sel_words, out_refs):
    """Fused RGB + alpha slice pair: one launch emits the final packed RGBA
    (the alpha byte is the G channel of the alpha slice's palette color,
    mod.rs:139-143) - no [N,16] intermediates round-tripping through HBM."""
    pal = _palette(ep_words)
    palw = [
        (pal[k][0].astype(U32) | (pal[k][1].astype(U32) << 8)
         | (pal[k][2].astype(U32) << 16))
        for k in range(4)
    ]
    a_pal = _palette(a_ep_words)
    a_g = [a_pal[k][1].astype(U32) << 24 for k in range(4)]
    for y in range(4):
        row = (sel_words >> (8 * y)) & 0xFF
        a_row = (a_sel_words >> (8 * y)) & 0xFF
        for x in range(4):
            s = ((row >> (2 * x)) & 3).astype(I32)
            px = palw[0]
            for k in range(1, 4):
                px = jnp.where(s == k, palw[k], px)
            a_s = ((a_row >> (2 * x)) & 3).astype(I32)
            a = a_g[0]
            for k in range(1, 4):
                a = jnp.where(a_s == k, a_g[k], a)
            out_refs[y * 4 + x][...] = px | a


@lru_cache(maxsize=None)
def _build(kind: str, ep_chunks: int, sel_chunks: int, n_rows: int, interpret: bool):
    out_words = OUT_WORDS[kind]
    rows = rows_for_kind(kind)
    n_idx = N_IDX[kind]

    mods_np = _packed_mods_np()

    def kernel(*refs):
        ep_tab, sel_tab = refs[:2]
        idx_refs = refs[2 : 2 + n_idx]
        mods_ref = refs[2 + n_idx]
        out_refs = refs[3 + n_idx :]
        ep_idx = idx_refs[0][...]
        sel_idx = idx_refs[1][...]
        provide = {bits.table_key(mods_np): mods_ref[...]}
        with bits.table_mode("provide", provide):
            if kind == "etc1":
                ep_words = gather_chunked(ep_tab[...], ep_idx)
                wire = gather_chunked(sel_tab[...], sel_idx)
                inten = (ep_words >> 15) & 7
                r5 = ep_words & 31
                g5 = (ep_words >> 5) & 31
                b5 = (ep_words >> 10) & 31
                out_refs[0][...] = (
                    (r5 << 3) | ((g5 << 3) << 8) | ((b5 << 3) << 16)
                    | (((inten << 5) | (inten << 2) | U32(0b11)) << 24)
                ).astype(U32)
                out_refs[1][...] = wire
            elif kind == "rgba_alpha":
                ep_words = gather_chunked(ep_tab[...], ep_idx)
                sel_words = gather_chunked(sel_tab[...], sel_idx)
                a_ep_words = gather_chunked(ep_tab[...], idx_refs[2][...])
                a_sel_words = gather_chunked(sel_tab[...], idx_refs[3][...])
                _rgba_alpha_kernel_body(
                    ep_words, sel_words, a_ep_words, a_sel_words, out_refs
                )
            else:
                ep_words = gather_chunked(ep_tab[...], ep_idx)
                sel_words = gather_chunked(sel_tab[...], sel_idx)
                _rgba_kernel_body(ep_words, sel_words, out_refs, kind == "alpha")

    grid = (pl.cdiv(n_rows, rows),)
    idx_spec = pl.BlockSpec((rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tab_spec, tab_spec] + [idx_spec] * n_idx + [tab_spec],
        out_specs=[idx_spec] * out_words,
        out_shape=[jax.ShapeDtypeStruct((n_rows, LANE), jnp.uint32)] * out_words,
        interpret=interpret,
    )


def _run(kind, ep_tab_np, sel_tab_np, ep_idx_np, sel_idx_np, interpret=False,
         extra_idx=()):
    n = len(ep_idx_np)
    n_pad = bucket_rows(n, kind) * LANE

    def pad(a):
        out = np.zeros(n_pad, np.int32)
        out[:n] = a
        return jnp.asarray(out.reshape(-1, LANE))

    call = _build(kind, ep_tab_np.shape[0], sel_tab_np.shape[0], n_pad // LANE, interpret)
    mods_np = _packed_mods_np()
    outs = call(
        jnp.asarray(ep_tab_np),
        jnp.asarray(sel_tab_np),
        *[pad(a) for a in (ep_idx_np, sel_idx_np, *extra_idx)],
        jnp.asarray(bits.pad_table_for_kernel(mods_np)),
    )
    out = jnp.stack([o.reshape(n_pad) for o in outs], axis=-1)[:n]
    return out


def etc1s_rgba_pallas(endpoints_np, selectors_np, ep_idx, sel_idx, interpret=False):
    """-> uint32 [N,16] packed RGBA texels (device array)."""
    return _run(
        "rgba", pack_endpoints_np(endpoints_np), pack_selectors_np(selectors_np),
        ep_idx, sel_idx, interpret,
    )


def etc1s_alpha_pallas(endpoints_np, selectors_np, ep_idx, sel_idx, interpret=False):
    """-> uint32 [N,16] alpha bytes (G channel of the palette color)."""
    return _run(
        "alpha", pack_endpoints_np(endpoints_np), pack_selectors_np(selectors_np),
        ep_idx, sel_idx, interpret,
    )


def etc1s_rgba_alpha_pallas(
    endpoints_np, selectors_np, ep_idx, sel_idx, a_ep_idx, a_sel_idx, interpret=False
):
    """Fused RGB + alpha slice pair -> uint32 [N,16] final packed RGBA in ONE
    launch (vs rgba + alpha kernels + a merge pass over two intermediates)."""
    return _run(
        "rgba_alpha", pack_endpoints_np(endpoints_np),
        pack_selectors_np(selectors_np), ep_idx, sel_idx, interpret,
        extra_idx=(a_ep_idx, a_sel_idx),
    )


def etc1s_etc1_pallas(endpoints_np, wire_np, ep_idx, sel_idx, interpret=False):
    """-> uint32 [N,2] ETC1 block lanes."""
    return _run(
        "etc1", pack_endpoints_np(endpoints_np), pack_wire_np(wire_np),
        ep_idx, sel_idx, interpret,
    )
