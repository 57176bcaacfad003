"""ETC1S device back-end: codebook gather + per-block palette kernels.

Consumes the dense tensors emitted by the host front-end
(container/etc1s_frontend.py): endpoint codebook [E,4] (r5,g5,b5,inten3),
selector codebook [S,4] row bytes, and per-block (endpoint, selector) index
streams.  Mirrors the per-block closures of the reference:
  - RGBA back-end: src/basis_lz/mod.rs:97-151
  - ETC1 back-end: src/basis_lz/mod.rs:153-186
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import np_tables
from .bits import U32
from .etc import color_5_to_8, etc1_palette

I32 = jnp.int32


def selector_wire_words_np(selector_rows: np.ndarray) -> np.ndarray:
    """Precompute the 32-bit ETC1 wire word per selector codebook entry.

    selector_rows: uint8 [S, 4], row y holds x's 2-bit value at bits 2x.
    Wire format per Selector::set_selector (etc.rs:374-393)."""
    sel_to_etc1 = np_tables()["SELECTOR_ID_TO_ETC1"].astype(np.uint32)
    rows = selector_rows.astype(np.uint32)
    out = np.zeros(rows.shape[0], np.uint32)
    for x in range(4):
        for y in range(4):
            val = (rows[:, y] >> (2 * x)) & 3
            mod_id = sel_to_etc1[val]
            pid = x * 4 + y
            ms_byte = 1 - pid // 8
            ls_byte = ms_byte + 2
            bit = pid % 8
            out |= (mod_id >> 1) << (8 * ms_byte + bit)
            out |= (mod_id & 1) << (8 * ls_byte + bit)
    return out


def _palette_for_blocks(endpoints, ep_idx):
    """Gather per-block ETC1S palettes: 4 levels x 3 channels of int32[N]."""
    ep = jnp.take(endpoints.astype(I32), ep_idx, axis=0)  # [N, 4]
    base = [color_5_to_8(ep[:, c]) for c in range(3)]
    return etc1_palette(base, ep[:, 3])


def etc1s_rgba_kernel(endpoints, selectors, ep_idx, sel_idx):
    """-> uint32 [N, 16] packed RGBA texels (alpha = 255)."""
    pal = _palette_for_blocks(endpoints, ep_idx)
    # pack each palette level once per block; per-texel selects route one
    # packed word instead of three channels (mirrors the Pallas kernel)
    palw = [
        (pal[k][0].astype(U32) | (pal[k][1].astype(U32) << 8)
         | (pal[k][2].astype(U32) << 16) | U32(0xFF000000))
        for k in range(4)
    ]
    rows = jnp.take(selectors.astype(I32), sel_idx, axis=0)  # [N, 4]
    texels = []
    for y in range(4):
        for x in range(4):
            s = (rows[:, y] >> (2 * x)) & 3
            px = palw[0]
            for k in range(1, 4):
                px = jnp.where(s == k, palw[k], px)
            texels.append(px)
    return jnp.stack(texels, axis=-1)


def etc1s_alpha_kernel(endpoints, selectors, ep_idx, sel_idx):
    """-> uint32 [N, 16] alpha bytes: the G channel of the selected palette
    color (mod.rs:139-143)."""
    pal = _palette_for_blocks(endpoints, ep_idx)
    rows = jnp.take(selectors.astype(I32), sel_idx, axis=0)
    out = []
    for y in range(4):
        for x in range(4):
            s = (rows[:, y] >> (2 * x)) & 3
            g = pal[0][1]
            for k in range(1, 4):
                g = jnp.where(s == k, pal[k][1], g)
            out.append(g.astype(U32))
    return jnp.stack(out, axis=-1)


def etc1s_etc1_kernel(endpoints, selector_wire, ep_idx, sel_idx):
    """-> uint32 [N, 2] ETC1 block lanes (mod.rs:163-181)."""
    ep = jnp.take(endpoints.astype(I32), ep_idx, axis=0)
    inten = ep[:, 3].astype(U32)
    lane0 = (
        (ep[:, 0].astype(U32) << 3)
        | ((ep[:, 1].astype(U32) << 3) << 8)
        | ((ep[:, 2].astype(U32) << 3) << 16)
        | (((inten << 5) | (inten << 2) | U32(0b11)) << 24)
    )
    lane1 = jnp.take(selector_wire, sel_idx, axis=0)
    return jnp.stack([lane0, lane1], axis=-1)


@lru_cache(maxsize=None)
def _jitted(name):
    return {
        "rgba": jax.jit(etc1s_rgba_kernel),
        "alpha": jax.jit(etc1s_alpha_kernel),
        "etc1": jax.jit(etc1s_etc1_kernel),
    }[name]


def _use_pallas() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def run_etc1s_rgba(endpoints_np, selectors_np, ep_idx_np, sel_idx_np, alpha_pass=None,
                   device=False):
    """Host entry: decode an ETC1S slice to packed RGBA texels.

    alpha_pass: optional (ep_idx, sel_idx) of the paired alpha slice; its
    G channel replaces the alpha byte (basis.rs:26-50 pairing).
    device=True keeps the result as a device array (no D2H) for pipelines
    whose downstream consumer is on-device - e.g. an ML input pipeline
    feeding decoded texels straight into a training step.
    On TPU the Pallas kernels run (chunked in-VMEM codebook gathers); the
    jnp.take path serves CPU."""
    mat = (lambda x: x) if device else np.asarray
    if _use_pallas():
        from .etc1s_pallas import etc1s_rgba_alpha_pallas, etc1s_rgba_pallas

        if alpha_pass is not None:
            # fused kernel: one launch, no [N,16] intermediates through HBM
            return mat(
                etc1s_rgba_alpha_pallas(
                    endpoints_np, selectors_np, ep_idx_np, sel_idx_np, *alpha_pass
                )
            )
        return mat(
            etc1s_rgba_pallas(endpoints_np, selectors_np, ep_idx_np, sel_idx_np)
        )
    rgba = _jitted("rgba")(
        jnp.asarray(endpoints_np), jnp.asarray(selectors_np),
        jnp.asarray(ep_idx_np.astype(np.int32)), jnp.asarray(sel_idx_np.astype(np.int32)),
    )
    if alpha_pass is not None:
        a_ep, a_sel = alpha_pass
        a = _jitted("alpha")(
            jnp.asarray(endpoints_np), jnp.asarray(selectors_np),
            jnp.asarray(a_ep.astype(np.int32)), jnp.asarray(a_sel.astype(np.int32)),
        )
        rgba = (rgba & U32(0x00FFFFFF)) | (a << U32(24))
    return mat(rgba)


def run_etc1s_etc1(endpoints_np, selectors_np, ep_idx_np, sel_idx_np, device=False):
    mat = (lambda x: x) if device else np.asarray
    wire_np = selector_wire_words_np(selectors_np)
    if _use_pallas():
        from .etc1s_pallas import etc1s_etc1_pallas

        return mat(etc1s_etc1_pallas(endpoints_np, wire_np, ep_idx_np, sel_idx_np))
    out = _jitted("etc1")(
        jnp.asarray(endpoints_np), jnp.asarray(wire_np),
        jnp.asarray(ep_idx_np.astype(np.int32)), jnp.asarray(sel_idx_np.astype(np.int32)),
    )
    return mat(out)
