"""Pallas TPU kernels wrapping the per-mode transcode lane functions.

The lane functions (ops/rgba.py, bc7.py, astc.py, etc.py) are pure jnp int32
pipelines, shape-polymorphic over the batch.  Here they run inside
`pl.pallas_call` with:

  - blocks delivered as FOUR separate `[rows, 128]` uint32 word planes: the
    transposed layout puts the block axis on the VPU sublane x lane grid, so
    every op runs at full 8x128 vector width (the packed `[N, 4]` layout
    would waste 124/128 lanes),
  - every constant table materialized as a real VMEM kernel input: an
    abstract pre-trace in `table_mode("collect")` discovers the tables a
    (target, mode) pair needs; inside the kernel `table_mode("provide")`
    routes `bits.lut_lookup` to 128-lane `take_along_axis` chunks (the only
    gather shape Mosaic lowers) with a select across chunks,
  - a 1-D grid over row tiles, double-buffered by the Pallas pipeline.

`pallas_mode_kernel(target, mode)` returns a jitted callable with the same
contract as the XLA-path kernels (dispatch._mode_kernel): uint32[N,4] ->
(uint32[N,W], err bool[N]).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import MODES
from . import bits

LANE = 128
ROWS = 16  # default: 16 x 128 = 2048 blocks per grid step

# Measured grid tiles (v5e; tools/autotune_tiles.py reproduces the sweep):
# 32-row tiles win on every target.  Per-mode 16-vs-32 deltas from single
# sweeps sit inside the shared-tunnel run-to-run noise, but back-to-back
# full-aggregate A/B separates cleanly (BC7: 61.9 @ 16 vs 66.0 @ 32
# Gtex/s; a 32-vs-64 sweep after the round-3 kernel work kept 32).  Larger
# tiles amortize grid/pipeline overhead; 8-row tiles are uniformly worst.
# Round-4 re-sweep after op-removal batches 1+2: BC7 moved to 64 rows
# (0.226 vs 0.236 ns/blk probe-mix, every probe mode faster; aggregate
# A/B'd same-session), etc1/etc2 stay at 32.
# Round-5 re-sweep after op-removal batches 3-5 (tools/ab_rows.py, paired
# aggregate A/B in one process with the _tuned_rows cache cleared between
# arms): astc 32->128 (84.1->87.7 at 64, 82.8->88.1 at 128: +6.4%), rgba
# 32->64 (70.3->73.6, +4.7%; 128 regresses -3.1%), bc7 128 rejected
# (-0.4%), etc1/etc2 stay at 32 per the round-5 single-mode sweep.
ROWS_BY_TARGET = {"bc7": 64, "rgba": 64, "astc": 128, "etc1": 32, "etc2": 32}

# Device kinds the shipped table was tuned on.  On any other TPU kind,
# rows_for_target consults .jax_cache/tiles_<kind>.json (written by
# `python tools/autotune_tiles.py --write` on that hardware) and warns once
# if it is absent - a silently-wrong tile on future chips costs real
# throughput.
TUNED_DEVICE_KINDS = ("TPU v5 lite",)


def _device_kind() -> str:
    try:
        devs = jax.devices()
        return devs[0].device_kind if devs else "unknown"
    except Exception:
        return "unknown"


def tile_cache_path():
    from pathlib import Path

    slug = "".join(ch if ch.isalnum() else "_" for ch in _device_kind())
    return Path(__file__).resolve().parents[2] / ".jax_cache" / f"tiles_{slug}.json"


@lru_cache(maxsize=None)
def _tuned_rows():
    """Per-target tile table for the attached hardware: the shipped table on
    tuned kinds (and on CPU/interpret runs, where tiles barely matter),
    else the per-kind autotune cache when present."""
    if jax.default_backend() not in ("tpu", "axon"):
        return ROWS_BY_TARGET
    kind = _device_kind()
    if any(kind.startswith(k) for k in TUNED_DEVICE_KINDS):
        return ROWS_BY_TARGET
    path = tile_cache_path()
    if path.exists():
        import json

        cached = {k: int(v) for k, v in json.loads(path.read_text()).items()}
        return {**ROWS_BY_TARGET, **cached}
    import warnings

    warnings.warn(
        f"no tuned Pallas grid tiles for device kind {kind!r}; using the "
        f"v5e defaults. Run `python tools/autotune_tiles.py --write` once on "
        f"this hardware to derive and cache them ({path})."
    )
    return ROWS_BY_TARGET


def rows_for_target(target: str) -> int:
    return _tuned_rows().get(target, ROWS)


def _lane_fn(target: str):
    from . import astc, bc7, etc, rgba

    return {
        "rgba": (rgba.uastc_to_rgba_mode, 16),
        "bc7": (bc7.uastc_to_bc7_mode, 4),
        "astc": (astc.uastc_to_astc_mode, 4),
        "etc1": (etc.uastc_to_etc1_mode, 2),
        "etc2": (etc.uastc_to_etc2_mode, 4),
    }[target]


@lru_cache(maxsize=None)
def _pallas_build(target: str, mode_id: int, rows: int, interpret: bool = False):
    fn, out_words = _lane_fn(target)
    cfg = MODES[mode_id]

    # Pass 1: discover the constant tables this (target, mode) pair touches.
    collected: dict = {}
    dummy = tuple(jax.ShapeDtypeStruct((rows, LANE), jnp.uint32) for _ in range(4))
    with bits.table_mode("collect", collected):
        jax.eval_shape(lambda lanes: fn(cfg, lanes), dummy)
    keys = list(collected.keys())
    tables = [jnp.asarray(bits.pad_table_for_kernel(collected[k])) for k in keys]

    def kernel(*refs):
        in_refs = refs[:4]
        tab_refs = refs[4 : 4 + len(keys)]
        out_refs = refs[4 + len(keys) : 4 + len(keys) + out_words]
        err_ref = refs[4 + len(keys) + out_words]
        provide = {k: tab_refs[i][...] for i, k in enumerate(keys)}
        with bits.table_mode("provide", provide):
            words, err = fn(cfg, tuple(r[...] for r in in_refs))
        for k in range(out_words):
            out_refs[k][...] = words[k].astype(jnp.uint32)
        err_ref[...] = err.astype(jnp.int32)

    @lru_cache(maxsize=None)
    def build(n_rows: int):
        grid = (pl.cdiv(n_rows, rows),)
        plane_spec = pl.BlockSpec((rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole table, every step
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[plane_spec] * 4 + [table_spec] * len(keys),
            out_specs=[plane_spec] * (out_words + 1),
            out_shape=[jax.ShapeDtypeStruct((n_rows, LANE), jnp.uint32)] * out_words
            + [jax.ShapeDtypeStruct((n_rows, LANE), jnp.int32)],
            interpret=interpret,
        )

    return build, tables, out_words


def pallas_mode_kernel(
    target: str, mode_id: int, rows: int | None = None, interpret: bool = False
):
    """Jitted uint32[N,4] -> (uint32[N,W], err bool[N]) via a Pallas kernel.

    interpret=True runs the kernel through the Pallas interpreter (any
    backend) - used by the hermetic CPU tests."""
    if rows is None:
        rows = rows_for_target(target)
    build, tables, out_words = _pallas_build(target, mode_id, rows, interpret)

    @jax.jit
    def run(lanes):
        n = lanes.shape[0]
        tile = rows * LANE
        n_pad = ((n + tile - 1) // tile) * tile
        padded = jnp.zeros((n_pad, 4), jnp.uint32).at[:n].set(lanes)
        planes = [padded[:, w].reshape(n_pad // LANE, LANE) for w in range(4)]
        outs = build(n_pad // LANE)(*planes, *tables)
        out = jnp.stack([o.reshape(n_pad) for o in outs[:out_words]], axis=-1)[:n]
        err = outs[out_words].reshape(n_pad)[:n] != 0
        return out, err

    return run
