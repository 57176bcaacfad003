"""Trace-ability checks: every kernel for every (target, mode) pair must
trace abstractly (the build's analog of the reference's no_std compile-only
crate, SURVEY.md C25), plus a cross-backend consistency fuzz on random
blocks (XLA vs Pallas interpreter must agree bit-for-bit on arbitrary,
including garbage, inputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from basisu_rs_tpu.ops.bits import lanes_from_bytes_np
from basisu_rs_tpu.ops.dispatch import _REGISTRY, _ensure_registered, block_modes
from basisu_rs_tpu.tables import MODES

TARGETS = ["rgba", "astc", "bc7", "etc1", "etc2"]


def test_all_kernels_trace():
    _ensure_registered()
    dummy = jax.ShapeDtypeStruct((64, 4), jnp.uint32)
    for target in TARGETS:
        fn, out_words = _REGISTRY[target]
        for cfg in MODES:
            words, err = jax.eval_shape(lambda l, c=cfg, f=fn: f(c, l), dummy)
            assert len(words) == out_words, (target, cfg.id)
            assert err.shape == (64,)


def test_all_modes_fn_traces():
    from basisu_rs_tpu.ops.dispatch import transcode_all_modes_fn

    dummy = jax.ShapeDtypeStruct((32, 4), jnp.uint32)
    for target in TARGETS:
        out, err = jax.eval_shape(transcode_all_modes_fn(target), dummy)
        assert out.shape[0] == 32


@pytest.mark.parametrize("target", ["bc7", "etc2"])
def test_fuzz_xla_vs_pallas_interpret(target):
    """Random (often garbage) block contents: both backends must agree."""
    from basisu_rs_tpu.ops.dispatch import _mode_kernel
    from basisu_rs_tpu.ops.pallas_kernels import pallas_mode_kernel

    rng = np.random.default_rng(123)
    blocks = rng.integers(0, 256, (64, 16), dtype=np.uint8)
    # force a spread of valid mode codes so every-ish kernel sees fuzz input
    blocks[:, 0] = rng.integers(0, 128, 64)
    modes = block_modes(blocks)
    lanes = lanes_from_bytes_np(blocks, 4)
    for mode_id in np.unique(modes):
        if mode_id == 19:
            continue
        idx = np.nonzero(modes == mode_id)[0]
        gl = jnp.asarray(lanes[idx])
        ox, ex = _mode_kernel(target, int(mode_id), "xla")(gl)
        op, ep = pallas_mode_kernel(target, int(mode_id), rows=8, interpret=True)(gl)
        np.testing.assert_array_equal(np.asarray(ox), np.asarray(op))
        np.testing.assert_array_equal(np.asarray(ex), np.asarray(ep))


def test_etc1s_kernels_trace():
    """Every ETC1S Pallas kernel kind (incl. the fused rgba_alpha pair)
    builds and traces abstractly at its shipped tile."""
    from basisu_rs_tpu.ops.etc1s_pallas import (
        LANE,
        N_IDX,
        OUT_WORDS,
        _build,
        rows_for_kind,
    )

    for kind in OUT_WORDS:
        rows = rows_for_kind(kind)
        call = _build(kind, 2, 2, rows, True)
        tab = jax.ShapeDtypeStruct((2, LANE), jnp.uint32)
        idx = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
        mods = jax.ShapeDtypeStruct((1, LANE), jnp.int32)
        outs = jax.eval_shape(call, tab, tab, *[idx] * N_IDX[kind], mods)
        assert len(outs) == OUT_WORDS[kind], kind
