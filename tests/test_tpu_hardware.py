"""On-hardware Pallas parity: the full 5x19 kernel matrix compiled via
Mosaic on a real TPU chip, checked bit-exact against the golden corpus.

Skipped under the hermetic CPU suite; run with

    BASISU_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

(the env var stops conftest.py from forcing the CPU backend).  This is the
reproducible form of the round-1 on-hardware verification.
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("BASISU_TPU_TESTS"),
    reason="on-hardware test; set BASISU_TPU_TESTS=1 with a TPU attached",
)

TARGETS = ("bc7", "rgba", "astc", "etc1", "etc2")


@requires_tpu
def test_backend_is_tpu():
    import jax

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()


@requires_tpu
@pytest.mark.parametrize("target", TARGETS)
def test_pallas_tpu_matches_golden_all_modes(golden, target):
    """All 19 modes per target in one test (one device round-trip per mode
    group keeps wall-clock sane over the tunnel)."""
    from basisu_rs_tpu.ops.bits import bytes_from_lanes_np, lanes_from_bytes_np
    from basisu_rs_tpu.ops.dispatch import block_modes
    from basisu_rs_tpu.ops.pallas_kernels import pallas_mode_kernel

    blocks = golden[f"{target}_in"]
    expected = golden[f"{target}_out"]
    modes = block_modes(blocks)
    for mode in range(19):
        idx = np.nonzero(modes == mode)[0]
        assert len(idx) > 0
        lanes = lanes_from_bytes_np(blocks[idx], 4)
        out, err = pallas_mode_kernel(target, mode)(lanes)
        assert not np.asarray(err).any(), f"mode {mode}"
        out = np.asarray(out)
        if target == "rgba":
            np.testing.assert_array_equal(out, expected[idx], err_msg=f"mode {mode}")
        else:
            np.testing.assert_array_equal(
                bytes_from_lanes_np(out), expected[idx], err_msg=f"mode {mode}"
            )


@requires_tpu
def test_fl_div255_exact_on_tpu_xla_and_pallas():
    """The arithmetic f32 division (ops/bits.fl_div255) must round exactly
    like IEEE v/255 on the real chip, through both compilation paths: XLA
    (where an optimization barrier blocks the algebraic simplifier's
    factoring rewrite) and Mosaic (no barrier, no rewrite)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from basisu_rs_tpu.ops import bits

    true = (np.arange(256).astype(np.float32) / np.float32(255.0)).astype(np.float32)
    x = jnp.arange(256, dtype=jnp.int32).reshape(2, 128)
    out = np.asarray(jax.jit(bits.fl_div255)(x)).reshape(-1)
    np.testing.assert_array_equal(out.view(np.int32), true.view(np.int32))

    def kern(x_ref, o_ref):
        with bits.table_mode("provide", {}):  # kernel context: no barrier
            o_ref[...] = bits.fl_div255(x_ref[...])

    pf = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32))
    out2 = np.asarray(jax.jit(pf)(x)).reshape(-1)
    np.testing.assert_array_equal(out2.view(np.int32), true.view(np.int32))


@requires_tpu
def test_etc1s_kernels_on_tpu():
    """Compiled-Mosaic ETC1S back-ends vs the XLA reference path on real
    hardware (the hermetic suite covers them in interpret mode only)."""
    import jax.numpy as jnp

    from basisu_rs_tpu.ops.etc1s import _jitted, selector_wire_words_np
    from basisu_rs_tpu.ops.etc1s_pallas import etc1s_etc1_pallas, etc1s_rgba_pallas

    rng = np.random.default_rng(23)
    e, s, n = 300, 200, 5000
    endpoints = np.zeros((e, 4), np.uint8)
    endpoints[:, :3] = rng.integers(0, 32, (e, 3))
    endpoints[:, 3] = rng.integers(0, 8, e)
    selectors = rng.integers(0, 256, (s, 4)).astype(np.uint8)
    ep_idx = rng.integers(0, e, n).astype(np.int32)
    sel_idx = rng.integers(0, s, n).astype(np.int32)

    got = np.asarray(etc1s_rgba_pallas(endpoints, selectors, ep_idx, sel_idx))[:n]
    ref = np.asarray(
        _jitted("rgba")(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(ep_idx), jnp.asarray(sel_idx),
        )
    )
    np.testing.assert_array_equal(got, ref)

    wire = selector_wire_words_np(selectors)
    got1 = np.asarray(etc1s_etc1_pallas(endpoints, wire, ep_idx, sel_idx))[:n]
    ref1 = np.asarray(
        _jitted("etc1")(
            jnp.asarray(endpoints), jnp.asarray(wire),
            jnp.asarray(ep_idx), jnp.asarray(sel_idx),
        )
    )
    np.testing.assert_array_equal(got1, ref1)

    from basisu_rs_tpu.ops.etc1s_pallas import etc1s_rgba_alpha_pallas

    a_ep = rng.integers(0, e, n).astype(np.int32)
    a_sel = rng.integers(0, s, n).astype(np.int32)
    got2 = np.asarray(
        etc1s_rgba_alpha_pallas(endpoints, selectors, ep_idx, sel_idx, a_ep, a_sel)
    )[:n]
    a = np.asarray(
        _jitted("alpha")(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(a_ep), jnp.asarray(a_sel),
        )
    )
    ref2 = (ref & np.uint32(0x00FFFFFF)) | (a << np.uint32(24))
    np.testing.assert_array_equal(got2, ref2)


@requires_tpu
def test_sharded_mode_step_on_tpu(golden):
    """The production sharded step (pallas inside shard_map) on the attached
    chip(s): bit parity with the host-partitioned path."""
    from basisu_rs_tpu.ops.dispatch import transcode_blocks
    from basisu_rs_tpu.parallel.mesh import make_mesh, sharded_transcode

    mesh = make_mesh()
    blocks = golden["bc7_in"]
    out, err = sharded_transcode(blocks, "bc7", mesh)
    assert not err.any()
    expected, _ = transcode_blocks(blocks, "bc7")
    np.testing.assert_array_equal(out, expected)
