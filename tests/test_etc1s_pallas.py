"""ETC1S Pallas kernels vs the XLA gather path (interpreter mode on CPU)."""

import numpy as np

from basisu_rs_tpu.ops.etc1s import (
    etc1s_etc1_kernel,
    etc1s_rgba_kernel,
    selector_wire_words_np,
)
from basisu_rs_tpu.ops.etc1s_pallas import (
    etc1s_alpha_pallas,
    etc1s_etc1_pallas,
    etc1s_rgba_pallas,
)

import jax.numpy as jnp


def _setup(e=200, s=150, n=1000, seed=5):
    rng = np.random.default_rng(seed)
    endpoints = np.zeros((e, 4), np.uint8)
    endpoints[:, :3] = rng.integers(0, 32, (e, 3))
    endpoints[:, 3] = rng.integers(0, 8, e)
    selectors = rng.integers(0, 256, (s, 4)).astype(np.uint8)
    ep_idx = rng.integers(0, e, n).astype(np.uint16)
    sel_idx = rng.integers(0, s, n).astype(np.uint16)
    return endpoints, selectors, ep_idx, sel_idx


def test_etc1s_rgba_pallas_matches_xla():
    endpoints, selectors, ep_idx, sel_idx = _setup()
    ref = np.asarray(
        etc1s_rgba_kernel(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(ep_idx.astype(np.int32)), jnp.asarray(sel_idx.astype(np.int32)),
        )
    )
    got = np.asarray(etc1s_rgba_pallas(endpoints, selectors, ep_idx, sel_idx, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_etc1s_alpha_pallas_matches_xla():
    endpoints, selectors, ep_idx, sel_idx = _setup(seed=6)
    from basisu_rs_tpu.ops.etc1s import etc1s_alpha_kernel

    ref = np.asarray(
        etc1s_alpha_kernel(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(ep_idx.astype(np.int32)), jnp.asarray(sel_idx.astype(np.int32)),
        )
    )
    got = np.asarray(etc1s_alpha_pallas(endpoints, selectors, ep_idx, sel_idx, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_etc1s_etc1_pallas_matches_xla():
    endpoints, selectors, ep_idx, sel_idx = _setup(seed=7)
    wire = selector_wire_words_np(selectors)
    ref = np.asarray(
        etc1s_etc1_kernel(
            jnp.asarray(endpoints), jnp.asarray(wire),
            jnp.asarray(ep_idx.astype(np.int32)), jnp.asarray(sel_idx.astype(np.int32)),
        )
    )
    got = np.asarray(etc1s_etc1_pallas(endpoints, wire, ep_idx, sel_idx, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_etc1s_rgba_alpha_fused_pallas_matches_composed():
    """The fused RGB+alpha kernel equals rgba + alpha + merge bit-exactly."""
    from basisu_rs_tpu.ops.etc1s import etc1s_alpha_kernel
    from basisu_rs_tpu.ops.etc1s_pallas import etc1s_rgba_alpha_pallas

    endpoints, selectors, ep_idx, sel_idx = _setup(seed=8)
    _, _, a_ep, a_sel = _setup(seed=9)
    rgba = np.asarray(
        etc1s_rgba_kernel(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(ep_idx.astype(np.int32)), jnp.asarray(sel_idx.astype(np.int32)),
        )
    )
    a = np.asarray(
        etc1s_alpha_kernel(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(a_ep.astype(np.int32)), jnp.asarray(a_sel.astype(np.int32)),
        )
    )
    ref = (rgba & np.uint32(0x00FFFFFF)) | (a << np.uint32(24))
    got = np.asarray(
        etc1s_rgba_alpha_pallas(
            endpoints, selectors, ep_idx, sel_idx, a_ep, a_sel, interpret=True
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_sharded_etc1s_rgba_alpha_matches_composed():
    """kind='rgba_alpha' through the mesh (Pallas interpret + XLA backends)
    equals the composed single-device result."""
    from basisu_rs_tpu.ops.etc1s import etc1s_alpha_kernel
    from basisu_rs_tpu.parallel.mesh import make_mesh, sharded_etc1s_transcode

    endpoints, selectors, ep_idx, sel_idx = _setup(seed=10, n=700)
    _, _, a_ep, a_sel = _setup(seed=11, n=700)
    rgba = np.asarray(
        etc1s_rgba_kernel(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(ep_idx.astype(np.int32)), jnp.asarray(sel_idx.astype(np.int32)),
        )
    )
    a = np.asarray(
        etc1s_alpha_kernel(
            jnp.asarray(endpoints), jnp.asarray(selectors),
            jnp.asarray(a_ep.astype(np.int32)), jnp.asarray(a_sel.astype(np.int32)),
        )
    )
    ref = (rgba & np.uint32(0x00FFFFFF)) | (a << np.uint32(24))
    mesh = make_mesh(8)
    for kwargs in (
        dict(backend="pallas", interpret=True),
        dict(backend="xla"),
    ):
        got = sharded_etc1s_transcode(
            "rgba_alpha", endpoints, selectors, ep_idx, sel_idx, mesh,
            extra_idx=(a_ep, a_sel), **kwargs,
        )
        np.testing.assert_array_equal(got, ref)
