"""Multi-chip sharding: the sharded transcode step on a virtual 8-device CPU
mesh must agree bit-for-bit with the single-device path."""

import numpy as np

import jax

from basisu_rs_tpu.ops import transcode_blocks
from basisu_rs_tpu.ops.bits import bytes_from_lanes_np, lanes_from_bytes_np
from basisu_rs_tpu.parallel.mesh import make_mesh, shard_blocks, sharded_transcode_step


def test_sharded_step_matches_single_device(golden):
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh(8)
    step = sharded_transcode_step("bc7", mesh)

    blocks = golden["bc7_in"][:256]
    lanes = lanes_from_bytes_np(blocks, 4)
    out, err_count = step(shard_blocks(lanes, mesh))
    assert int(err_count) == 0

    expected, err = transcode_blocks(blocks, "bc7")
    assert not err.any()
    got = bytes_from_lanes_np(np.asarray(out)[: len(blocks)])
    np.testing.assert_array_equal(got, expected)


def test_sharded_step_counts_errors(golden):
    mesh = make_mesh(8)
    step = sharded_transcode_step("rgba", mesh)
    blocks = golden["rgba_in"][:64].copy()
    blocks[3, 0] = 69  # MODE_LUT entry 19 -> invalid mode
    blocks[10, 0] = 69
    lanes = lanes_from_bytes_np(blocks, 4)
    _, err_count = step(shard_blocks(lanes, mesh))
    assert int(err_count) == 2
