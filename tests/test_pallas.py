"""Pallas kernel parity for the FULL 5x19 (target, mode) matrix.

Interpreter mode, hermetic on CPU (the persistent jit cache keeps reruns
cheap).  On real TPU hardware the same kernels compile via Mosaic;
tests/test_tpu_hardware.py runs the on-hardware half when pointed at a chip.
Reference analog: tests/transcode_uastc_block.rs:35-78 runs every mode for
every target.
"""

import numpy as np
import pytest

from basisu_rs_tpu.ops.bits import bytes_from_lanes_np, lanes_from_bytes_np
from basisu_rs_tpu.ops.dispatch import block_modes
from basisu_rs_tpu.ops.pallas_kernels import pallas_mode_kernel

TARGETS = ("bc7", "rgba", "astc", "etc1", "etc2")
ALL_PAIRS = [(t, m) for t in TARGETS for m in range(19)]


@pytest.mark.parametrize("target,mode", ALL_PAIRS)
def test_pallas_interpret_matches_golden(golden, target, mode):
    modes = block_modes(golden[f"{target}_in"])
    idx = np.nonzero(modes == mode)[0][:8]
    assert len(idx) > 0, f"golden corpus has no mode-{mode} blocks"
    lanes = lanes_from_bytes_np(golden[f"{target}_in"][idx], 4)
    out, err = pallas_mode_kernel(target, mode, rows=8, interpret=True)(lanes)
    assert not np.asarray(err).any()
    out = np.asarray(out)
    expected = golden[f"{target}_out"][idx]
    if target == "rgba":
        np.testing.assert_array_equal(out, expected)
    else:
        np.testing.assert_array_equal(bytes_from_lanes_np(out), expected)
