"""Golden block parity: UASTC -> RGBA32 against the reference corpus
(608 cases x 19 modes; reference: tests/transcode_uastc_block.rs)."""

import numpy as np

from basisu_rs_tpu.ops import transcode_blocks


def test_uastc_to_rgba_bit_exact(golden):
    out, err = transcode_blocks(golden["rgba_in"], "rgba")
    assert not err.any()
    expected = golden["rgba_out"]
    bad = np.nonzero(np.any(out != expected, axis=1))[0]
    if bad.size:
        i = bad[0]
        raise AssertionError(
            f"{bad.size}/{len(expected)} blocks mismatch; first bad idx {i} "
            f"mode {golden['rgba_mode'][i]}\n in: {golden['rgba_in'][i].tolist()}\n"
            f"got: {[hex(v) for v in out[i]]}\nexp: {[hex(v) for v in expected[i]]}"
        )
