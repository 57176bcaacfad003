"""Golden block parity: UASTC -> BC7 (the north-star path)."""

import numpy as np

from basisu_rs_tpu.ops import transcode_blocks


def test_uastc_to_bc7_bit_exact(golden):
    out, err = transcode_blocks(golden["bc7_in"], "bc7")
    assert not err.any()
    expected = golden["bc7_out"]
    bad = np.nonzero(np.any(out != expected, axis=1))[0]
    if bad.size:
        i = bad[0]
        raise AssertionError(
            f"{bad.size}/{len(expected)} blocks mismatch; first bad idx {i} "
            f"mode {golden['bc7_mode'][i]}\n in: {golden['bc7_in'][i].tolist()}\n"
            f"got: {out[i].tolist()}\nexp: {expected[i].tolist()}"
        )
