"""ETC1S state-machine fuzz: randomized streams exercising every decoder
path (predictors 0-3, history buffer MTF, selector RLE + VLC, texture video)
against the encoder's decoder-simulation, on both front-ends."""

import numpy as np
import pytest

from basisu_rs_tpu.container.basis import make_etc1s_decoder, read_header, read_slice_descs
from basisu_rs_tpu.container.etc1s_frontend import Etc1sDecoder
from basisu_rs_tpu.container.writer import write_etc1s_basis_fuzz


def _codebooks(rng, e, s):
    endpoints = np.zeros((e, 4), np.uint8)
    endpoints[:, :3] = rng.integers(0, 32, (e, 3))
    endpoints[:, 3] = rng.integers(0, 8, e)
    selectors = rng.integers(0, 256, (s, 4)).astype(np.uint8)
    return endpoints, selectors


@pytest.mark.parametrize("seed,hist,video", [
    (0, 0, False),
    (1, 16, False),
    (2, 64, False),
    (3, 8, True),
    (4, 64, True),
    (5, 1, False),
])
def test_etc1s_state_machine_fuzz(seed, hist, video):
    rng = np.random.default_rng(100 + seed)
    e, s = int(rng.integers(2, 300)), int(rng.integers(2, 200))
    nbx, nby = int(rng.integers(1, 24)), int(rng.integers(1, 20))
    endpoints, selectors = _codebooks(rng, e, s)
    buf, exp_ep, exp_sel = write_etc1s_basis_fuzz(
        endpoints, selectors, nbx, nby, hist, seed=seed, is_video=video
    )
    h = read_header(buf)
    descs = read_slice_descs(buf, h)
    for use_native in (True, False):
        dec = Etc1sDecoder(
            h.total_endpoints, h.total_selectors,
            buf[h.endpoint_cb_file_ofs : h.endpoint_cb_file_ofs + h.endpoint_cb_file_size],
            buf[h.selector_cb_file_ofs : h.selector_cb_file_ofs + h.selector_cb_file_size],
            buf[h.tables_file_ofs : h.tables_file_ofs + h.tables_file_size],
            is_video=video,
            use_native=use_native,
        )
        sl = dec.decode_slice(nbx, nby, descs[0].data(buf))
        np.testing.assert_array_equal(sl.endpoint_index, exp_ep, err_msg=f"native={use_native}")
        np.testing.assert_array_equal(sl.selector_index, exp_sel, err_msg=f"native={use_native}")
        np.testing.assert_array_equal(dec.endpoints, endpoints)
        np.testing.assert_array_equal(dec.selectors, selectors)
