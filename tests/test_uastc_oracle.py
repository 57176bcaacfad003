"""Randomized differential fuzz of the UASTC -> RGBA kernels against the
reference-transcribed oracle (tests/oracle_uastc.py).

The committed golden corpus pins 32 blocks per mode; random blocks cover the
field combinations those 32 can't (all BISE trit/quint group remainders,
anchor-weight positions, pattern indices, compsel values, invalid patterns).
Reference loop being mirrored: decode_block_to_rgba
(/root/reference/src/uastc.rs:237-327) over arbitrary block bytes.
"""

import numpy as np
import pytest

from basisu_rs_tpu.ops import transcode_blocks

from oracle_uastc import OracleUastcError, decode_block_to_rgba, mode_code_bits


def _oracle_words(block: bytes):
    """-> (uint32[16] packed LE RGBA words, None) or (None, error message)."""
    try:
        texels = decode_block_to_rgba(block)
    except OracleUastcError as e:
        return None, str(e)
    return (
        np.array(
            [r | (g << 8) | (b << 16) | (a << 24) for (r, g, b, a) in texels],
            np.uint32,
        ),
        None,
    )


def _check_against_oracle(blocks: np.ndarray):
    out, err = transcode_blocks(blocks, "rgba")
    for i in range(len(blocks)):
        words, msg = _oracle_words(bytes(blocks[i]))
        if msg is not None:
            assert err[i], f"block {i}: oracle errors ({msg}) but kernel did not"
        else:
            assert not err[i], f"block {i}: kernel errors but oracle decodes"
            np.testing.assert_array_equal(
                out[i],
                words,
                err_msg=f"block {i} bytes {blocks[i].tolist()}",
            )


def test_uniform_random_blocks_match_oracle():
    """Uniform random bytes: every mode (valid and invalid) in ratio of its
    MODE_LUT share; errors must agree exactly with the oracle's Err sites."""
    rng = np.random.default_rng(0xBA515)
    blocks = rng.integers(0, 256, size=(2048, 16), dtype=np.uint8)
    _check_against_oracle(blocks)


@pytest.mark.parametrize("mode_id", range(19))
def test_per_mode_random_blocks_match_oracle(mode_id):
    """Dense per-mode coverage: random payload bits under a forced mode code
    (a code whose every 7-bit extension maps to the mode)."""
    rng = np.random.default_rng(0xC0DE + mode_id)
    blocks = rng.integers(0, 256, size=(512, 16), dtype=np.uint8)
    code, code_size = mode_code_bits(mode_id)
    keep = 0xFF & ~((1 << min(code_size, 8)) - 1)
    blocks[:, 0] = (blocks[:, 0] & keep) | (code & 0xFF)
    _check_against_oracle(blocks)
