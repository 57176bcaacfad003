"""Exhaustive-ish bit I/O property tests.

Mirrors the reference's tier-1 strategy (bitreader.rs:63-99,
bitwriter.rs:118-225: pattern sweeps over offsets x lengths) against an
independent big-int oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from basisu_rs_tpu.ops.bits import (
    LaneWriter,
    bitrev,
    bytes_from_lanes_np,
    extract,
    extract_dyn,
    lanes_from_bytes_np,
    mask,
)


def patterns():
    """16 test patterns: alternating bits with segments inverted."""
    base = 0x5555_5555_5555_5555_5555_5555_5555_5555
    out = []
    for i in range(16):
        xor = 0
        for seg in range(4):
            if (i >> seg) & 1:
                xor |= ((1 << 32) - 1) << (32 * seg)
        out.append(base ^ xor)
    return out


def int_to_lanes(v: int) -> np.ndarray:
    return np.array([[(v >> (32 * k)) & 0xFFFFFFFF for k in range(4)]], np.uint32)


@pytest.mark.parametrize("count", [1, 3, 5, 8, 13, 21, 32])
def test_extract_static_matches_oracle(count):
    for p in patterns():
        lanes = jnp.asarray(int_to_lanes(p))
        for offset in range(0, 128 - count + 1, 7):
            got = int(extract(lanes, offset, count)[0])
            assert got == (p >> offset) & mask(count), (offset, count)


def test_extract_past_end_returns_zero_bits():
    # reads beyond bit 128 yield zeros (bitreader.rs:45,55)
    p = (1 << 128) - 1
    lanes = jnp.asarray(int_to_lanes(p))
    assert int(extract(lanes, 120, 8)[0]) == 0xFF
    got = int(extract_dyn(lanes, jnp.array([126]), 8)[0])
    assert got == 0b11  # two real bits, six zeros


@pytest.mark.parametrize("count", [1, 4, 5, 7, 8])
def test_extract_dyn_matches_static(count):
    ps = patterns()
    lanes = jnp.asarray(np.concatenate([int_to_lanes(p) for p in ps], axis=0))
    for offset in range(0, 128 - count + 1, 3):
        offs = jnp.full((len(ps),), offset, jnp.int32)
        d = np.asarray(extract_dyn(lanes, offs, count))
        s = np.asarray(extract(lanes, offset, count))
        np.testing.assert_array_equal(d, s)


def test_extract_bit_dyn_matches_static():
    """extract_bit_dyn == extract(., ., 1) for every offset, under every
    bit_range that contains it (the range only prunes word selects)."""
    from basisu_rs_tpu.ops.bits import extract_bit_dyn

    ps = patterns()
    lanes = jnp.asarray(np.concatenate([int_to_lanes(p) for p in ps], axis=0))
    for offset in range(0, 128, 7):
        s = np.asarray(extract(lanes, offset, 1))
        for lo, hi in ((offset, offset + 1), (0, 128), (max(0, offset - 31), min(128, offset + 32))):
            offs = jnp.full((len(ps),), offset, jnp.int32)
            d = np.asarray(extract_bit_dyn(lanes, offs, (lo, hi)))
            np.testing.assert_array_equal(d, s, err_msg=f"offset={offset} range=({lo},{hi})")


def test_writer_static_and_dyn_agree_with_oracle():
    rng = np.random.default_rng(0)
    for _ in range(20):
        fields = []
        ofs = 0
        while ofs < 120:
            count = int(rng.integers(1, 9))
            if ofs + count > 128:
                break
            fields.append((ofs, count, int(rng.integers(0, 1 << count))))
            ofs += count
        expected = 0
        for o, c, v in fields:
            expected |= v << o

        w1 = LaneWriter((1,), 4)
        w2 = LaneWriter((1,), 4)
        for o, c, v in fields:
            w1.put(jnp.full((1,), v, jnp.uint32), o, c)
            w2.put_dyn(jnp.full((1,), v, jnp.uint32), jnp.full((1,), o, jnp.int32), c)
        for w in (w1, w2):
            lanes = np.asarray(w.stack())
            got = sum(int(lanes[0, k]) << (32 * k) for k in range(4))
            assert got == expected


def test_bitrev():
    v = jnp.asarray(np.array([0b10110], np.uint32))
    assert int(bitrev(v, 5)[0]) == 0b01101


def test_bitrev_closed_forms_exhaustive():
    """The per-count closed forms (batch 4) equal the generic per-bit loop
    for every 8-bit input and every count 1..8 - including inputs with
    garbage bits above `count`, which both forms must ignore."""
    v = jnp.asarray(np.arange(256, dtype=np.uint32))
    for count in range(1, 9):
        ref = np.zeros(256, np.uint32)
        for i in range(count):
            ref |= (((np.arange(256) >> i) & 1) << (count - 1 - i)).astype(np.uint32)
        np.testing.assert_array_equal(np.asarray(bitrev(v, count)), ref, err_msg=f"count={count}")


def test_lane_byte_round_trip():
    rng = np.random.default_rng(1)
    b = rng.integers(0, 256, size=(5, 16), dtype=np.uint8)
    lanes = lanes_from_bytes_np(b, 4)
    np.testing.assert_array_equal(bytes_from_lanes_np(lanes), b)


def test_gather_chunked_matches_numpy():
    """gather_chunked == table[idx] for 1..N-chunk tables, including the
    chunk-boundary indices (0, 127, 128, last) the promise-in-bounds takes
    must still handle exactly (indices are in-bounds by construction; the
    rewrite dropped take_along_axis's wrap/fill normalization)."""
    from basisu_rs_tpu.ops.bits import gather_chunked

    rng = np.random.default_rng(7)
    for chunks in (1, 2, 3, 16):
        table = rng.integers(0, 1 << 32, size=(chunks, 128), dtype=np.uint64)
        table = table.astype(np.uint32)
        hi = chunks * 128 - 1
        idx = rng.integers(0, chunks * 128, size=(4, 128), dtype=np.int64)
        idx[0, :4] = [0, 127, min(128, hi), hi]
        idx = idx.astype(np.int32)
        got = np.asarray(gather_chunked(jnp.asarray(table), jnp.asarray(idx)))
        np.testing.assert_array_equal(
            got, table.reshape(-1)[idx], err_msg=f"chunks={chunks}"
        )
