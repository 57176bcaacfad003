"""Vectorized bit-field access over batches of 128-bit blocks.

A batch of N blocks is a `uint32[N, W]` tensor of little-endian words (W=4 for
16-byte blocks, W=2 for 8-byte ETC1 blocks).  These helpers replace the
reference's sequential bit reader/writers (src/bitreader.rs, src/bitwriter.rs)
with branchless lane arithmetic: *static* offsets (known at trace time, the
common case once kernels are specialized per UASTC mode) compile to plain
shifts, while *dynamic* offsets (pattern-dependent weight positions) use a
4-way word select + funnel shift.

Semantics match the reference bit-exactly:
  - reads past the end of the block return zero bits (bitreader.rs:45,55)
  - writes past the end are dropped (bitwriter.rs:34)
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def mask(count: int) -> int:
    return (1 << count) - 1


def lanes_from_bytes_np(blocks_u8, word_count: int):
    """numpy uint8 [N, word_count*4] -> uint32 [N, word_count] (host helper)."""
    import numpy as np

    b = np.asarray(blocks_u8, np.uint8).reshape(-1, word_count, 4).astype(np.uint32)
    return (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)).astype(np.uint32)


def bytes_from_lanes_np(lanes):
    """numpy uint32 [N, W] -> uint8 [N, W*4] (host helper)."""
    import numpy as np

    lanes = np.asarray(lanes, np.uint32)
    out = np.empty(lanes.shape + (4,), np.uint8)
    for k in range(4):
        out[..., k] = (lanes >> (8 * k)) & 0xFF
    return out.reshape(lanes.shape[0], -1)


def extract(lanes, offset: int, count: int):
    """Static-offset extract of `count` bits at `offset`. lanes: uint32[..., W]."""
    assert 0 <= count <= 32
    if count == 0:
        return jnp.zeros(lanes.shape[:-1], U32)
    W = lanes.shape[-1]
    w, b = offset // 32, offset % 32
    lo = lanes[..., w] if w < W else jnp.zeros(lanes.shape[:-1], U32)
    val = lo >> U32(b)
    if b + count > 32 and w + 1 < W:
        val = val | (lanes[..., w + 1] << U32(32 - b))
    if count < 32:
        val = val & U32(mask(count))
    return val


def extract_dyn(lanes, offset, count: int):
    """Dynamic-offset extract: `offset` is a traced int32/uint32 array
    broadcastable to lanes.shape[:-1]. `count` static, <= 32."""
    assert 0 < count <= 32
    W = lanes.shape[-1]
    offset = offset.astype(U32)
    w = offset >> U32(5)
    b = offset & U32(31)
    zero = jnp.zeros(jnp.broadcast_shapes(lanes.shape[:-1], w.shape), U32)
    lo = zero
    hi = zero
    for k in range(W):
        lane = lanes[..., k]
        lo = jnp.where(w == k, lane, lo)
        if k >= 1:
            hi = jnp.where(w == k - 1, lane, hi)
    val = (lo >> b) | jnp.where(b == 0, U32(0), hi << ((U32(32) - b) & U32(31)))
    if count < 32:
        val = val & U32(mask(count))
    return val


class LaneWriter:
    """OR-accumulates bit fields into W uint32 output lanes.

    Mirrors BitWriterLsb semantics; `rev` deposits mirror BitWriterMsbRevBytes'
    `write_u*_rev_bits` (astc.rs weight emission): the value's low `count` bits
    are bit-reversed and the field placed at [end - count, end) growing
    downward from `end`.
    """

    def __init__(self, shape, word_count: int):
        self.W = word_count
        self.lanes = [jnp.zeros(shape, U32) for _ in range(word_count)]

    # -- static offset ------------------------------------------------------
    def put(self, value, offset: int, count: int) -> None:
        if count == 0:
            return
        assert count <= 32
        value = value.astype(U32) & U32(mask(count)) if count < 32 else value.astype(U32)
        w, b = offset // 32, offset % 32
        if w < self.W:
            self.lanes[w] = self.lanes[w] | (value << U32(b))
        if b + count > 32 and w + 1 < self.W:
            self.lanes[w + 1] = self.lanes[w + 1] | (value >> U32(32 - b))

    # -- dynamic offset -----------------------------------------------------
    def put_dyn(self, value, offset, count: int) -> None:
        assert 0 < count <= 32
        value = value.astype(U32) & U32(mask(count)) if count < 32 else value.astype(U32)
        offset = offset.astype(U32)
        w = offset >> U32(5)
        b = offset & U32(31)
        lo = value << b
        hi = jnp.where(b == 0, U32(0), value >> ((U32(32) - b) & U32(31)))
        for k in range(self.W):
            self.lanes[k] = self.lanes[k] | jnp.where(w == k, lo, U32(0))
            if k >= 1:
                self.lanes[k] = self.lanes[k] | jnp.where(w == k - 1, hi, U32(0))

    def stack(self):
        return jnp.stack(self.lanes, axis=-1)


def bitrev(value, count: int):
    """Reverse the low `count` bits of `value` (count static, <= 8)."""
    out = jnp.zeros_like(value)
    for i in range(count):
        out = out | (((value >> U32(i)) & U32(1)) << U32(count - 1 - i))
    return out


def select_lut(index, table_np):
    """Lookup `table_np` (small 1-D numpy constant) at traced `index`.

    jnp.take lowers to an XLA gather; for tiny tables XLA/Mosaic handle this
    well, and it keeps a single implementation shared by the XLA and Pallas
    paths (Mosaic supports dynamic gathers from VMEM-resident constants).
    """
    return jnp.take(jnp.asarray(table_np), index, axis=0)
