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


def lane_shape(lanes):
    """Batch shape of a lane bundle: `uint32[..., W]` array or tuple of W
    same-shaped arrays (the Pallas kernels pass per-word refs)."""
    if isinstance(lanes, (list, tuple)):
        return lanes[0].shape
    return lanes.shape[:-1]


def lane_count(lanes) -> int:
    if isinstance(lanes, (list, tuple)):
        return len(lanes)
    return lanes.shape[-1]


def lane(lanes, w: int):
    if isinstance(lanes, (list, tuple)):
        return lanes[w]
    return lanes[..., w]


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
    return out.reshape(lanes.shape[0], 4 * lanes.shape[1])


def extract(lanes, offset: int, count: int):
    """Static-offset extract of `count` bits at `offset`. lanes: uint32[..., W]
    array or tuple of W same-shaped uint32 arrays."""
    assert 0 <= count <= 32
    if count == 0:
        return jnp.zeros(lane_shape(lanes), U32)
    W = lane_count(lanes)
    w, b = offset // 32, offset % 32
    lo = lane(lanes, w) if w < W else jnp.zeros(lane_shape(lanes), U32)
    val = lo >> U32(b)
    if b + count > 32 and w + 1 < W:
        val = val | (lane(lanes, w + 1) << U32(32 - b))
    if count < 32:
        val = val & U32(mask(count))
    return val


def extract_dyn(lanes, offset, count: int, bit_range=None):
    """Dynamic-offset extract: `offset` is a traced int32/uint32 array
    broadcastable to the lane batch shape. `count` static, <= 32.

    bit_range=(lo, hi): static bounds on the offset value (hi exclusive of
    the last read bit).  Anchor-induced offset variation is only a few bits,
    so the touched words are usually 1-2 of the 4 - the hint prunes the
    word-select chain accordingly."""
    assert 0 < count <= 32
    W = lane_count(lanes)
    if bit_range is not None:
        wlo = max(bit_range[0] // 32, 0)
        whi = min((bit_range[1] + count - 1) // 32, W - 1)
    else:
        wlo, whi = 0, W - 1
    offset = offset.astype(U32)
    w = offset >> U32(5)
    b = offset & U32(31)
    zero = jnp.zeros(jnp.broadcast_shapes(lane_shape(lanes), w.shape), U32)
    if wlo == whi:
        lo = lane(lanes, wlo)
        hi = lane(lanes, wlo + 1) if wlo + 1 < W else zero
    else:
        lo = zero
        hi = zero
        for k in range(wlo, min(whi + 1, W)):
            lk = lane(lanes, k)
            lo = jnp.where(w == k, lk, lo)
        for k in range(wlo + 1, min(whi + 2, W)):
            hi = jnp.where(w == k - 1, lane(lanes, k), hi)
    val = (lo >> b) | jnp.where(b == 0, U32(0), hi << ((U32(32) - b) & U32(31)))
    if count < 32:
        val = val & U32(mask(count))
    return val


def extract_bit_dyn(lanes, offset, bit_range):
    """Single dynamic bit as uint32 0/1.  A 1-bit read never straddles a
    word, so the funnel half of extract_dyn drops away: word-select within
    the static bit_range, one variable shift, one AND."""
    wlo, whi = bit_range[0] // 32, (bit_range[1] - 1) // 32
    offset = offset.astype(U32)
    v = lane(lanes, wlo)
    if whi > wlo:
        w = offset >> U32(5)
        for k in range(wlo + 1, whi + 1):
            v = jnp.where(w == k, lane(lanes, k), v)
    return (v >> (offset & U32(31))) & U32(1)


class LaneWriter:
    """OR-accumulates bit fields into W uint32 output lanes.

    Mirrors BitWriterLsb semantics; `rev` deposits mirror BitWriterMsbRevBytes'
    `write_u*_rev_bits` (astc.rs weight emission): the value's low `count` bits
    are bit-reversed and the field placed at [end - count, end) growing
    downward from `end`.
    """

    def __init__(self, shape, word_count: int):
        self.W = word_count
        self.shape = shape
        # lanes materialize lazily: the first deposit into a word IS the
        # word (no OR against an initial zeros plane), and constant bits
        # accumulate in a Python int per word (put_const), folded in with
        # ONE scalar OR per touched word when .lanes is read.
        self._lanes = [None] * word_count
        self._const = [0] * word_count

    @property
    def lanes(self):
        out = []
        for l, c in zip(self._lanes, self._const):
            if l is None:
                out.append(
                    jnp.full(self.shape, c, U32) if c else jnp.zeros(self.shape, U32)
                )
            else:
                out.append(l | U32(c) if c else l)
        return out

    def _or(self, w: int, expr) -> None:
        self._lanes[w] = expr if self._lanes[w] is None else self._lanes[w] | expr

    # -- static offset ------------------------------------------------------
    def put(self, value, offset: int, count: int) -> None:
        if count == 0:
            return
        assert count <= 32
        value = value.astype(U32) & U32(mask(count)) if count < 32 else value.astype(U32)
        w, b = offset // 32, offset % 32
        if w < self.W:
            self._or(w, value << U32(b))
        if b + count > 32 and w + 1 < self.W:
            self._or(w + 1, value >> U32(32 - b))

    def put_const(self, value: int, offset: int, count: int) -> None:
        """Static bits at a static offset: zero traced ops per call - the
        bits land in the per-word Python accumulator (mode/markers/constant
        weights used to cost a jnp.full + shift + OR each)."""
        if count == 0:
            return
        assert count <= 32
        value &= mask(count) if count < 32 else 0xFFFFFFFF
        w, b = offset // 32, offset % 32
        if w < self.W:
            self._const[w] |= (value << b) & 0xFFFFFFFF
        if b + count > 32 and w + 1 < self.W:
            self._const[w + 1] |= value >> (32 - b)

    # -- dynamic offset -----------------------------------------------------
    def put_dyn(self, value, offset, count: int, bit_range=None) -> None:
        """bit_range=(lo, hi): static bounds on `offset` (see extract_dyn)."""
        assert 0 < count <= 32
        if bit_range is not None:
            wlo = max(bit_range[0] // 32, 0)
            whi = min((bit_range[1] + count - 1) // 32, self.W - 1)
        else:
            wlo, whi = 0, self.W - 1
        value = value.astype(U32) & U32(mask(count)) if count < 32 else value.astype(U32)
        offset = offset.astype(U32)
        w = offset >> U32(5)
        b = offset & U32(31)
        lo = value << b
        hi = jnp.where(b == 0, U32(0), value >> ((U32(32) - b) & U32(31)))
        if wlo == whi:
            self._or(wlo, lo)
            if wlo + 1 < self.W:
                self._or(wlo + 1, hi)
            return
        for k in range(wlo, min(whi + 1, self.W)):
            self._or(k, jnp.where(w == k, lo, U32(0)))
        for k in range(wlo + 1, min(whi + 2, self.W)):
            self._or(k, jnp.where(w == k - 1, hi, U32(0)))

    def stack(self):
        return jnp.stack(self.lanes, axis=-1)


def bitrev(value, count: int):
    """Reverse the low `count` bits of `value` (count static, <= 8).
    High bits of `value` are ignored.  Closed per-count forms: the generic
    per-bit loop costs 4 ops/bit, which dominated ASTC weight emission
    (16-32 reversals per block)."""
    v = value
    if count == 1:
        return v & U32(1)
    if count == 2:
        return ((v & U32(1)) << U32(1)) | ((v >> U32(1)) & U32(1))
    if count == 3:
        return ((v & U32(1)) << U32(2)) | (v & U32(2)) | ((v >> U32(2)) & U32(1))
    if count == 4:
        return (
            ((v & U32(1)) << U32(3))
            | ((v & U32(2)) << U32(1))
            | ((v >> U32(1)) & U32(2))
            | ((v >> U32(3)) & U32(1))
        )
    if count == 5:
        return (
            ((v & U32(1)) << U32(4))
            | ((v & U32(2)) << U32(2))
            | (v & U32(4))
            | ((v >> U32(2)) & U32(2))
            | ((v >> U32(4)) & U32(1))
        )
    out = jnp.zeros_like(value)
    for i in range(count):
        out = out | (((value >> U32(i)) & U32(1)) << U32(count - 1 - i))
    return out


# ---------------------------------------------------------------------------
# Constant-table lookups, shared by the XLA and Pallas paths.
#
# XLA path: a plain jnp.take of the constant (XLA folds it into the module).
# Pallas path: Mosaic rejects captured array constants and only lowers
# exactly-128-lane `take_along_axis` gathers, so tables are (1) collected
# during an abstract pre-trace, (2) passed to the kernel as real VMEM inputs
# padded to 128-lane chunks, and (3) gathered chunk-by-chunk with a select
# across chunks.  `lut_lookup` switches behavior based on the active mode.
# ---------------------------------------------------------------------------

_TABLE_MODE = None  # None | ("collect", dict) | ("provide", dict)


def _canonical_table(table_np):
    import numpy as np

    a = np.ascontiguousarray(table_np)
    if a.dtype != np.float32:
        a = a.astype(np.int64).astype(np.int32)  # preserves low 32 bits
    return a


def table_key(table_np):
    a = _canonical_table(table_np)
    return (a.tobytes(), str(a.dtype), a.shape)


class table_mode:
    """Context manager activating collect/provide mode (trace-time only)."""

    def __init__(self, mode, store):
        self.state = (mode, store)

    def __enter__(self):
        global _TABLE_MODE
        self.prev = _TABLE_MODE
        _TABLE_MODE = self.state

    def __exit__(self, *exc):
        global _TABLE_MODE
        _TABLE_MODE = self.prev


def pad_table_for_kernel(table_np):
    """[L] table -> [ceil(L/128), 128] array suitable as a VMEM input.

    Chunks live on rows: Mosaic lowers row slices of a VMEM array fine but
    rejects column slices at lane offsets."""
    import numpy as np

    a = _canonical_table(table_np)
    assert a.ndim == 1
    pad = (-len(a)) % 128
    if pad:
        a = np.concatenate([a, np.zeros(pad, a.dtype)])
    return a.reshape(-1, 128)


def gather_chunked(loaded, idx):
    """Gather loaded[idx] where `loaded` is a [chunks, 128] traced array
    (runtime table, e.g. an ETC1S codebook) and idx is a 2-D integer array.
    Uses the only gather shape Mosaic lowers: exactly-128-lane
    take_along_axis, with a select across chunk rows."""
    idx = idx.astype(jnp.int32)
    chunks = loaded.shape[0]
    within = idx & 127
    # promise_in_bounds: `within` is masked to [0, 128), so take_along_axis's
    # default negative-wrap + out-of-bounds-fill normalization (lt/add/eq/
    # select per take) is dead code - skipping it emits the bare gather,
    # which is the exact shape Mosaic lowers.
    out = jnp.take_along_axis(
        jnp.broadcast_to(loaded[0:1], idx.shape), within, axis=1,
        mode="promise_in_bounds",
    )
    if chunks > 1:
        hi = idx >> 7  # hoisted: one shift serves all chunk-select compares
    for c in range(1, chunks):
        val = jnp.take_along_axis(
            jnp.broadcast_to(loaded[c : c + 1], idx.shape), within, axis=1,
            mode="promise_in_bounds",
        )
        out = jnp.where(hi == c, val, out)
    return out


def lut_lookup(table_np, idx):
    """table_np: small constant 1-D numpy array; idx: traced integer array.
    Returns int32 (integer tables) or float32 values."""
    import numpy as np

    mode = _TABLE_MODE
    idx = idx.astype(jnp.int32)
    if mode is None or mode[0] == "collect":
        if mode is not None:
            mode[1].setdefault(table_key(table_np), table_np)
        return jnp.take(jnp.asarray(_canonical_table(table_np)), idx, axis=0)

    loaded = mode[1][table_key(table_np)]  # [chunks, 128] kernel input
    return gather_chunked(loaded, idx)


# fl(2^-16 / (1 - 2^-16)), IEEE single: the relative correction that turns
# x*257*2^-16 = x*257/65536 into x*257/65535 = x/255.
_DIV255_K = float.fromhex("0x1.0001p-16")


def fl_div255(x):
    """IEEE-single fl(x/255) for integer tensors x in 0..255, gather-free.

    TPU f32 division is 1 ulp off IEEE (see CLAUDE.md), so the reference's
    `v as f32 / 255.` (e.g. bc7.rs:422-427) can't use a device divide.  The
    LUT alternative costs a 2-chunk gather per byte; this is pure VPU math:

        y0 = (x * 257) * 2^-16          exact (product <= 2^24, pow2 scale)
        fl(x/255) = fl(y0 + fl(y0*K))   K = fl(2^-16/(1-2^-16))

    y0*(1+K_true) = x/255 exactly; the two roundings land within 2^-40*y0 of
    x/255 while no x/255 sits closer than ~2^-33 relative to an f32 rounding
    boundary, so the final rounding is the division's (exhaustively pinned
    for all 256 inputs and both FMA contraction orders by
    tests/test_tables.py, and per-backend by tests/test_pbits.py).

    XLA's algebraic simplifier factors `y0 + y0*K` into one multiply by a
    runtime-summed constant (observed on the TPU backend), which double-
    rounds; an optimization_barrier on the correction term blocks the
    rewrite.  Mosaic can't lower the barrier - and doesn't need it: it
    performs no such reassociation (pinned on hardware by
    tests/test_tpu_hardware.py)."""
    from jax import lax

    # one multiply: 257*2^-16 is exactly representable (1.00000001b * 2^-8)
    # and x*257 <= 65535 < 2^24, so fl(x * fl(257*2^-16)) == x*257*2^-16
    # exactly - same y0 as the two-step (x*257)*2^-16 form
    y0 = x.astype(jnp.float32) * jnp.float32(257.0 * 2.0**-16)
    c = y0 * jnp.float32(_DIV255_K)
    if _TABLE_MODE is None or _TABLE_MODE[0] == "collect":
        c = lax.optimization_barrier(c)
    return y0 + c

