"""Test-only UASTC oracle: an independent transcription of the reference's
UASTC -> RGBA block decoder, used to differential-fuzz the vectorized kernels
over RANDOM blocks (the committed golden corpus covers only 32 blocks per
mode; this closes the field-combination gap).

Transcribed line-by-line from:
  - /root/reference/src/bitreader.rs                 (_OBitReader)
  - /root/reference/src/uastc.rs:237-341             (decode_block_to_rgba,
    decode_mode, decode_compsel, decode_pattern_index, get_pattern)
  - /root/reference/src/uastc.rs:378-394             (anchors, mode 8)
  - /root/reference/src/uastc.rs:585-740             (BISE endpoint decode /
    unquant, weight decode / unquant)
  - /root/reference/src/uastc.rs:176-235             (endpoint pair assembly,
    astc_interpolate)
  - /root/reference/src/uastc.rs:527-577,742-811     (MODES, MODE_LUT,
    patterns, anchors)
  - /root/reference/src/target_formats/astc.rs:300-331 (BISE_RANGES)

This module deliberately shares NO code with basisu_rs_tpu (no imports from
the package): it is a second, naive, sequential implementation whose value is
exactly its independence.  Do not refactor it to reuse package helpers.
"""

from __future__ import annotations


class OracleUastcError(Exception):
    """Mirrors the reference's Err(String) sites in the RGBA decode path."""


# -- bitreader.rs ------------------------------------------------------------


class _OBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.bit_pos = 0

    def peek(self, count: int) -> int:
        assert count <= 32
        byte = self.bit_pos // 8
        bit = self.bit_pos % 8
        result = (self.data[byte] if byte < len(self.data) else 0) >> bit
        read = 8 - bit
        byte += 1
        while read < count:
            result |= (self.data[byte] if byte < len(self.data) else 0) << read
            read += 8
            byte += 1
        return result & ((1 << count) - 1)

    def remove(self, count: int) -> None:
        self.bit_pos += count

    def read(self, count: int) -> int:
        v = self.peek(count)
        self.remove(count)
        return v


# -- uastc.rs:527-557 MODES --------------------------------------------------
# (id, code_size, endpoint_range_index, format, weight_bits, plane_count,
#  subset_count, trans_flags_bits); format: 0=RGB, 1=RGBA, 2=LA

_RGB, _RGBA, _LA = 0, 1, 2

_MODES = [
    (0, 4, 19, _RGB, 4, 1, 1, 15),
    (1, 6, 20, _RGB, 2, 1, 1, 15),
    (2, 5, 8, _RGB, 3, 1, 2, 15),
    (3, 5, 7, _RGB, 2, 1, 3, 15),
    (4, 5, 12, _RGB, 2, 1, 2, 15),
    (5, 5, 20, _RGB, 3, 1, 1, 15),
    (6, 5, 18, _RGB, 2, 2, 1, 15),
    (7, 5, 12, _RGB, 2, 1, 2, 15),
    (8, 5, 0, _RGBA, 0, 1, 1, 0),
    (9, 5, 8, _RGBA, 2, 1, 2, 23),
    (10, 3, 13, _RGBA, 4, 1, 1, 17),
    (11, 2, 13, _RGBA, 2, 2, 1, 17),
    (12, 3, 19, _RGBA, 3, 1, 1, 17),
    (13, 5, 20, _RGBA, 1, 2, 1, 23),
    (14, 5, 20, _RGBA, 2, 1, 1, 23),
    (15, 7, 20, _LA, 4, 1, 1, 23),
    (16, 6, 20, _LA, 2, 1, 2, 23),
    (17, 6, 20, _LA, 2, 2, 1, 23),
    (18, 4, 11, _RGB, 5, 1, 1, 15),
]

# uastc.rs:559-577
_MODE_LUT = [
    11, 0, 10, 3, 11, 15, 12, 7,
    11, 18, 10, 5, 11, 14, 12, 9,
    11, 0, 10, 4, 11, 16, 12, 8,
    11, 18, 10, 6, 11, 2, 12, 13,
    11, 0, 10, 3, 11, 17, 12, 7,
    11, 18, 10, 5, 11, 14, 12, 9,
    11, 0, 10, 4, 11, 1, 12, 8,
    11, 18, 10, 6, 11, 2, 12, 13,
    11, 0, 10, 3, 11, 19, 12, 7,
    11, 18, 10, 5, 11, 14, 12, 9,
    11, 0, 10, 4, 11, 16, 12, 8,
    11, 18, 10, 6, 11, 2, 12, 13,
    11, 0, 10, 3, 11, 17, 12, 7,
    11, 18, 10, 5, 11, 14, 12, 9,
    11, 0, 10, 4, 11, 1, 12, 8,
    11, 18, 10, 6, 11, 2, 12, 13,
]

# astc.rs:309-331 BISE_RANGES: (bits, trits, quints, deq_b, deq_c)
_BISE_RANGES = [
    (1, 0, 0, "         ", 0),
    (0, 1, 0, "         ", 0),
    (2, 0, 0, "         ", 0),
    (0, 0, 1, "         ", 0),
    (1, 1, 0, "000000000", 204),
    (3, 0, 0, "         ", 0),
    (1, 0, 1, "000000000", 113),
    (2, 1, 0, "b000b0bb0", 93),
    (4, 0, 0, "         ", 0),
    (2, 0, 1, "b0000bb00", 54),
    (3, 1, 0, "cb000cbcb", 44),
    (5, 0, 0, "         ", 0),
    (3, 0, 1, "cb0000cbc", 26),
    (4, 1, 0, "dcb000dcb", 22),
    (6, 0, 0, "         ", 0),
    (4, 0, 1, "dcb0000dc", 13),
    (5, 1, 0, "edcb000ed", 11),
    (7, 0, 0, "         ", 0),
    (5, 0, 1, "edcb0000e", 6),
    (6, 1, 0, "fedcb000f", 5),
    (8, 0, 0, "         ", 0),
]

# uastc.rs:742-811 pattern and anchor tables
_PATTERNS_2 = [
    [0,0,1,1,0,0,1,1,0,0,1,1,0,0,1,1], [0,0,0,1,0,0,0,1,0,0,0,1,0,0,0,1],
    [1,0,0,0,1,0,0,0,1,0,0,0,1,0,0,0], [0,0,0,1,0,0,1,1,0,0,1,1,0,1,1,1],
    [1,1,1,1,1,1,1,0,1,1,1,0,1,1,0,0], [0,0,1,1,0,1,1,1,0,1,1,1,1,1,1,1],
    [1,1,1,0,1,1,0,0,1,0,0,0,0,0,0,0], [1,1,1,1,1,1,1,0,1,1,0,0,1,0,0,0],
    [0,0,0,0,0,0,0,0,0,0,0,1,0,0,1,1], [1,1,0,0,1,0,0,0,0,0,0,0,0,0,0,0],
    [0,0,0,0,0,0,0,1,0,1,1,1,1,1,1,1], [1,1,1,1,1,1,1,1,1,1,1,0,1,0,0,0],
    [1,1,1,0,1,0,0,0,0,0,0,0,0,0,0,0], [1,1,1,1,1,1,1,1,0,0,0,0,0,0,0,0],
    [0,0,0,0,1,1,1,1,1,1,1,1,1,1,1,1], [1,1,1,1,1,1,1,1,1,1,1,1,0,0,0,0],
    [1,0,0,0,1,1,1,0,1,1,1,1,1,1,1,1], [1,1,1,1,1,1,1,1,0,1,1,1,0,0,0,1],
    [0,1,1,1,0,0,1,1,0,0,0,1,0,0,0,0], [0,0,1,1,0,0,0,1,0,0,0,0,0,0,0,0],
    [0,0,0,0,1,0,0,0,1,1,0,0,1,1,1,0], [1,1,1,1,1,1,1,1,0,1,1,1,0,0,1,1],
    [1,0,0,0,1,1,0,0,1,1,0,0,1,1,1,0], [0,0,1,1,0,0,0,1,0,0,0,1,0,0,0,0],
    [1,1,1,1,0,1,1,1,0,1,1,1,0,0,1,1], [0,1,1,0,0,1,1,0,0,1,1,0,0,1,1,0],
    [1,1,1,1,0,0,0,0,0,0,0,0,1,1,1,1], [1,0,1,0,1,0,1,0,1,0,1,0,1,0,1,0],
    [1,1,1,1,0,0,0,0,1,1,1,1,0,0,0,0], [1,0,0,1,0,0,1,1,0,1,1,0,1,1,0,0],
]

_PATTERNS_3 = [
    [0,0,0,0,0,0,0,0,1,1,2,2,1,1,2,2], [1,1,1,1,1,1,1,1,0,0,0,0,2,2,2,2],
    [1,1,1,1,0,0,0,0,0,0,0,0,2,2,2,2], [1,1,1,1,2,2,2,2,0,0,0,0,0,0,0,0],
    [1,1,2,0,1,1,2,0,1,1,2,0,1,1,2,0], [0,1,1,2,0,1,1,2,0,1,1,2,0,1,1,2],
    [0,2,1,1,0,2,1,1,0,2,1,1,0,2,1,1], [2,0,0,0,2,0,0,0,2,1,1,1,2,1,1,1],
    [2,0,1,2,2,0,1,2,2,0,1,2,2,0,1,2], [1,1,1,1,0,0,0,0,2,2,2,2,1,1,1,1],
    [0,0,2,2,0,0,1,1,0,0,1,1,0,0,2,2],
]

_PATTERNS_2_3 = [
    [0,0,0,0,1,1,1,1,0,0,0,0,0,0,0,0], [0,0,1,0,0,0,1,0,0,0,1,0,0,0,1,0],
    [1,1,0,0,1,1,0,0,1,0,0,0,0,0,0,0], [0,0,0,0,0,0,0,1,0,0,1,1,0,0,1,1],
    [1,1,1,1,1,1,1,1,0,0,0,0,1,1,1,1], [0,1,0,0,0,1,0,0,0,1,0,0,0,1,0,0],
    [0,0,0,1,0,0,1,1,1,1,1,1,1,1,1,1], [0,1,1,1,0,0,1,1,0,0,1,1,0,0,1,1],
    [1,1,0,0,0,0,0,0,0,0,1,1,1,1,0,0], [0,1,1,1,0,1,1,1,0,0,0,0,0,0,0,0],
    [0,0,0,0,0,0,0,0,1,1,1,0,1,1,1,0], [1,1,0,0,0,0,0,0,0,0,0,0,1,1,0,0],
    [0,1,1,1,0,0,1,1,0,0,0,0,0,0,0,0], [0,0,0,0,0,0,0,1,1,1,1,1,1,1,1,1],
    [1,1,1,1,1,1,1,1,1,1,1,1,0,1,1,0], [1,1,0,0,1,1,0,0,1,1,0,0,1,0,0,0],
    [1,1,1,1,1,1,1,1,1,0,0,0,1,0,0,0], [0,0,1,1,0,1,1,0,1,1,0,0,1,0,0,0],
    [1,1,1,1,0,1,1,1,0,0,0,0,0,0,0,0],
]

_PATTERNS_2_ANCHORS = [
    [0, 2], [0, 3], [1, 0], [0, 3], [7, 0], [0, 2], [3, 0],
    [7, 0], [0, 11], [2, 0], [0, 7], [11, 0], [3, 0], [8, 0],
    [0, 4], [12, 0], [1, 0], [8, 0], [0, 1], [0, 2], [0, 4],
    [8, 0], [1, 0], [0, 2], [4, 0], [0, 1], [4, 0], [1, 0],
    [4, 0], [1, 0],
]

_PATTERNS_3_ANCHORS = [
    [0, 8, 10], [8, 0, 12], [4, 0, 12], [8, 0, 4], [3, 0, 2],
    [0, 1, 3], [0, 2, 1], [1, 9, 0], [1, 2, 0], [4, 0, 8], [0, 6, 2],
]

_PATTERNS_2_3_ANCHORS = [
    [0, 4], [0, 2], [2, 0], [0, 7], [8, 0], [0, 1], [0, 3],
    [0, 1], [2, 0], [0, 1], [0, 8], [2, 0], [0, 1], [0, 7],
    [12, 0], [2, 0], [9, 0], [0, 2], [4, 0],
]

# uastc.rs:697-705 weight unquant LUTs
_WEIGHT_LUTS = {
    1: [0, 64],
    2: [0, 21, 43, 64],
    3: [0, 9, 18, 27, 37, 46, 55, 64],
    4: [0, 4, 8, 12, 17, 21, 25, 29, 35, 39, 43, 47, 52, 56, 60, 64],
    5: [0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28, 30, 34, 36,
        38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64],
}


# -- uastc.rs:585-614 unquant_endpoint ---------------------------------------


def _unquant_endpoint(trit_quint: int, bits_val: int, range_index: int) -> int:
    bits, trits, quints, deq_b, deq_c = _BISE_RANGES[range_index]
    quant_bits = bits_val
    if trits == 0 and quints == 0 and bits > 0:
        bits_la = (quant_bits << (8 - bits)) & 0xFFFF
        val = 0
        while bits_la > 0:
            val |= bits_la
            bits_la >>= bits
        return val & 0xFF
    a = 511 if (quant_bits & 1) != 0 else 0
    b = 0
    for j in range(9):
        b = (b << 1) & 0xFFFF
        shift = ord(deq_b[j])
        if shift != ord("0"):
            b |= (quant_bits >> (shift - ord("a"))) & 0x1
    c = deq_c
    d = trit_quint
    val = (d * c + b) & 0xFFFF
    val ^= a
    return ((a & 0x80) | (val >> 2)) & 0xFF


# -- uastc.rs:616-695 decode_endpoints ---------------------------------------


def _decode_endpoints(r: _OBitReader, range_index: int, value_count: int):
    bits, trits, quints, _, _ = _BISE_RANGES[range_index]
    trit_quints = [0] * value_count
    bit_vals = [0] * value_count

    if quints > 0:
        out_pos = 0
        for _ in range(value_count // 3):
            q = r.read(7)
            for _ in range(3):
                trit_quints[out_pos] = q % 5
                q //= 5
                out_pos += 1
        remaining = value_count - out_pos
        if remaining > 0:
            bits_used = {1: 3, 2: 5}[remaining]
            q = r.read(bits_used)
            for _ in range(remaining):
                trit_quints[out_pos] = q % 5
                q //= 5
                out_pos += 1

    if trits > 0:
        out_pos = 0
        for _ in range(value_count // 5):
            t = r.read(8)
            for _ in range(5):
                trit_quints[out_pos] = t % 3
                t //= 3
                out_pos += 1
        remaining = value_count - out_pos
        if remaining > 0:
            bits_used = {1: 2, 2: 4, 3: 5, 4: 7}[remaining]
            t = r.read(bits_used)
            for _ in range(remaining):
                trit_quints[out_pos] = t % 3
                t //= 3
                out_pos += 1

    if bits > 0:
        for i in range(value_count):
            bit_vals[i] = r.read(bits)

    return trit_quints, bit_vals


# -- uastc.rs:721-740 decode_weights -----------------------------------------


def _anchor_indices(mode_id: int, subset_count: int, pat: int):
    if mode_id == 7:
        return _PATTERNS_2_3_ANCHORS[pat]
    if subset_count == 1:
        return [0]
    if subset_count == 2:
        return _PATTERNS_2_ANCHORS[pat]
    return _PATTERNS_3_ANCHORS[pat]


def _decode_weights(r: _OBitReader, mode, pat: int):
    _, _, _, _, weight_bits, plane_count, subset_count, _ = mode
    mode_id = mode[0]
    bits = [weight_bits] * 16
    for anchor in _anchor_indices(mode_id, subset_count, pat):
        bits[anchor] = weight_bits - 1
    weights = []
    for i in range(16):
        for _plane in range(plane_count):
            weights.append(r.read(bits[i]))
    lut = _WEIGHT_LUTS[weight_bits]
    return [lut[w] for w in weights]


# -- uastc.rs:176-235 assembly + interpolation -------------------------------


def _assemble_endpoint_pairs(fmt: int, endpoint_bytes):
    pairs = []
    if fmt == _RGB:
        for i in range(0, len(endpoint_bytes), 6):
            b = endpoint_bytes[i : i + 6]
            pairs.append(((b[0], b[2], b[4], 0xFF), (b[1], b[3], b[5], 0xFF)))
    elif fmt == _RGBA:
        for i in range(0, len(endpoint_bytes), 8):
            b = endpoint_bytes[i : i + 8]
            pairs.append(((b[0], b[2], b[4], b[6]), (b[1], b[3], b[5], b[7])))
    else:  # LA
        for i in range(0, len(endpoint_bytes), 4):
            b = endpoint_bytes[i : i + 4]
            pairs.append(((b[0], b[0], b[0], b[2]), (b[1], b[1], b[1], b[3])))
    return pairs


def _astc_interpolate(l: int, h: int, w: int) -> int:
    # srgb = false path
    l = (l << 8) | l
    h = (h << 8) | h
    k = (l * (64 - w) + h * w + 32) >> 6
    return (k >> 8) & 0xFF


# -- uastc.rs:237-327 decode_block_to_rgba -----------------------------------


def decode_block_to_rgba(block: bytes):
    """16 UASTC block bytes -> list of 16 (r, g, b, a) texels (raster order).

    Raises OracleUastcError exactly at the reference's Err sites."""
    assert len(block) == 16
    r = _OBitReader(block)

    mode_code = r.peek(7)
    mode_index = _MODE_LUT[mode_code]
    if mode_index >= len(_MODES):
        raise OracleUastcError("invalid mode index")
    mode = _MODES[mode_index]
    (mode_id, code_size, range_index, fmt, weight_bits, plane_count,
     subset_count, trans_flags_bits) = mode
    r.remove(code_size)

    if mode_id == 8:
        rgba = (r.read(8), r.read(8), r.read(8), r.read(8))
        return [rgba] * 16

    r.remove(trans_flags_bits)

    # compsel (uastc.rs:343-350)
    if plane_count == 2 and fmt == _LA:
        compsel = 3
    elif plane_count == 2:
        compsel = r.read(2)
    else:
        compsel = 0

    # pattern index (uastc.rs:352-366)
    if mode_id == 7:
        pat, pattern_count = r.read(5), 19
    elif subset_count == 1:
        pat, pattern_count = 0, 1
    elif subset_count == 2:
        pat, pattern_count = r.read(5), 30
    else:
        pat, pattern_count = r.read(4), 11
    if pat >= pattern_count:
        raise OracleUastcError("block pattern is not valid")

    channel_count = {_RGB: 3, _RGBA: 4, _LA: 2}[fmt]
    endpoint_count = channel_count * subset_count * 2

    trit_quints, bit_vals = _decode_endpoints(r, range_index, endpoint_count)
    endpoints = [
        _unquant_endpoint(trit_quints[i], bit_vals[i], range_index)
        for i in range(endpoint_count)
    ]

    weights = _decode_weights(r, mode, pat)

    output = []
    if subset_count == 1:
        e0, e1 = _assemble_endpoint_pairs(fmt, endpoints)[0]
        if plane_count == 1:
            assert len(weights) == 16
            for w in weights:
                output.append(tuple(
                    _astc_interpolate(e0[c], e1[c], w) for c in range(4)
                ))
        else:
            assert len(weights) == 32
            for i in range(16):
                ws = weights[2 * i : 2 * i + 2]
                wc = [ws[1] if compsel == c else ws[0] for c in range(4)]
                output.append(tuple(
                    _astc_interpolate(e0[c], e1[c], wc[c]) for c in range(4)
                ))
    else:
        pairs = _assemble_endpoint_pairs(fmt, endpoints)
        if mode_id == 7:
            pattern = _PATTERNS_2_3[pat]
        elif subset_count == 2:
            pattern = _PATTERNS_2[pat]
        else:
            pattern = _PATTERNS_3[pat]
        assert len(weights) == 16
        for subset, w in zip(pattern, weights):
            e0, e1 = pairs[subset]
            output.append(tuple(
                _astc_interpolate(e0[c], e1[c], w) for c in range(4)
            ))
    return output


# -- bitwriter.rs ------------------------------------------------------------


class _OBitWriterLsb:
    def __init__(self, out: bytearray):
        self.out = out
        self.bit_pos = 0

    def write(self, count: int, v: int) -> None:
        assert count <= 32
        v &= (1 << count) - 1
        byte = self.bit_pos // 8
        bit = self.bit_pos % 8
        if byte < len(self.out):
            self.out[byte] |= (v << bit) & 0xFF
        written = 8 - bit
        byte += 1
        self.bit_pos += count
        while written < count:
            if byte < len(self.out):
                self.out[byte] |= (v >> written) & 0xFF
            written += 8
            byte += 1


class _OBitWriterMsbRevBytes:
    """MSB writer filling the buffer from the end (bitwriter.rs:57-114)."""

    def __init__(self, out: bytearray):
        self.out = out
        self.bit_pos = len(out) * 8

    def write(self, count: int, v: int) -> None:
        assert count <= 32
        v &= (1 << count) - 1
        self.bit_pos -= count
        byte = self.bit_pos // 8
        bit = self.bit_pos % 8
        if 0 <= byte < len(self.out):
            self.out[byte] |= (v << bit) & 0xFF
        written = 8 - bit
        byte += 1
        while written < count:
            if 0 <= byte < len(self.out):
                self.out[byte] |= (v >> written) & 0xFF
            written += 8
            byte += 1

    def write_rev_bits(self, count: int, v: int) -> None:
        # v.reverse_bits() >> (32 - count); count == 0 is a no-op write
        rev = int(f"{v & 0xFFFFFFFF:032b}"[::-1], 2)
        self.write(count, rev >> (32 - count) if count else rev)


# -- astc.rs:183-217,247-264,332-354 writer tables ---------------------------

_UASTC_TO_ASTC_BLOCK_MODE_13 = [
    0x0242, 0x0042, 0x0853, 0x1042, 0x0842, 0x0053, 0x0442, 0x0842, 0,
    0x0842, 0x0242, 0x0442, 0x0053, 0x0441, 0x0042, 0x0242, 0x0842, 0x0442,
    0x0253, 0,
]

_PATTERNS_2_ASTC_INDEX_10 = [
    28, 20, 16, 29, 91, 9, 107, 72, 149, 204, 50, 114, 496, 17, 78, 39, 252,
    828, 43, 156, 116, 210, 476, 273, 684, 359, 246, 195, 694, 524,
]

_PATTERNS_3_ASTC_INDEX_10 = [260, 74, 32, 156, 183, 15, 745, 0, 335, 902, 254]

_PATTERNS_2_3_ASTC_INDEX_10 = [
    36, 48, 61, 137, 161, 183, 226, 281, 302, 307, 479, 495, 593, 594, 605,
    799, 812, 988, 993,
]

_ASTC_QUINT_ENCODE_LUT = [
    0x00, 0x01, 0x02, 0x03, 0x04, 0x08, 0x09, 0x0A, 0x0B, 0x0C, 0x10, 0x11,
    0x12, 0x13, 0x14, 0x18, 0x19, 0x1A, 0x1B, 0x1C, 0x05, 0x0D, 0x15, 0x1D,
    0x06, 0x20, 0x21, 0x22, 0x23, 0x24, 0x28, 0x29, 0x2A, 0x2B, 0x2C, 0x30,
    0x31, 0x32, 0x33, 0x34, 0x38, 0x39, 0x3A, 0x3B, 0x3C, 0x25, 0x2D, 0x35,
    0x3D, 0x0E, 0x40, 0x41, 0x42, 0x43, 0x44, 0x48, 0x49, 0x4A, 0x4B, 0x4C,
    0x50, 0x51, 0x52, 0x53, 0x54, 0x58, 0x59, 0x5A, 0x5B, 0x5C, 0x45, 0x4D,
    0x55, 0x5D, 0x16, 0x60, 0x61, 0x62, 0x63, 0x64, 0x68, 0x69, 0x6A, 0x6B,
    0x6C, 0x70, 0x71, 0x72, 0x73, 0x74, 0x78, 0x79, 0x7A, 0x7B, 0x7C, 0x65,
    0x6D, 0x75, 0x7D, 0x1E, 0x66, 0x67, 0x46, 0x47, 0x26, 0x6E, 0x6F, 0x4E,
    0x4F, 0x2E, 0x76, 0x77, 0x56, 0x57, 0x36, 0x7E, 0x7F, 0x5E, 0x5F, 0x3E,
    0x27, 0x2F, 0x37, 0x3F, 0x1F,
]

_ASTC_TRIT_ENCODE_LUT = [
    0x00, 0x01, 0x02, 0x04, 0x05, 0x06, 0x08, 0x09, 0x0A, 0x10, 0x11, 0x12,
    0x14, 0x15, 0x16, 0x18, 0x19, 0x1A, 0x03, 0x07, 0x0B, 0x13, 0x17, 0x1B,
    0x0C, 0x0D, 0x0E, 0x20, 0x21, 0x22, 0x24, 0x25, 0x26, 0x28, 0x29, 0x2A,
    0x30, 0x31, 0x32, 0x34, 0x35, 0x36, 0x38, 0x39, 0x3A, 0x23, 0x27, 0x2B,
    0x33, 0x37, 0x3B, 0x2C, 0x2D, 0x2E, 0x40, 0x41, 0x42, 0x44, 0x45, 0x46,
    0x48, 0x49, 0x4A, 0x50, 0x51, 0x52, 0x54, 0x55, 0x56, 0x58, 0x59, 0x5A,
    0x43, 0x47, 0x4B, 0x53, 0x57, 0x5B, 0x4C, 0x4D, 0x4E, 0x80, 0x81, 0x82,
    0x84, 0x85, 0x86, 0x88, 0x89, 0x8A, 0x90, 0x91, 0x92, 0x94, 0x95, 0x96,
    0x98, 0x99, 0x9A, 0x83, 0x87, 0x8B, 0x93, 0x97, 0x9B, 0x8C, 0x8D, 0x8E,
    0xA0, 0xA1, 0xA2, 0xA4, 0xA5, 0xA6, 0xA8, 0xA9, 0xAA, 0xB0, 0xB1, 0xB2,
    0xB4, 0xB5, 0xB6, 0xB8, 0xB9, 0xBA, 0xA3, 0xA7, 0xAB, 0xB3, 0xB7, 0xBB,
    0xAC, 0xAD, 0xAE, 0xC0, 0xC1, 0xC2, 0xC4, 0xC5, 0xC6, 0xC8, 0xC9, 0xCA,
    0xD0, 0xD1, 0xD2, 0xD4, 0xD5, 0xD6, 0xD8, 0xD9, 0xDA, 0xC3, 0xC7, 0xCB,
    0xD3, 0xD7, 0xDB, 0xCC, 0xCD, 0xCE, 0x60, 0x61, 0x62, 0x64, 0x65, 0x66,
    0x68, 0x69, 0x6A, 0x70, 0x71, 0x72, 0x74, 0x75, 0x76, 0x78, 0x79, 0x7A,
    0x63, 0x67, 0x6B, 0x73, 0x77, 0x7B, 0x6C, 0x6D, 0x6E, 0xE0, 0xE1, 0xE2,
    0xE4, 0xE5, 0xE6, 0xE8, 0xE9, 0xEA, 0xF0, 0xF1, 0xF2, 0xF4, 0xF5, 0xF6,
    0xF8, 0xF9, 0xFA, 0xE3, 0xE7, 0xEB, 0xF3, 0xF7, 0xFB, 0xEC, 0xED, 0xEE,
    0x1C, 0x1D, 0x1E, 0x3C, 0x3D, 0x3E, 0x5C, 0x5D, 0x5E, 0x9C, 0x9D, 0x9E,
    0xBC, 0xBD, 0xBE, 0xDC, 0xDD, 0xDE, 0x1F, 0x3F, 0x5F, 0x9F, 0xBF, 0xDF,
    0x7C, 0x7D, 0x7E,
]


# -- astc.rs:8-181 convert_block_from_uastc ----------------------------------


def _decode_weights_raw(r: _OBitReader, mode, pat: int):
    """decode_weights without unquantization: the consumer-order raw values."""
    mode_id, _, _, _, weight_bits, plane_count, subset_count, _ = mode
    bits = [weight_bits] * 16
    for anchor in _anchor_indices(mode_id, subset_count, pat):
        bits[anchor] = weight_bits - 1
    out = []
    for i in range(16):
        for _plane in range(plane_count):
            out.append(r.read(bits[i]))
    return out


def convert_block_to_astc(block: bytes) -> bytes:
    """16 UASTC block bytes -> 16 ASTC block bytes (astc.rs:8-181)."""
    assert len(block) == 16
    r = _OBitReader(block)

    mode_code = r.peek(7)
    mode_index = _MODE_LUT[mode_code]
    if mode_index >= len(_MODES):
        raise OracleUastcError("invalid mode index")
    mode = _MODES[mode_index]
    (mode_id, code_size, range_index, fmt, weight_bits, plane_count,
     subset_count, trans_flags_bits) = mode
    r.remove(code_size)

    output = bytearray(16)
    w = _OBitWriterLsb(output)

    if mode_id == 8:
        rgba = [r.read(8) for _ in range(4)]
        w.write(12, 0b1101_1111_1100)
        w.write(20, 0x000F_FFFF)
        w.write(32, 0xFFFF_FFFF)
        for c in rgba:
            w.write(16, (c << 8) | c)
        return bytes(output)

    r.remove(trans_flags_bits)

    if plane_count == 2 and fmt == _LA:
        compsel = 3
    elif plane_count == 2:
        compsel = r.read(2)
    else:
        compsel = 0

    if mode_id == 7:
        pat, pattern_count = r.read(5), 19
    elif subset_count == 1:
        pat, pattern_count = 0, 1
    elif subset_count == 2:
        pat, pattern_count = r.read(5), 30
    else:
        pat, pattern_count = r.read(4), 11
    if pat >= pattern_count:
        raise OracleUastcError("block pattern is not valid")

    channel_count = {_RGB: 3, _RGBA: 4, _LA: 2}[fmt]
    endpoint_count = channel_count * subset_count * 2

    trit_quints, bit_vals = _decode_endpoints(r, range_index, endpoint_count)
    # the reference's fixed [QuantEndpoint; 18]: defaults beyond value_count
    trit_quints = trit_quints + [0] * (18 - len(trit_quints))
    bit_vals = bit_vals + [0] * (18 - len(bit_vals))

    invert_subset_weights = [False, False, False]
    if fmt != _LA:  # mode.has_blue()
        eps = endpoint_count // subset_count
        for subset in range(subset_count):
            lo = subset * eps
            e = [
                _unquant_endpoint(trit_quints[lo + i], bit_vals[lo + i], range_index)
                for i in range(6)
            ]
            s0 = e[0] + e[2] + e[4]
            s1 = e[1] + e[3] + e[5]
            if s0 > s1:
                invert_subset_weights[subset] = True
                for p in range(lo, lo + eps, 2):
                    trit_quints[p], trit_quints[p + 1] = (
                        trit_quints[p + 1],
                        trit_quints[p],
                    )
                    bit_vals[p], bit_vals[p + 1] = bit_vals[p + 1], bit_vals[p]

    # block mode + config bits
    w.write(13, _UASTC_TO_ASTC_BLOCK_MODE_13[mode_id])
    if mode_id == 7:
        astc_pat = _PATTERNS_2_3_ASTC_INDEX_10[pat]
    elif subset_count == 1:
        astc_pat = None
    elif subset_count == 2:
        astc_pat = _PATTERNS_2_ASTC_INDEX_10[pat]
    else:
        astc_pat = _PATTERNS_3_ASTC_INDEX_10[pat]
    if astc_pat is not None:
        w.write(10, astc_pat)
        w.write(2, 0b00)
    cem = {_RGB: 8, _RGBA: 12, _LA: 4}[fmt]
    w.write(4, cem)

    # endpoints (over the full padded 18-entry array, as the reference does)
    bits, trits, quints, _, _ = _BISE_RANGES[range_index]
    if quints > 0:
        for lo in range(0, 18, 3):
            chunk_tq = trit_quints[lo : lo + 3]
            q_lut_id = 0
            for tq in reversed(chunk_tq):
                q_lut_id = q_lut_id * 5 + tq
            q = _ASTC_QUINT_ENCODE_LUT[q_lut_id]
            w.write(bits, bit_vals[lo])
            w.write(3, q)
            w.write(bits, bit_vals[lo + 1] if lo + 1 < 18 else 0)
            w.write(2, q >> 3)
            w.write(bits, bit_vals[lo + 2] if lo + 2 < 18 else 0)
            w.write(2, q >> 5)
    elif trits > 0:
        for lo in range(0, 18, 5):
            chunk_tq = trit_quints[lo : lo + 5]
            t_lut_id = 0
            for tq in reversed(chunk_tq):
                t_lut_id = t_lut_id * 3 + tq
            t = _ASTC_TRIT_ENCODE_LUT[t_lut_id]
            w.write(bits, bit_vals[lo])
            w.write(2, t)
            w.write(bits, bit_vals[lo + 1] if lo + 1 < 18 else 0)
            w.write(2, t >> 2)
            w.write(bits, bit_vals[lo + 2] if lo + 2 < 18 else 0)
            w.write(1, t >> 4)
            w.write(bits, bit_vals[lo + 3] if lo + 3 < 18 else 0)
            w.write(2, t >> 5)
            w.write(bits, bit_vals[lo + 4] if lo + 4 < 18 else 0)
            w.write(1, t >> 7)
    else:
        for i in range(18):
            w.write(bits, bit_vals[i])

    # weights + CCS from the end
    wrev = _OBitWriterMsbRevBytes(output)
    raw_weights = _decode_weights_raw(r, mode, pat)
    if subset_count == 1:
        inv = invert_subset_weights[0]
        for weight in raw_weights:
            wrev.write_rev_bits(weight_bits, ~weight if inv else weight)
    else:
        if mode_id == 7:
            pattern = _PATTERNS_2_3[pat]
        elif subset_count == 2:
            pattern = _PATTERNS_2[pat]
        else:
            pattern = _PATTERNS_3[pat]
        for i, weight in enumerate(raw_weights):
            texel_id = i // plane_count
            subset = pattern[texel_id]
            inv = invert_subset_weights[subset]
            wrev.write_rev_bits(weight_bits, ~weight if inv else weight)
    if plane_count != 1:
        wrev.write(2, compsel)

    return bytes(output)


def mode_code_bits(mode_id: int):
    """(code, code_size) whose low code_size bits force mode_id regardless of
    the remaining peeked bits (derived by exhaustive check over MODE_LUT)."""
    code_size = _MODES[mode_id][1]
    for code in range(1 << code_size):
        if all(
            _MODE_LUT[(ext << code_size | code) & 0x7F] == mode_id
            for ext in range(1 << (7 - code_size))
        ):
            return code, code_size
    raise AssertionError(f"no stable code for mode {mode_id}")
