"""Test-only independent KTX2 reader, written against the KTX File Format
Specification 2.0 (not against container/ktx2.py): parses and STRICTLY
validates identifier, header, section index, level index, the KDFS 1.3 basic
DFD block, key/value data, and level payload placement, then returns the
per-level payloads.  Guards the writer's layout beyond the spec-pinned
constant checks in test_ktx2.py (round-3 verdict stretch item 9).

Raises ValueError on any structural violation.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from math import gcd

_IDENT = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30, 0xBB, 0x0D, 0x0A, 0x1A, 0x0A])

# vkFormat -> (bytes per texel block, block width, block height)
_VK_BLOCK = {
    145: (16, 4, 4),  # BC7_UNORM
    157: (16, 4, 4),  # ASTC_4x4_UNORM
    147: (8, 4, 4),   # ETC2_R8G8B8_UNORM (ETC1-compatible)
    151: (16, 4, 4),  # ETC2_R8G8B8A8_UNORM
    37: (4, 1, 1),    # R8G8B8A8_UNORM
}


@dataclass
class Ktx2File:
    vk_format: int
    type_size: int
    width: int
    height: int
    levels: list  # bytes per level, level 0 first
    dfd: dict
    kvd: dict


def _fail(msg: str):
    raise ValueError(f"KTX2 validation: {msg}")


def _parse_dfd(blob: bytes, ofs: int, length: int) -> dict:
    if length < 4 + 24:
        _fail("DFD too short")
    (total,) = struct.unpack_from("<I", blob, ofs)
    if total != length:
        _fail(f"dfdTotalSize {total} != index dfdByteLength {length}")
    vendor_type, ver_size = struct.unpack_from("<2I", blob, ofs + 4)
    if vendor_type & 0x1FFFF != 0:
        _fail("first DFD block is not the Khronos basic descriptor")
    version = ver_size & 0xFFFF
    block_size = ver_size >> 16
    if version != 2:
        _fail(f"KDFS version {version} != 2")
    if 4 + block_size != total:
        _fail("descriptorBlockSize does not cover dfdTotalSize")
    if (block_size - 24) % 16:
        _fail("basic block size is not 24 + 16*samples")
    n_samples = (block_size - 24) // 16
    model, primaries, transfer, flags = struct.unpack_from("<4B", blob, ofs + 12)
    bw1, bh1, bd1, b31 = struct.unpack_from("<4B", blob, ofs + 16)
    bytes_planes = struct.unpack_from("<8B", blob, ofs + 20)
    samples = []
    bit_cursor = None
    for i in range(n_samples):
        w0, pos, lower, upper = struct.unpack_from("<4I", blob, ofs + 28 + 16 * i)
        bit_ofs = w0 & 0xFFFF
        bit_len = ((w0 >> 16) & 0xFF) + 1
        channel = (w0 >> 24) & 0xF
        qual = (w0 >> 28) & 0xF
        if bit_cursor is not None and bit_ofs < bit_cursor:
            _fail("DFD samples overlap / out of order")
        bit_cursor = bit_ofs + bit_len
        samples.append(dict(channel=channel, bit_ofs=bit_ofs, bit_len=bit_len, qual=qual))
    if bit_cursor is not None and bytes_planes[0] and bit_cursor > 8 * bytes_planes[0]:
        _fail("DFD samples exceed bytesPlane0")
    return dict(
        model=model,
        primaries=primaries,
        transfer=transfer,
        flags=flags,
        block_dims=(bw1 + 1, bh1 + 1, bd1 + 1, b31 + 1),
        bytes_plane0=bytes_planes[0],
        samples=samples,
    )


def _parse_kvd(blob: bytes, ofs: int, length: int) -> dict:
    out = {}
    end = ofs + length
    cur = ofs
    while cur < end:
        if end - cur < 4:
            _fail("trailing KVD bytes too short for a length word")
        (kv_len,) = struct.unpack_from("<I", blob, cur)
        entry = blob[cur + 4 : cur + 4 + kv_len]
        if len(entry) != kv_len:
            _fail("KVD entry overruns the KVD section")
        if b"\x00" not in entry:
            _fail("KVD key is not NUL-terminated")
        key, _, value = entry.partition(b"\x00")
        out[key.decode()] = value
        # spec: valuePadding = 3 - ((keyAndValueByteLength + 3) % 4)
        cur += 4 + kv_len + ((-kv_len) % 4)
    return out


def read_ktx2(blob: bytes) -> Ktx2File:
    if blob[:12] != _IDENT:
        _fail("bad identifier")
    (vk, type_size, w, h, depth, layers, faces, n_levels, scheme) = struct.unpack_from(
        "<9I", blob, 12
    )
    if vk not in _VK_BLOCK:
        _fail(f"unsupported vkFormat {vk}")
    if depth != 0 or layers != 0 or faces != 1:
        _fail("expected a plain 2-D non-array texture")
    if scheme != 0:
        _fail("expected supercompressionScheme NONE")
    if n_levels < 1:
        _fail("levelCount 0")
    dfd_ofs, dfd_len, kvd_ofs, kvd_len, sgd_ofs, sgd_len = struct.unpack_from(
        "<2I2I2Q", blob, 48
    )
    if sgd_ofs or sgd_len:
        _fail("supercompressionGlobalData present under scheme NONE")
    level_index_ofs = 48 + 32
    level_index = [
        struct.unpack_from("<3Q", blob, level_index_ofs + 24 * i) for i in range(n_levels)
    ]
    if dfd_ofs != level_index_ofs + 24 * n_levels:
        _fail("DFD does not directly follow the level index")
    dfd = _parse_dfd(blob, dfd_ofs, dfd_len)
    kvd = _parse_kvd(blob, kvd_ofs, kvd_len) if kvd_len else {}
    if kvd_len and kvd_ofs != dfd_ofs + dfd_len:
        _fail("KVD does not directly follow the DFD")

    block_bytes, bw, bh = _VK_BLOCK[vk]
    if dfd["bytes_plane0"] != block_bytes:
        _fail("DFD bytesPlane0 disagrees with the vkFormat block size")
    if dfd["block_dims"][:2] != (bw, bh):
        _fail("DFD texel block dims disagree with the vkFormat")
    align = block_bytes * 4 // gcd(block_bytes, 4)

    data_start = (kvd_ofs + kvd_len) if kvd_len else (dfd_ofs + dfd_len)
    levels = []
    prev_ofs = None
    spans = []
    for lvl, (ofs, length, ulength) in enumerate(level_index):
        if length != ulength:
            _fail("byteLength != uncompressedByteLength under scheme NONE")
        lw, lh = max(1, w >> lvl), max(1, h >> lvl)
        expect = ((lw + bw - 1) // bw) * ((lh + bh - 1) // bh) * block_bytes
        if vk == 37:
            expect = lw * lh * 4
        if length != expect:
            _fail(f"level {lvl} payload is {length} bytes, expected {expect}")
        if ofs % align:
            _fail(f"level {lvl} offset {ofs} not aligned to {align}")
        if ofs < data_start or ofs + length > len(blob):
            _fail(f"level {lvl} payload out of file bounds")
        if prev_ofs is not None and ofs >= prev_ofs:
            _fail("levels must be stored largest-last (level N before level N-1)")
        prev_ofs = ofs
        spans.append((ofs, ofs + length))
        levels.append(blob[ofs : ofs + length])

    # payload region must tile the rest of the file (only alignment padding
    # between spans, nothing after the last)
    spans.sort()
    cur = data_start
    for s, e in spans:
        if s - cur >= align:
            _fail("oversized gap between level payloads")
        if s < cur:
            _fail("level payloads overlap")
        cur = e
    if cur != len(blob):
        _fail("trailing bytes after the last level payload")

    return Ktx2File(vk, type_size, w, h, levels, dfd, kvd)
