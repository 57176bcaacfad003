"""Test-only independent KTX 1.1 reader, written against the Khronos KTX
File Format Specification 1.1 (not against container/ktx.py): parses and
STRICTLY validates the identifier, endianness word, the 13-word header's
internal consistency (compressed vs uncompressed field rules, cube/array
invariants, format-table agreement), the key/value section's entry padding,
and every mip level's imageSize against header-derived dimensions, mip
padding, and exact file coverage, then returns the per-level payloads.

Guards the writer's layout beyond the spec-pinned constant checks in
test_ktx.py (round-4 verdict item 6; tests/ktx2_reader.py is the model).

Raises ValueError on any structural violation.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_IDENT = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x31, 0x31, 0xBB, 0x0D, 0x0A, 0x1A, 0x0A])
_LE, _BE = 0x04030201, 0x01020304

# glInternalFormat -> (base internal format, bytes per block, block w, block h)
# or, for uncompressed formats, (base, glType, glFormat, bytes per texel).
_COMPRESSED = {
    0x8E8C: (0x1908, 16, 4, 4),  # COMPRESSED_RGBA_BPTC_UNORM (BC7)
    0x93B0: (0x1908, 16, 4, 4),  # COMPRESSED_RGBA_ASTC_4x4_KHR
    0x8D64: (0x1907, 8, 4, 4),   # ETC1_RGB8_OES
    0x9278: (0x1908, 16, 4, 4),  # COMPRESSED_RGBA8_ETC2_EAC
}
_UNCOMPRESSED = {
    0x8058: (0x1908, 0x1401, 0x1908, 4),  # RGBA8 / UNSIGNED_BYTE / RGBA
}


@dataclass
class Ktx1File:
    gl_internal_format: int
    width: int
    height: int
    n_faces: int
    levels: list  # bytes per level, level 0 first
    kvd: dict


def _fail(msg: str):
    raise ValueError(f"KTX1 validation: {msg}")


def _parse_kvd(blob: bytes, ofs: int, length: int) -> dict:
    """Key/value section: u32 keyAndValueByteLength, NUL-terminated key,
    value, then 3 - ((keyAndValueByteLength + 3) % 4) padding bytes; entries
    must exactly tile bytesOfKeyValueData."""
    out = {}
    cur, end = ofs, ofs + length
    while cur < end:
        if end - cur < 4:
            _fail("trailing KVD bytes too short for a length word")
        (kv_len,) = struct.unpack_from("<I", blob, cur)
        entry = blob[cur + 4 : cur + 4 + kv_len]
        if len(entry) != kv_len or cur + 4 + kv_len > end:
            _fail("KVD entry overruns the KVD section")
        if b"\x00" not in entry:
            _fail("KVD key is not NUL-terminated")
        key, _, value = entry.partition(b"\x00")
        out[key.decode()] = value
        cur += 4 + kv_len + (3 - ((kv_len + 3) % 4))
    if cur != end:
        _fail("KVD entries do not exactly tile bytesOfKeyValueData")
    return out


def read_ktx1(blob: bytes) -> Ktx1File:
    if blob[:12] != _IDENT:
        _fail("bad identifier")
    if len(blob) < 12 + 13 * 4:
        _fail("file too short for the 13-word header")
    (endianness,) = struct.unpack_from("<I", blob, 12)
    if endianness == _BE:
        _fail("big-endian KTX1 not supported by this reader")
    if endianness != _LE:
        _fail(f"endianness word 0x{endianness:08X} is neither LE nor BE")
    (
        gl_type,
        gl_type_size,
        gl_format,
        gl_internal,
        gl_base,
        width,
        height,
        depth,
        n_array,
        n_faces,
        n_mips,
        kv_bytes,
    ) = struct.unpack_from("<12I", blob, 16)

    if gl_internal in _COMPRESSED:
        base, unit, bw, bh = _COMPRESSED[gl_internal]
        # spec 2.5/2.6: compressed textures set glType = glFormat = 0 and
        # glTypeSize = 1
        if gl_type != 0 or gl_format != 0:
            _fail("compressed texture must have glType = glFormat = 0")
        if gl_type_size != 1:
            _fail("compressed texture must have glTypeSize = 1")
        if gl_base != base:
            _fail(
                f"glBaseInternalFormat 0x{gl_base:04X} disagrees with "
                f"internal format 0x{gl_internal:04X}"
            )
    elif gl_internal in _UNCOMPRESSED:
        base, want_type, want_format, unit = _UNCOMPRESSED[gl_internal]
        bw = bh = 1
        if gl_type != want_type or gl_format != want_format:
            _fail("glType/glFormat disagree with the uncompressed internal format")
        if gl_base != base or gl_format != gl_base:
            _fail("glFormat must equal glBaseInternalFormat for uncompressed data")
        if gl_type_size != 1:
            _fail("UNSIGNED_BYTE data must have glTypeSize = 1")
    else:
        _fail(f"unsupported glInternalFormat 0x{gl_internal:04X}")

    if width == 0:
        _fail("pixelWidth 0")
    if height == 0:
        _fail("2-D texture with pixelHeight 0")
    if depth != 0:
        _fail("expected a 2-D texture (pixelDepth 0)")
    if n_array != 0:
        _fail("expected a non-array texture (numberOfArrayElements 0)")
    if n_faces not in (1, 6):
        _fail(f"numberOfFaces {n_faces} is neither 1 nor 6")
    if n_faces == 6 and width != height:
        _fail("cubemap faces must be square")
    if n_mips == 0:
        # legal per spec (loader generates mips) but our writer never emits it
        _fail("numberOfMipmapLevels 0 (generate-at-load) not supported")

    kvd_ofs = 12 + 13 * 4
    if kvd_ofs + kv_bytes > len(blob):
        _fail("bytesOfKeyValueData overruns the file")
    kvd = _parse_kvd(blob, kvd_ofs, kv_bytes) if kv_bytes else {}

    cur = kvd_ofs + kv_bytes
    levels = []
    for lvl in range(n_mips):
        if len(blob) - cur < 4:
            _fail(f"file truncated before level {lvl}'s imageSize word")
        (image_size,) = struct.unpack_from("<I", blob, cur)
        cur += 4
        lw, lh = max(1, width >> lvl), max(1, height >> lvl)
        per_face = ((lw + bw - 1) // bw) * ((lh + bh - 1) // bh) * unit
        # spec 2.16: for non-array cubemaps imageSize is the size of ONE
        # face, and each face is followed by cubePadding to 4 bytes;
        # otherwise it is the whole level (all faces/elements)
        if image_size != per_face:
            _fail(
                f"level {lvl} imageSize {image_size} != {per_face} derived "
                f"from header dimensions {lw}x{lh}"
            )
        face_pad = (-per_face) % 4 if n_faces == 6 else 0
        payload = bytearray()
        for _face in range(n_faces):
            if cur + per_face > len(blob):
                _fail(f"level {lvl} payload out of file bounds")
            payload += blob[cur : cur + per_face]
            cur += per_face + face_pad
            if face_pad and blob[cur - face_pad : cur] != b"\x00" * face_pad:
                _fail("cubePadding bytes are not zero")
        mip_pad = 3 - ((image_size + 3) % 4) if n_faces != 6 else 0
        if cur + mip_pad > len(blob):
            _fail(f"file truncated inside level {lvl}'s mipPadding")
        if blob[cur : cur + mip_pad] != b"\x00" * mip_pad:
            _fail("mipPadding bytes are not zero")
        cur += mip_pad
        levels.append(bytes(payload))
    if cur != len(blob):
        _fail("trailing bytes after the last mip level")

    return Ktx1File(gl_internal, width, height, n_faces, levels, kvd)
