"""CRC-16/GENIBUS over file bytes (reference: src/basis.rs:364-372).

Prefers the native C++ implementation (native/etc1s.cpp: basisu_crc16);
falls back to a table-driven Python pass.
"""

from __future__ import annotations

import numpy as np

try:
    from ..native import crc16_native as _native_crc16
except ImportError:  # pragma: no cover - toolchain-less environments
    _native_crc16 = None

_TABLE = None


def _crc16_table() -> np.ndarray:
    global _TABLE
    if _TABLE is None:
        # crc' = ((crc << 8) ^ k ^ (k << 5) ^ (k << 12)) & 0xFFFF,
        # k = q ^ (q >> 4), q = byte ^ (crc >> 8): the update only depends on
        # q, so precompute f(q) for q in 0..256.
        q = np.arange(256, dtype=np.uint16)
        k = ((q >> 4) ^ q).astype(np.uint16)
        _TABLE = (k ^ (k << 5) ^ (k << 12)).astype(np.uint16)
    return _TABLE


def crc16(data, crc: int = 0) -> int:
    if _native_crc16 is not None:
        return _native_crc16(data, crc)
    tbl = _crc16_table()
    c = (~crc) & 0xFFFF
    raw = bytes(data)
    for b in raw:
        q = (b ^ (c >> 8)) & 0xFF
        c = ((c << 8) & 0xFFFF) ^ int(tbl[q])
    return (~c) & 0xFFFF
