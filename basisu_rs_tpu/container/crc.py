"""CRC-16/GENIBUS over file bytes (reference: src/basis.rs:364-372).

The reference's bitless byte-at-a-time recurrence is reformulated here as a
table-driven numpy pass so multi-megabyte files checksum at memory speed on
host; a C++ implementation (native/) takes over when available.
"""

from __future__ import annotations

import numpy as np

_TABLE = None


def _crc16_table() -> np.ndarray:
    global _TABLE
    if _TABLE is None:
        # crc' = ((crc << 8) ^ k ^ (k << 5) ^ (k << 12)) & 0xFFFF,
        # k = q ^ (q >> 4), q = byte ^ (crc >> 8): the update of the high byte
        # only depends on q, so precompute f(q) for q in 0..256.
        q = np.arange(256, dtype=np.uint16)
        k = ((q >> 4) ^ q).astype(np.uint16)
        _TABLE = (k ^ (k << 5) ^ (k << 12)).astype(np.uint16)
    return _TABLE


def crc16(data: bytes | np.ndarray, crc: int = 0) -> int:
    tbl = _crc16_table()
    c = (~crc) & 0xFFFF
    arr = np.frombuffer(bytes(data), np.uint8) if not isinstance(data, np.ndarray) else data
    try:
        from ..native import crc16_native

        return crc16_native(arr, crc)
    except ImportError:
        pass
    for b in arr.tobytes():
        q = (b ^ (c >> 8)) & 0xFF
        c = ((c << 8) & 0xFFFF) ^ int(tbl[q])
    return (~c) & 0xFFFF
