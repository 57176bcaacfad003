"""High-level transcoder pipelines.

This is the production layer a pipeline integrates with: it owns device
placement, mode partitioning, multi-slice batching, optional mesh sharding,
and profiling counters.  The file-level `read_to_*` functions are thin
wrappers for reference-API parity; these classes are the TPU-native surface
for corpus-scale work (BASELINE.json configs 3-5).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..api import BasisError
from ..ops.bits import bytes_from_lanes_np, lanes_from_bytes_np
from ..ops.dispatch import INVALID_MODE, _REGISTRY, _ensure_registered, _mode_kernel, block_modes
from ..utils.profiling import Profiler

@dataclass
class TranscodeResult:
    """Device-side result of a batch transcode: per-mode groups + scatter
    metadata.  `gather()` materializes host output in original block order."""

    n: int
    out_words: int
    target: str
    groups: list  # (host indices, valid_count, device out, device err)
    invalid: np.ndarray

    def gather(self):
        out = np.zeros((self.n, self.out_words), np.uint32)
        err = self.invalid.copy()
        for idx, m, o, e in self.groups:
            out[idx] = np.asarray(o)[:m]
            err[idx] |= np.asarray(e)[:m]
        if self.target == "rgba":
            return out, err
        return bytes_from_lanes_np(out), err


class UastcTranscoder:
    """Mode-partitioned batch transcoder for UASTC blocks.

    Keeps per-mode kernels warm, dispatches all groups asynchronously, and
    reports per-stage throughput via `.profiler`.
    """

    def __init__(self, target: str, backend: str | None = None):
        _ensure_registered()
        if target not in _REGISTRY:
            raise BasisError(f"unknown target {target!r}")
        self.target = target
        self.backend = backend
        self.out_words = _REGISTRY[target][1]
        self.profiler = Profiler()

    def transcode_async(self, blocks_u8: np.ndarray) -> TranscodeResult:
        """Partition + dispatch; returns without waiting for device work."""
        blocks_u8 = np.ascontiguousarray(blocks_u8, np.uint8).reshape(-1, 16)
        n = blocks_u8.shape[0]
        with self.profiler.stage("host/partition", texels=n * 16):
            modes = block_modes(blocks_u8)
            lanes = lanes_from_bytes_np(blocks_u8, 4)
            order = np.argsort(modes, kind="stable")
            sorted_modes = modes[order]
            boundaries = np.searchsorted(sorted_modes, np.arange(20))
        groups = []
        with self.profiler.stage("device/dispatch", texels=n * 16):
            for mode_id in range(19):
                lo, hi = boundaries[mode_id], boundaries[mode_id + 1]
                if lo == hi:
                    continue
                idx = order[lo:hi]
                k = _mode_kernel(self.target, mode_id, self.backend)
                o, e = k(jnp.asarray(lanes[idx]))
                groups.append((idx, hi - lo, o, e))
        return TranscodeResult(n, self.out_words, self.target, groups, modes == INVALID_MODE)

    def transcode(self, blocks_u8: np.ndarray):
        """Synchronous host-to-host transcode: (out, err) numpy arrays."""
        res = self.transcode_async(blocks_u8)
        with self.profiler.stage("host/gather", texels=res.n * 16):
            return res.gather()

class CorpusTranscoder:
    """Multi-file / multi-slice (mipmapped) batch pipeline (BASELINE config 5).

    Concatenates the blocks of many slices into one large batch so that small
    mip levels ride along with base levels in the same per-mode kernels, then
    splits results back per slice.  Slice boundaries are host metadata only -
    the device sees one dense batch.
    """

    def __init__(self, target: str, backend: str | None = None):
        self.inner = UastcTranscoder(target, backend)

    def transcode_slices(self, slices: list[np.ndarray]):
        """slices: list of uint8 [n_i, 16] block arrays.
        Returns list of per-slice outputs (same dtype rules as transcode)."""
        counts = [np.asarray(s).reshape(-1, 16).shape[0] for s in slices]
        batch = np.concatenate([np.asarray(s).reshape(-1, 16) for s in slices], axis=0)
        out, err = self.inner.transcode(batch)
        if err.any():
            raise BasisError(f"{int(err.sum())} invalid blocks in corpus batch")
        outs = []
        ofs = 0
        for c in counts:
            outs.append(out[ofs : ofs + c])
            ofs += c
        return outs

    @property
    def profiler(self) -> Profiler:
        return self.inner.profiler
