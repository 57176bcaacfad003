"""Device compute ops: vectorized per-block transcode kernels."""

from .dispatch import block_modes, transcode_all_modes_fn, transcode_blocks

__all__ = ["block_modes", "transcode_all_modes_fn", "transcode_blocks"]
