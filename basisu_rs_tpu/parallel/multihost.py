"""Multi-host corpus fan-out.

The workload has no cross-chip math (SURVEY.md section 5: slices and blocks
are independent), so the multi-host story is pure work distribution: each
host process takes a deterministic shard of the corpus file list over DCN-free
local I/O, transcodes on its local chips, and all-gathers only scalar
statistics.  This module provides the minimal pieces:

  - `initialize()`: jax.distributed bootstrap (no-op on a single host)
  - `shard_corpus(paths)`: deterministic per-process file assignment
  - `global_stats(...)`: texel/error counters summed across all hosts

Exercised by tests/test_multihost.py, including a real 2-process
jax.distributed run over the CPU backend.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bootstrap jax.distributed when running multi-process; safe no-op for
    single-host runs (the common case in this repo's environment)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_corpus(paths: list) -> list:
    """The subset of corpus files this process owns (round-robin by index;
    deterministic across processes, no communication needed)."""
    pid = jax.process_index()
    n = jax.process_count()
    return [p for i, p in enumerate(paths) if i % n == pid]


def global_stats(local_texels: int, local_errors: int) -> tuple[int, int]:
    """Sum scalar counters across every host process.

    Counters travel as 31-bit int32 limbs (jax downcasts int64 arrays when
    x64 is off - the previous psum wrapped at 2.1e9 texels, about 50 ms of
    work at bench rates) and are recombined in arbitrary-precision Python
    ints, so counts are exact up to 2^62.  Single-process calls never touch
    the device."""
    if jax.process_count() == 1:
        return int(local_texels), int(local_errors)
    from jax.experimental import multihost_utils

    limbs = np.array(
        [v for c in (local_texels, local_errors) for v in (c & 0x7FFFFFFF, c >> 31)],
        np.int32,
    )
    gathered = np.asarray(multihost_utils.process_allgather(limbs)).reshape(-1, 4)
    totals = [0, 0]
    for row in gathered:
        totals[0] += int(row[0]) + (int(row[1]) << 31)
        totals[1] += int(row[2]) + (int(row[3]) << 31)
    return totals[0], totals[1]
