"""Multi-host corpus fan-out.

The workload has no cross-chip math (SURVEY.md section 5: slices and blocks
are independent), so the multi-host story is pure work distribution: each
host process takes a deterministic shard of the corpus file list over DCN-free
local I/O, transcodes on its local chips, and (optionally) all-gathers only
scalar statistics.  This module provides the minimal pieces:

  - `initialize()`: jax.distributed bootstrap (no-op on a single host)
  - `shard_corpus(paths)`: deterministic per-process file assignment
  - `global_stats(...)`: psum'd texel/error counters across all hosts
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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


def global_stats(local_texels: int, local_errors: int):
    """All-reduce scalar counters across every chip/host.  Uses a psum over
    all devices; on one host this degenerates to a local sum."""
    devices = np.array(jax.devices())
    mesh = jax.sharding.Mesh(devices, ("d",))

    def reduce_fn(x):
        return jax.lax.psum(x, "d")

    fn = jax.jit(
        jax.shard_map(
            reduce_fn,
            mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("d"),
            out_specs=jax.sharding.PartitionSpec(),
        )
    )
    arr = jnp.zeros((len(devices), 2), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)
    arr = arr.at[0, 0].set(local_texels).at[0, 1].set(local_errors)
    out = fn(arr)  # [1, 2] (per-shard rows reduced)
    return int(out[0, 0]), int(out[0, 1])
