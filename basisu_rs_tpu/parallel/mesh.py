"""Multi-chip sharding: data-parallel block transcode over a device mesh.

The workload is purely data-parallel (SURVEY.md section 5: blocks and slices
are independent; no cross-chip collectives are required by the math), so the
mesh is 1-D and inputs shard over the block axis.  Collectives appear only in
aggregation (global error counts / texel statistics), which ride ICI via
psum inside shard_map.

Two sharded paths:

  - `sharded_transcode` (production): host mode-partitioning + per-mode
    kernels (Pallas on TPU, XLA lane fns on CPU meshes) inside shard_map.
    Each block runs exactly one mode's arithmetic — this is the reference's
    hot loop (src/uastc.rs:157-165) parallelized without redundancy.
  - `sharded_transcode_step` (all-modes): a single static graph computing all
    19 modes and selecting; kept for tiny batches and single-jit entry points.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dispatch import (
    _bucket,
    _mode_kernel,
    partitioned_transcode,
    transcode_all_modes_fn,
)

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        # Not enough chips on the default backend: fall back to the virtual
        # CPU mesh (xla_force_host_platform_device_count) for dry runs.
        devices = jax.devices("cpu")
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (BLOCK_AXIS,))


def sharded_transcode_step(target: str, mesh: Mesh):
    """A jitted, mesh-sharded transcode step.

    lanes uint32[N, 4] (N divisible by mesh size) -> (out lanes, global error
    count).  The per-shard compute is the all-modes kernel; the error count is
    a psum riding ICI.
    """
    fn = transcode_all_modes_fn(target)

    def step(lanes):
        out, err = fn(lanes)
        total_err = jax.lax.psum(jnp.sum(err.astype(jnp.int32)), BLOCK_AXIS)
        return out, total_err

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=P(BLOCK_AXIS, None),
        out_specs=(P(BLOCK_AXIS, None), P()),
    )
    return jax.jit(sharded)


def shard_blocks(lanes: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a [N,4] lane tensor onto the mesh, padding N to the mesh size."""
    n_dev = mesh.devices.size
    n = lanes.shape[0]
    pad = (-n) % n_dev
    if pad:
        lanes = np.concatenate([lanes, np.zeros((pad, lanes.shape[1]), lanes.dtype)], axis=0)
    sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))
    return jax.device_put(jnp.asarray(lanes), sharding)


# ---------------------------------------------------------------------------
# Production path: per-mode kernels sharded over the mesh
# ---------------------------------------------------------------------------


def mesh_backend(mesh: Mesh) -> str:
    """Kernel backend for this mesh's devices: Pallas on TPU (vectorized VMEM
    gathers), XLA lane fns elsewhere (CPU meshes / dry runs)."""
    platform = mesh.devices.flat[0].platform
    return "pallas" if platform in ("tpu", "axon") else "xla"


@lru_cache(maxsize=None)
def _sharded_mode_step_cached(target: str, mode_id: int, mesh: Mesh, backend: str):
    kernel = _mode_kernel(target, mode_id, backend)

    def step(lanes):
        out, err = kernel(lanes)
        total_err = jax.lax.psum(jnp.sum(err.astype(jnp.int32)), BLOCK_AXIS)
        return out, err, total_err

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=P(BLOCK_AXIS, None),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P()),
        # pallas_call outputs carry no vma metadata; the specs above are
        # exact (everything varies over the block axis except the psum).
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_mode_step(target: str, mode_id: int, mesh: Mesh, backend: str | None = None):
    """A jitted, mesh-sharded *single-mode* transcode step.

    lanes uint32[N, 4] (N divisible by mesh size, all blocks of `mode_id`) ->
    (out lanes uint32[N, W], err bool[N], global error count).  Per-shard
    compute is the mode-specialized kernel (Pallas on TPU), so there is no
    all-modes redundancy; the error count is a psum riding ICI.
    """
    return _sharded_mode_step_cached(target, mode_id, mesh, backend or mesh_backend(mesh))


def sharded_transcode(blocks_u8, target: str, mesh: Mesh, backend: str | None = None):
    """Production multi-chip batch transcode: numpy uint8 [N,16] -> (out, err).

    The shared partition/pad/scatter orchestration lives in
    ops.dispatch.partitioned_transcode; here each mode group is padded to a
    power-of-two bucket *per shard*, placed onto the mesh block axis, and run
    through its mode-specialized kernel inside shard_map.  Output dtype rules
    match ops.dispatch.transcode_blocks.
    """
    backend = backend or mesh_backend(mesh)
    n_dev = mesh.devices.size
    sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))

    def run_group(mode_id, group):
        step = sharded_mode_step(target, mode_id, mesh, backend)
        o, e, _ = step(jax.device_put(jnp.asarray(group), sharding))
        return o, e

    return partitioned_transcode(
        blocks_u8, target, lambda m: n_dev * _bucket(-(-m // n_dev)), run_group
    )
