"""Multi-chip sharding: data-parallel block transcode over a device mesh.

The workload is purely data-parallel (SURVEY.md section 5: blocks and slices
are independent; no cross-chip collectives are required by the math), so the
mesh is 1-D and inputs shard over the block axis.  Collectives appear only in
aggregation (global error counts / texel statistics), which ride ICI via
psum inside shard_map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.dispatch import transcode_all_modes_fn

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
