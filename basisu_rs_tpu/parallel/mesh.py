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

import warnings
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


def make_mesh(n_devices: int | None = None, *, allow_cpu_fallback: bool = False) -> Mesh:
    """A 1-D block-axis mesh over the first n_devices default-backend devices
    (all of them if None).

    When the default backend has fewer than n_devices, this RAISES rather
    than silently running on virtual CPU devices — a CPU mesh is orders of
    magnitude slower than the chips the caller asked for.  Dry runs that
    really want the xla_force_host_platform_device_count CPU mesh opt in
    with allow_cpu_fallback=True, which still warns loudly."""
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        if not allow_cpu_fallback:
            raise ValueError(
                f"requested a {n_devices}-device mesh but the default backend "
                f"('{devices[0].platform}') has {len(devices)} device(s); for a "
                "sharding dry run on virtual CPU devices pass "
                "allow_cpu_fallback=True"
            )
        cpu = jax.devices("cpu")
        if len(cpu) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} on the default "
                f"backend and {len(cpu)} cpu"
            )
        warnings.warn(
            f"make_mesh: default backend ('{devices[0].platform}') has only "
            f"{len(devices)} device(s); falling back to {n_devices} virtual CPU "
            "devices (dry-run performance, not chip performance)",
            stacklevel=2,
        )
        devices = cpu
    if n_devices is not None:
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


# ---------------------------------------------------------------------------
# ETC1S: codebooks replicated, index streams sharded over the block axis
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _sharded_etc1s_cached(
    kind: str, ep_chunks: int, sel_chunks: int, rows_per_shard: int,
    mesh: Mesh, backend: str, interpret: bool,
):
    from ..ops.etc1s_pallas import N_IDX

    n_idx = N_IDX[kind]
    if backend == "pallas":
        from ..ops.etc1s_pallas import _build

        inner = _build(kind, ep_chunks, sel_chunks, rows_per_shard, interpret)

        def step(ep_tab, sel_tab, *rest):
            outs = inner(ep_tab, sel_tab, *rest)
            return jnp.stack(outs, axis=-1)  # [rows, 128, W]

        in_specs = (P(), P()) + (P(BLOCK_AXIS, None),) * n_idx + (P(),)
        out_specs = P(BLOCK_AXIS, None, None)
    else:
        from ..ops.etc1s import (
            etc1s_alpha_kernel,
            etc1s_etc1_kernel,
            etc1s_rgba_kernel,
        )

        fn = {
            "rgba": etc1s_rgba_kernel,
            "alpha": etc1s_alpha_kernel,
            "etc1": etc1s_etc1_kernel,
        }[kind]

        def step(ep_tab, sel_tab, ep_idx, sel_idx):
            return fn(ep_tab, sel_tab, ep_idx, sel_idx)  # [n, W]

        in_specs = (P(), P(), P(BLOCK_AXIS), P(BLOCK_AXIS))
        out_specs = P(BLOCK_AXIS, None)
    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    return jax.jit(sharded)


def sharded_etc1s_transcode(
    kind: str, endpoints_np, selectors_np, ep_idx_np, sel_idx_np, mesh: Mesh,
    backend: str | None = None, interpret: bool = False, extra_idx=(),
):
    """Multi-chip ETC1S back-end: codebooks are replicated over the mesh
    (they are shared by every block of a file, container/basis.py), the
    per-block (endpoint, selector) index streams shard over the block axis.
    No collectives are required by the math - like the UASTC path this is
    purely data-parallel (mod.rs:97-186 per-block closures).

    kind: 'rgba' (packed texels), 'alpha' (G-channel bytes), 'etc1'
    (block lanes), or 'rgba_alpha' (fused RGB+alpha slice pair; pass the
    alpha slice's index streams as extra_idx=(a_ep_idx, a_sel_idx)).
    endpoints_np: uint8 [E,4]; selectors_np: uint8 [S,4] row bytes.
    Returns uint32 [N, W] (W = 16/16/2/16).
    """
    from ..ops.etc1s_pallas import OUT_WORDS

    backend = backend or mesh_backend(mesh)
    n_dev = mesh.devices.size
    n = len(ep_idx_np)
    out_words = OUT_WORDS[kind]
    repl = NamedSharding(mesh, P())
    if backend != "pallas" and kind == "rgba_alpha":
        # CPU meshes: compose the plain kernels (the fusion is a launch/HBM
        # optimization specific to the Pallas path)
        rgba = sharded_etc1s_transcode(
            "rgba", endpoints_np, selectors_np, ep_idx_np, sel_idx_np, mesh,
            backend, interpret,
        )
        a = sharded_etc1s_transcode(
            "alpha", endpoints_np, selectors_np, *extra_idx, mesh, backend,
            interpret,
        )
        return (rgba & np.uint32(0x00FFFFFF)) | (a << np.uint32(24))

    if kind == "etc1":
        from ..ops.etc1s import selector_wire_words_np

        sel_natural = selector_wire_words_np(selectors_np)
    else:
        sel_natural = selectors_np

    if backend == "pallas":
        from ..ops.etc1s_pallas import (
            LANE,
            _packed_mods_np,
            bucket_rows,
            pack_endpoints_np,
            pack_selectors_np,
            pack_wire_np,
        )
        from ..ops import bits

        ep_tab = pack_endpoints_np(endpoints_np)
        sel_tab = (
            pack_wire_np(sel_natural) if kind == "etc1"
            else pack_selectors_np(selectors_np)
        )
        # per-shard length: the same pow2-of-whole-tiles bucketing as the
        # single-chip path (etc1s_pallas.bucket_rows), so per-shard shapes
        # hit the same compile cache
        per = bucket_rows(-(-n // n_dev), kind) * LANE
        n_pad = per * n_dev
        sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))

        def pad(a):
            out = np.zeros(n_pad, np.int32)
            out[:n] = a
            return jax.device_put(jnp.asarray(out.reshape(-1, LANE)), sharding)

        call = _sharded_etc1s_cached(
            kind, ep_tab.shape[0], sel_tab.shape[0], per // LANE, mesh,
            backend, interpret,
        )
        out = call(
            jax.device_put(jnp.asarray(ep_tab), repl),
            jax.device_put(jnp.asarray(sel_tab), repl),
            *[pad(a) for a in (ep_idx_np, sel_idx_np, *extra_idx)],
            jax.device_put(jnp.asarray(bits.pad_table_for_kernel(_packed_mods_np())), repl),
        )
        return np.asarray(out).reshape(n_pad, out_words)[:n]

    n_pad = n + ((-n) % n_dev)
    ep_idx = np.zeros(n_pad, np.int32)
    ep_idx[:n] = ep_idx_np
    sel_idx = np.zeros(n_pad, np.int32)
    sel_idx[:n] = sel_idx_np
    call = _sharded_etc1s_cached(kind, 0, 0, 0, mesh, backend, interpret)
    sharding = NamedSharding(mesh, P(BLOCK_AXIS))
    out = call(
        jax.device_put(jnp.asarray(endpoints_np), repl),
        jax.device_put(jnp.asarray(sel_natural), repl),
        jax.device_put(jnp.asarray(ep_idx), sharding),
        jax.device_put(jnp.asarray(sel_idx), sharding),
    )
    return np.asarray(out)[:n]
