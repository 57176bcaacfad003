#!/usr/bin/env python
"""Throughput benchmark: aggregate UASTC->BC7 on the attached TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mtexels/s", "vs_baseline": N}

vs_baseline is against the BASELINE.json north star of 5 Gtexels/s aggregate
UASTC->BC7 on a v5e-8, scaled to the locally attached chip count (1.0 means
on-track for the 8-chip target; the workload is embarrassingly data-parallel,
so per-chip rates compose linearly across a mesh).

Methodology: the workload is the golden block corpus - a realistic
all-19-mode mix - tiled to a large batch and partitioned per mode.  Each
mode kernel is timed as a *dependency-chained* `lax.fori_loop` of R
iterations inside one jit with a scalar readback, and the rate is
(T(R1) - T(R0)) / (R1 - R0).  This is required for honest numbers here:
under the axon tunnel `block_until_ready` does not actually block, so naive
dispatch-loop timings over-report by orders of magnitude.  The aggregate
rate is total_blocks / sum(per-mode per-iteration times).

BENCH_ALL=1 additionally reports the other four targets on stderr.
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache (env vars are ignored after the axon
# sitecustomize initializes config; use the config API).
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from basisu_rs_tpu.ops.bits import lanes_from_bytes_np
from basisu_rs_tpu.ops.dispatch import INVALID_MODE, block_modes
from basisu_rs_tpu.ops.pallas_kernels import LANE, _pallas_build, rows_for_target

FIXTURE = Path(__file__).parent / "tests" / "fixtures" / "golden_blocks.npz"
TARGET_GTEXELS_V5E8 = 5.0e9  # BASELINE.json north star, 8 chips
N_BLOCKS = int(os.environ.get("BENCH_N", 1 << 23))  # 8.4M blocks, 134M texels


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_batch(n_blocks: int) -> np.ndarray:
    blocks = np.load(FIXTURE)["bc7_in"]
    reps = -(-n_blocks // len(blocks))
    return np.tile(blocks, (reps, 1))[:n_blocks]


def _measure_chained(chained, xp, reps_hi: int = 1026, samples: int = 8) -> float:
    """Per-iteration seconds from a chained fori_loop at two trip counts.

    Robustness against the shared tunnel/chip: (a) the high trip count is
    large enough that the measured region is tens of ms, dwarfing scheduling
    bursts; (b) the estimate is min(t_hi) - min(t_lo) - contention only ever
    ADDS time, so per-trip-count minima are the least contaminated
    estimates, where a median of per-pair diffs goes negative or collapses
    whenever a burst lands inside one pair."""
    int(chained(xp, 2))
    int(chained(xp, reps_hi))  # warm both trip counts
    t_lo, t_hi = [], []
    for _ in range(samples):
        t0 = time.perf_counter()
        int(chained(xp, 2))
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        int(chained(xp, reps_hi))
        t_hi.append(time.perf_counter() - t0)
    return max((min(t_hi) - min(t_lo)) / (reps_hi - 2), 1e-9)


def mode_rate(target: str, mode_id: int, lanes_np: np.ndarray):
    """Per-iteration seconds for this mode group (chained-loop timing)."""
    n = lanes_np.shape[0]
    rows = rows_for_target(target)
    build, tables, _ = _pallas_build(target, mode_id, rows)
    tile = rows * LANE
    n_pad = ((n + tile - 1) // tile) * tile
    xp = jnp.zeros((n_pad, 4), jnp.uint32).at[:n].set(jnp.asarray(lanes_np))
    call = build(n_pad // LANE)

    @partial(jax.jit, static_argnums=1)
    def chained(x, reps):
        def body(i, c):
            planes = [(x[:, w] ^ c).reshape(n_pad // LANE, LANE) for w in range(4)]
            outs = call(*planes, *tables)
            return outs[0][0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    return _measure_chained(chained, xp), n_pad


def bench_target(target: str, blocks: np.ndarray) -> float:
    modes = block_modes(blocks)
    lanes = lanes_from_bytes_np(blocks, 4)
    total_s = 0.0
    total_blocks = 0
    for mode_id in np.unique(modes):
        if mode_id == INVALID_MODE:
            continue
        idx = np.nonzero(modes == mode_id)[0]
        per, n_pad = mode_rate(target, int(mode_id), lanes[idx])
        total_s += per
        total_blocks += n_pad
        log(f"  {target} mode {mode_id:2d}: {n_pad/per/1e6:7.1f} Mblocks/s")
    return total_blocks * 16 / total_s


def mode_rate_sharded(target: str, mode_id: int, lanes_np: np.ndarray, mesh):
    """Per-iteration seconds for this mode group through the *sharded*
    per-mode Pallas step: each shard runs its own dependency-chained loop,
    then a psum forces cross-chip completion."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from basisu_rs_tpu.parallel.mesh import BLOCK_AXIS

    n_dev = mesh.devices.size
    n = lanes_np.shape[0]
    rows = rows_for_target(target)
    build, tables, _ = _pallas_build(target, mode_id, rows)
    tile = rows * LANE * n_dev
    n_pad = ((n + tile - 1) // tile) * tile
    xp = jnp.zeros((n_pad, 4), jnp.uint32).at[:n].set(jnp.asarray(lanes_np))
    xp = jax.device_put(xp, NamedSharding(mesh, P(BLOCK_AXIS, None)))
    call = build(n_pad // n_dev // LANE)

    def per_shard(x, reps):
        def body(i, c):
            planes = [(x[:, w] ^ c).reshape(-1, LANE) for w in range(4)]
            outs = call(*planes, *tables)
            return outs[0][0, 0]

        r = jax.lax.fori_loop(0, reps, body, jnp.uint32(0))
        return jax.lax.psum(r, BLOCK_AXIS)

    @partial(jax.jit, static_argnums=1)
    def chained(x, reps):
        return jax.shard_map(
            partial(per_shard, reps=reps),
            mesh=mesh,
            in_specs=P(BLOCK_AXIS, None),
            out_specs=P(),
            check_vma=False,
        )(x)

    return _measure_chained(chained, xp), n_pad


def bench_target_sharded(target: str, blocks: np.ndarray) -> float:
    """Aggregate rate through the production sharded step (mesh over all
    locally attached chips; on one chip this demonstrates per-chip parity of
    the sharded path with the plain Pallas path)."""
    from basisu_rs_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    modes = block_modes(blocks)
    lanes = lanes_from_bytes_np(blocks, 4)
    total_s = 0.0
    total_blocks = 0
    for mode_id in np.unique(modes):
        if mode_id == INVALID_MODE:
            continue
        idx = np.nonzero(modes == mode_id)[0]
        per, n_pad = mode_rate_sharded(target, int(mode_id), lanes[idx], mesh)
        total_s += per
        total_blocks += n_pad
        log(f"  sharded {target} mode {mode_id:2d}: {n_pad/per/1e6:7.1f} Mblocks/s")
    return total_blocks * 16 / total_s


def bench_etc1s(n: int = 1 << 21, e: int = 2048, s: int = 2048) -> dict:
    """ETC1S back-end rates (BASELINE configs 2 and 4): codebook gather +
    palette kernels over a synthetic codebook/index stream."""
    from basisu_rs_tpu.ops import bits
    from basisu_rs_tpu.ops.etc1s import selector_wire_words_np
    from basisu_rs_tpu.ops.etc1s_pallas import (
        LANE as EL,
        _build,
        _packed_mods_np,
        pack_endpoints_np,
        pack_selectors_np,
        pack_wire_np,
        rows_for_kind,
    )

    rng = np.random.default_rng(5)
    endpoints = np.zeros((e, 4), np.uint8)
    endpoints[:, :3] = rng.integers(0, 32, (e, 3))
    endpoints[:, 3] = rng.integers(0, 8, e)
    selectors = rng.integers(0, 256, (s, 4)).astype(np.uint8)
    ep_idx = rng.integers(0, e, n).astype(np.int32)
    sel_idx = rng.integers(0, s, n).astype(np.int32)
    ep_tab = jnp.asarray(pack_endpoints_np(endpoints))
    mods = jnp.asarray(bits.pad_table_for_kernel(_packed_mods_np()))
    rates = {}
    sel_tab_rgba = jnp.asarray(pack_selectors_np(selectors))
    # rgba_alpha consumes an (rgb, alpha) index-stream PAIR per output block
    # (the fused one-launch kernel behind read_to_rgba's alpha pairing).
    a_ep_idx = rng.integers(0, e, n).astype(np.int32)
    a_sel_idx = rng.integers(0, s, n).astype(np.int32)
    for kind, tab in (
        ("rgba", sel_tab_rgba),
        ("rgba_alpha", sel_tab_rgba),
        ("etc1", jnp.asarray(pack_wire_np(selector_wire_words_np(selectors)))),
    ):
        tile = rows_for_kind(kind) * EL
        n_pad = ((n + tile - 1) // tile) * tile
        epi = jnp.asarray(np.resize(ep_idx, n_pad).reshape(-1, EL))
        seli = jnp.asarray(np.resize(sel_idx, n_pad).reshape(-1, EL))
        extra = ()
        if kind == "rgba_alpha":
            extra = (
                jnp.asarray(np.resize(a_ep_idx, n_pad).reshape(-1, EL)),
                jnp.asarray(np.resize(a_sel_idx, n_pad).reshape(-1, EL)),
            )
        call = _build(kind, ep_tab.shape[0], tab.shape[0], n_pad // EL, False)

        @partial(jax.jit, static_argnums=2)
        def chained(a, b, reps, call=call, tab=tab, extra=extra):
            def body(i, c):
                outs = call(ep_tab, tab, a ^ (c & 1023), b, *extra, mods)
                return outs[0][0, 0].astype(jnp.int32)

            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        rates[kind] = n_pad * 16 / _measure_chained(
            lambda x, reps, c=chained: c(epi, seli, reps), epi
        )
    return rates


def bench_etc1s_sharded(n: int = 1 << 21, e: int = 2048, s: int = 2048) -> float:
    """ETC1S->RGBA rate through the mesh-sharded path (codebooks replicated,
    index streams sharded; on one chip this demonstrates per-chip parity of
    the sharded ETC1S path with the plain kernel)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from basisu_rs_tpu.ops import bits
    from basisu_rs_tpu.ops.etc1s_pallas import (
        LANE as EL,
        _build,
        _packed_mods_np,
        pack_endpoints_np,
        pack_selectors_np,
        rows_for_kind,
    )
    from basisu_rs_tpu.parallel.mesh import BLOCK_AXIS, make_mesh

    mesh = make_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(5)
    endpoints = np.zeros((e, 4), np.uint8)
    endpoints[:, :3] = rng.integers(0, 32, (e, 3))
    endpoints[:, 3] = rng.integers(0, 8, e)
    selectors = rng.integers(0, 256, (s, 4)).astype(np.uint8)
    ep_tab = jnp.asarray(pack_endpoints_np(endpoints))
    tab = jnp.asarray(pack_selectors_np(selectors))
    mods = jnp.asarray(bits.pad_table_for_kernel(_packed_mods_np()))

    tile = rows_for_kind("rgba") * EL * n_dev
    n_pad = ((n + tile - 1) // tile) * tile
    ep_idx = np.resize(rng.integers(0, e, n).astype(np.int32), n_pad)
    sel_idx = np.resize(rng.integers(0, s, n).astype(np.int32), n_pad)
    sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))
    epi = jax.device_put(jnp.asarray(ep_idx.reshape(-1, EL)), sharding)
    seli = jax.device_put(jnp.asarray(sel_idx.reshape(-1, EL)), sharding)
    call = _build("rgba", ep_tab.shape[0], tab.shape[0], n_pad // n_dev // EL, False)

    def per_shard(a, b, reps):
        def body(i, c):
            outs = call(ep_tab, tab, a ^ (c & 1023), b, mods)
            return outs[0][0, 0].astype(jnp.int32)

        r = jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return jax.lax.psum(r, BLOCK_AXIS)

    @partial(jax.jit, static_argnums=1)
    def chained(x, reps):
        return jax.shard_map(
            partial(per_shard, reps=reps),
            mesh=mesh,
            in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS, None)),
            out_specs=P(),
            check_vma=False,
        )(x, seli)

    return n_pad * 16 / _measure_chained(lambda x, reps: chained(x, reps), epi)


def bench_etc1s_host(n_blocks: int = 1 << 18) -> float:
    """Single-core rate of the C++ ETC1S entropy front-end (blocks/s) - the
    host half of the ETC1S pipeline budget (BUILD_STATUS roofline)."""
    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    from bench_etc1s_host import make_slice

    nbx = 1024
    nby = n_blocks // nbx
    models, data, exp_ep, _ = make_slice(nbx, nby)
    n = nbx * nby
    ep, _ = models.decode_slice(nbx, nby, data)
    assert (ep == exp_ep).all()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        models.decode_slice(nbx, nby, data)
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_corpus(n_files: int = 8, nbx: int = 64, nby: int = 64) -> None:
    """End-to-end file-level pipeline (BasisCorpusPipeline): synthetic mixed
    corpus on disk -> parse + CRC on worker threads (+ C++ ETC1S front-end)
    -> device kernels -> host output.

    NB: end-to-end numbers on THIS setup are bounded by the axon tunnel's
    ~0.3 MB/s device-to-host path (a transport artifact, not a pipeline
    property; see CLAUDE.md) - the stage table separates the host share."""
    import tempfile
    from pathlib import Path as P

    from basisu_rs_tpu.container.writer import write_etc1s_basis, write_uastc_basis
    from basisu_rs_tpu.models.pipeline import BasisCorpusPipeline

    rng = np.random.default_rng(17)
    blocks = build_batch(nbx * nby)
    E, S = 128, 96
    endpoints = np.zeros((E, 4), np.uint8)
    endpoints[:, :3] = rng.integers(0, 32, (E, 3))
    endpoints[:, 3] = rng.integers(0, 8, E)
    selectors = rng.integers(0, 256, (S, 4)).astype(np.uint8)

    with tempfile.TemporaryDirectory() as td:
        uastc_paths, etc1s_paths = [], []
        for i in range(n_files):
            p = P(td) / f"u{i}.basis"
            p.write_bytes(
                write_uastc_basis(
                    [dict(blocks=blocks, nbx=nbx, nby=nby, orig_width=nbx * 4, orig_height=nby * 4)]
                )
            )
            uastc_paths.append(p)
            p = P(td) / f"e{i}.basis"
            p.write_bytes(
                write_etc1s_basis(
                    endpoints, selectors,
                    [dict(ep_idx=rng.integers(0, E, nbx * nby), sel_idx=rng.integers(0, S, nbx * nby),
                          nbx=nbx, nby=nby, orig_width=nbx * 4, orig_height=nby * 4)],
                )
            )
            etc1s_paths.append(p)

        for label, target, paths in (
            ("UASTC->BC7", "bc7", uastc_paths),
            ("ETC1S->ETC1", "etc1", etc1s_paths),
        ):
            pipe = BasisCorpusPipeline(target, workers=min(8, os.cpu_count() or 1))
            list(pipe.run(paths))  # warm compile + page cache
            pipe.profiler.stats.clear()
            t0 = time.perf_counter()
            results = list(pipe.run(paths))
            dt = time.perf_counter() - t0
            assert not pipe.errors, pipe.errors
            texels = sum(r.texels for r in results)
            log(
                f"corpus {label}: {len(results)/dt:6.1f} files/s, "
                f"{texels/dt/1e6:8.1f} Mtex/s end-to-end (D2H-tunnel-bound here)"
            )
            for line in pipe.profiler.report().splitlines():
                log(f"    {line}")


def sync_rtt_s(samples: int = 6) -> float:
    """Per-sync tunnel round-trip floor: host time to read back one fresh
    device scalar.  Every synchronous corpus result pays at least this."""
    for _ in range(2):
        int(jnp.uint32(1) + 1)
    ts = []
    for i in range(samples):
        t0 = time.perf_counter()
        int(jnp.uint32(i) + 1)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def launch_overhead_s(samples: int = 3, n: int = 24) -> float:
    """Marginal host cost of ONE additional kernel enqueue (round-4 verdict
    item 1's direct no-op-launch probe): a dependency chain of n trivial
    jitted launches with one final sync, minus the 1-launch run, per extra
    launch.  The mode-partitioned UASTC corpus dispatch pays this 19 times
    per corpus, which is what bounds the pipelined rate on a TINY bench
    corpus (device compute is ~us; a production-size corpus amortizes it
    linearly)."""
    f = jax.jit(lambda x: x + jnp.uint32(1))
    x = jnp.zeros((8, 128), jnp.uint32)

    def run(k):
        t0 = time.perf_counter()
        y = x
        for _ in range(k):
            y = f(y)
        int(jnp.sum(y, dtype=jnp.uint32))
        return time.perf_counter() - t0

    run(n)  # compile + warm
    best = float("inf")
    for _ in range(samples):
        best = min(best, max((run(n) - run(1)) / (n - 1), 1e-9))
    return best


def bench_corpus_device(n_files: int = 8, nbx: int = 128, nby: int = 128) -> dict:
    """End-to-end corpus pipeline rates with outputs kept DEVICE-RESIDENT:
    host parse + CRC (+ C++ ETC1S front-end) -> device kernels -> outputs
    folded into one on-device u32 checksum; only scalars ride D2H.

    Two rates per target, plus the measured stage decomposition that
    explains the gap between them and the kernel rate (round-4 verdict
    item 1 - the old single number was committed undiagnosed):

    - SYNC (one-shot latency): parse -> dispatch -> wait.  Bounded below by
      one tunnel sync round-trip (~27-80 ms here, `sync_rtt_ms`); for a
      corpus of a few Mtexels that latency IS the number.  Reported so the
      floor is visible, not hidden.
    - PIPELINED (steady state): R reps of the full per-corpus work (fresh
      parse + dispatch each rep) with every rep's checksum folded into one
      device scalar, ONE sync at the end; the marginal per-rep time
      (T(R_hi)-T(R_lo))/(R_hi-R_lo) cancels the sync latency exactly the
      way a streaming ML input pipeline does by never syncing per corpus.
      What remains is real per-corpus cost: single-threaded Python/numpy
      parse + partition + enqueue on this 1-vCPU host (the stage table
      attributes it), not device time (~25 us/corpus at kernel rate).

    Stage table (logged per target): parse, dispatch-enqueue, sync-wait,
    sync RTT floor, and the device-compute share implied by the kernel
    bench."""
    import tempfile
    from pathlib import Path as P

    from basisu_rs_tpu.container import basis as basis_mod
    from basisu_rs_tpu.container.writer import write_etc1s_basis, write_uastc_basis
    from basisu_rs_tpu.models.transcoder import (
        Etc1sFileWork,
        Etc1sMultiCorpusTranscoder,
        UastcTranscoder,
    )

    rng = np.random.default_rng(17)
    blocks = build_batch(nbx * nby)
    E, S = 128, 96
    endpoints = np.zeros((E, 4), np.uint8)
    endpoints[:, :3] = rng.integers(0, 32, (E, 3))
    endpoints[:, 3] = rng.integers(0, 8, E)
    selectors = rng.integers(0, 256, (S, 4)).astype(np.uint8)

    rates = {"sync_rtt_ms": round(sync_rtt_s() * 1e3, 1)}
    log(f"corpus-device sync RTT floor: {rates['sync_rtt_ms']:.1f} ms")
    lo_ms = launch_overhead_s() * 1e3
    rates["launch_overhead_ms"] = round(lo_ms, 2)
    log(
        f"corpus-device per-launch overhead: {lo_ms:.2f} ms/launch "
        f"(x19 mode launches/corpus on the UASTC path: "
        f"~{19 * lo_ms:.0f} ms of the pipelined marginal is launch cost)"
    )
    with tempfile.TemporaryDirectory() as td:
        uastc_paths, etc1s_paths = [], []
        for i in range(n_files):
            p = P(td) / f"u{i}.basis"
            p.write_bytes(
                write_uastc_basis(
                    [dict(blocks=blocks, nbx=nbx, nby=nby, orig_width=nbx * 4, orig_height=nby * 4)]
                )
            )
            uastc_paths.append(p)
            p = P(td) / f"e{i}.basis"
            p.write_bytes(
                write_etc1s_basis(
                    endpoints, selectors,
                    [dict(ep_idx=rng.integers(0, E, nbx * nby), sel_idx=rng.integers(0, S, nbx * nby),
                          nbx=nbx, nby=nby, orig_width=nbx * 4, orig_height=nby * 4)],
                )
            )
            etc1s_paths.append(p)

        tr = UastcTranscoder("bc7")
        etc1s_tr = Etc1sMultiCorpusTranscoder("rgba")

        def parse_uastc(paths):
            batches = []
            for p in paths:
                buf = p.read_bytes()
                h = basis_mod.read_header(buf)
                assert basis_mod.check_file_checksum(buf, h)
                for d in basis_mod.read_slice_descs(buf, h):
                    batches.append(basis_mod._uastc_slice_blocks(d, buf))
            return np.concatenate(batches, axis=0)

        def dispatch_uastc(batch):
            # cross-FILE batching (models.CorpusTranscoder's layout): all
            # files' blocks concatenate into ONE mode-partitioned dispatch -
            # 19 launches for the whole corpus instead of 19 per file.
            res = tr.transcode_async(batch)
            acc = jnp.zeros((), jnp.uint32)
            for _idx, _m, o, _e in res.groups:
                acc = acc + jnp.sum(o, dtype=jnp.uint32)
            return acc, batch.shape[0] * 16

        def parse_etc1s(paths):
            works = []
            for p in paths:
                buf = p.read_bytes()
                h = basis_mod.read_header(buf)
                assert basis_mod.check_file_checksum(buf, h)
                dec = basis_mod.make_etc1s_decoder(h, buf)
                slices = []
                for d in basis_mod.read_slice_descs(buf, h):
                    sl = dec.decode_slice(d.num_blocks_x, d.num_blocks_y, d.data(buf))
                    slices.append((np.asarray(sl.endpoint_index, np.int32),
                                   np.asarray(sl.selector_index, np.int32)))
                works.append(Etc1sFileWork(dec.endpoints, dec.selectors, slices))
            return works

        def dispatch_etc1s(works):
            # the shipped cross-file surface: codebooks concatenate, index
            # streams rebase, bounded launch groups (ADVICE r4: the bench
            # now exercises Etc1sMultiCorpusTranscoder itself, not its
            # private helper - methodology change vs bench_r4_* JSONs).
            outs = etc1s_tr.transcode_files(works, device=True)
            acc = jnp.zeros((), jnp.uint32)
            texels = 0
            for per_file in outs:
                for o in per_file:
                    acc = acc + jnp.sum(o, dtype=jnp.uint32)
                    texels += o.shape[0] * 16
            return acc, texels

        for label, key, parse, dispatch, paths in (
            ("UASTC->BC7", "uastc_bc7", parse_uastc, dispatch_uastc, uastc_paths),
            ("ETC1S->RGBA", "etc1s_rgba", parse_etc1s, dispatch_etc1s, etc1s_paths),
        ):
            int(dispatch(parse(paths))[0])  # warm: compiles + page cache

            # stage decomposition (best-of-3 per stage, one sync per rep)
            st_parse = st_disp = st_sync = float("inf")
            texels = 0
            for _ in range(3):
                t0 = time.perf_counter()
                work = parse(paths)
                t1 = time.perf_counter()
                acc, texels = dispatch(work)
                t2 = time.perf_counter()
                int(acc)
                t3 = time.perf_counter()
                st_parse = min(st_parse, t1 - t0)
                st_disp = min(st_disp, t2 - t1)
                st_sync = min(st_sync, t3 - t2)
            total = st_parse + st_disp + st_sync
            rates[key] = texels / total
            dev_s = texels / 1e6 / 75e3  # ~75 Gtex/s kernel-bench floor
            log(
                f"corpus-device {label} stage table ({texels/1e6:.2f} Mtex): "
                f"parse {st_parse*1e3:.1f} ms, dispatch-enqueue {st_disp*1e3:.1f} ms, "
                f"sync-wait {st_sync*1e3:.1f} ms (RTT floor {rates['sync_rtt_ms']:.1f} ms), "
                f"device compute ~{dev_s*1e3:.2f} ms at kernel rate"
            )
            log(
                f"corpus-device {label} SYNC: {texels/total/1e6:8.1f} Mtex/s "
                f"(one-shot latency incl. tunnel sync)"
            )

            # pipelined steady state: R reps, one sync
            def run_r(r):
                t0 = time.perf_counter()
                total_acc = jnp.zeros((), jnp.uint32)
                for _ in range(r):
                    acc, _ = dispatch(parse(paths))
                    total_acc = total_acc + acc
                int(total_acc)
                return time.perf_counter() - t0

            r_lo, r_hi = 2, 10
            run_r(r_lo)  # warm
            t_lo = min(run_r(r_lo) for _ in range(2))
            t_hi = min(run_r(r_hi) for _ in range(2))
            marginal = max((t_hi - t_lo) / (r_hi - r_lo), 1e-9)
            rates[key + "_pipelined"] = texels / marginal
            log(
                f"corpus-device {label} PIPELINED: {texels/marginal/1e6:8.1f} Mtex/s "
                f"steady-state (marginal per-corpus {marginal*1e3:.1f} ms; "
                f"host parse+enqueue bound - see stage table)"
            )
    return rates


def _probe_device(timeout_s: float) -> bool:
    """True iff the TPU tunnel answers a trivial op within timeout_s.

    Runs in a SUBPROCESS: when the tunnel goes dark (CLAUDE.md: 20-60+ min
    stretches where even jnp.arange(8).sum() hangs), an in-process probe
    would hang this interpreter unrecoverably; a child can be killed."""
    import subprocess

    code = "import jax; print(int(jax.numpy.arange(8).sum()))"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
        return r.returncode == 0 and r.stdout.strip() == "28"
    except subprocess.TimeoutExpired:
        return False


def supervise() -> int:
    """Availability gate + supervised bench run (the round-3 lesson:
    BENCH_r03.json was rc=1/parsed-null because bench.py died on first
    backend touch while the tunnel was dark).

    Loop: probe the tunnel (subprocess + timeout); when it answers, run the
    real bench as a child under a hard timeout (a mid-run dark stretch is
    recoverable - compiles are already in .jax_cache so retries are cheap);
    relay the child's stdout verbatim on success.  On budget exhaustion emit
    a single parseable JSON line with an "error" field, never a traceback."""
    import subprocess

    # Budget default covers the WORST observed tunnel outage (CLAUDE.md:
    # 20-60+ min fully dark stretches) plus a full bench run on the far
    # side; round-4 verdict item 6a - 2700 s gave up mid-outage by design.
    budget_s = float(os.environ.get("BENCH_TUNNEL_BUDGET_S", 7200))
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", 120))
    run_timeout = float(os.environ.get("BENCH_RUN_TIMEOUT_S", 2700))
    t_start = time.monotonic()
    deadline = t_start + budget_s
    env = dict(os.environ, BENCH_CHILD="1")
    attempts, backoff = 0, 60.0
    last_err = "tunnel probe never succeeded"
    timeline = []  # probe/run event log, carried in the error JSON

    def record(event: str):
        timeline.append({"t_s": round(time.monotonic() - t_start, 1), "event": event})

    while True:
        attempts += 1
        if _probe_device(probe_timeout):
            record(f"probe {attempts} ok")
            log(f"[bench supervisor] probe ok (attempt {attempts}); running bench")
            try:
                r = subprocess.run(
                    [sys.executable, __file__], timeout=run_timeout,
                    capture_output=True, text=True, env=env,
                )
            except subprocess.TimeoutExpired as e:
                last_err = f"bench child timed out after {run_timeout:.0f}s (tunnel went dark mid-run?)"
                record("run timeout")
                log(f"[bench supervisor] {last_err}")
                if e.stderr:
                    log(e.stderr.decode() if isinstance(e.stderr, bytes) else e.stderr)
            else:
                sys.stderr.write(r.stderr)
                if r.returncode == 0 and '"metric"' in r.stdout:
                    sys.stdout.write(r.stdout)
                    return 0
                last_err = f"bench child rc={r.returncode}: {r.stderr.strip().splitlines()[-1] if r.stderr.strip() else 'no stderr'}"
                record(f"run failed rc={r.returncode}")
                log(f"[bench supervisor] {last_err}")
        else:
            record(f"probe {attempts} failed")
            log(f"[bench supervisor] probe attempt {attempts} failed/hung (tunnel dark)")
        if time.monotonic() + backoff > deadline:
            break
        log(f"[bench supervisor] retrying in {backoff:.0f}s "
            f"({deadline - time.monotonic():.0f}s of budget left)")
        time.sleep(backoff)
        backoff = min(backoff * 1.5, 300.0)
    print(
        json.dumps(
            {
                "metric": "UASTC->BC7 aggregate transcode throughput (device-resident, all-mode corpus mix)",
                "value": None,
                "unit": "Mtexels/s",
                "vs_baseline": None,
                "error": f"TPU unavailable after {attempts} attempts over {budget_s:.0f}s: {last_err}",
                "probe_attempts": attempts,
                "budget_s": budget_s,
                "timeline": timeline,
            }
        )
    )
    return 1


def main() -> None:
    n_chips = len(jax.devices())
    log(f"devices: {[str(d) for d in jax.devices()]}, N={N_BLOCKS} blocks")
    blocks = build_batch(N_BLOCKS)

    rate = bench_target("bc7", blocks)
    log(f"UASTC->BC7 aggregate: {rate/1e9:.2f} Gtexels/s")

    # The single driver-visible JSON line carries the FULL perf table (every
    # headline number), not just the BC7 aggregate.  BENCH_FAST=1 skips the
    # secondary targets for quick iteration.
    extra = {}
    if not os.environ.get("BENCH_FAST"):
        for target in ("rgba", "astc", "etc1", "etc2"):
            r = bench_target(target, blocks)
            log(f"UASTC->{target.upper()} aggregate: {r/1e9:.2f} Gtexels/s")
            extra[f"{target}_mtexels_s"] = round(r / 1e6, 1)
        for kind, er in bench_etc1s().items():
            log(f"ETC1S->{kind.upper()}: {er/1e9:.2f} Gtexels/s")
            extra[f"etc1s_{kind}_mtexels_s"] = round(er / 1e6, 1)
        try:
            hr = bench_etc1s_host()
            log(f"ETC1S host front-end: {hr/1e6:.1f} Mblocks/s/core")
            extra["etc1s_host_mblocks_s_core"] = round(hr / 1e6, 1)
            from bench_etc1s_host import aggregate_rate

            workers = os.cpu_count() or 1
            if workers == 1:
                # A 1-worker "aggregate" is the single-core number re-measured
                # with different region lengths (round-4 verdict item 4):
                # report the per-core figure itself, flagged degenerate, so
                # downstream readers cannot mistake scheduler noise for
                # scaling.  Real multi-worker hosts take the measured path.
                hrt = hr
                extra["etc1s_host_degenerate"] = True
                log(
                    "ETC1S host front-end aggregate: 1 vCPU - reporting the "
                    "per-core rate (degenerate; no scaling axis on this host)"
                )
            else:
                hrt = aggregate_rate(workers)
                log(
                    f"ETC1S host front-end aggregate ({workers} worker(s) = machine "
                    f"core count): {hrt/1e6:.1f} Mblocks/s total"
                )
            extra["etc1s_host_mblocks_s_total"] = round(hrt / 1e6, 1)
            extra["etc1s_host_workers"] = workers
        except ImportError:
            pass  # toolchain-less environment: no native front-end
        srate = bench_target_sharded("bc7", blocks)
        log(
            f"UASTC->BC7 aggregate (sharded per-mode step, {len(jax.devices())} chip(s)): "
            f"{srate/1e9:.2f} Gtexels/s ({srate/rate*100:.0f}% of plain path)"
        )
        extra["sharded_bc7_mtexels_s"] = round(srate / 1e6, 1)
        extra["sharded_pct_of_plain"] = round(srate / rate * 100, 1)
        serate = bench_etc1s_sharded()
        log(f"ETC1S->RGBA (sharded, {len(jax.devices())} chip(s)): {serate/1e9:.2f} Gtexels/s")
        extra["sharded_etc1s_rgba_mtexels_s"] = round(serate / 1e6, 1)
        # end-to-end corpus pipeline (device-resident): DEFAULT since round 5
        # (round-4 verdict item 1) - sync + pipelined rates + RTT floor
        for key, r in bench_corpus_device().items():
            if key.endswith("_ms"):
                extra[f"corpus_device_{key}"] = r
            else:
                extra[f"corpus_device_{key}_mtexels_s"] = round(r / 1e6, 1)

    if os.environ.get("BENCH_ALL"):
        bench_corpus()

    per_chip_target = TARGET_GTEXELS_V5E8 / 8
    print(
        json.dumps(
            {
                "metric": "UASTC->BC7 aggregate transcode throughput (device-resident, all-mode corpus mix)",
                "value": round(rate / 1e6, 1),
                "unit": "Mtexels/s",
                "vs_baseline": round(rate / (per_chip_target * n_chips), 3),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") or os.environ.get("BENCH_NO_SUPERVISOR"):
        main()
    else:
        sys.exit(supervise())
