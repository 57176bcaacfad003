#!/usr/bin/env python
"""Paired same-process A/B of the gather_chunked rewrite vs the legacy form.

The rewrite (ops/bits.gather_chunked): `mode="promise_in_bounds"` on the
128-lane take_along_axis (the index is masked to [0,128), so the default
negative-wrap + OOB-fill normalization is dead code) and the chunk-select
shift hoisted out of the chunk loop.  Eqn deltas at 16-chunk codebooks
(tools/count_eqns.py): etc1s_rgba 476->349, etc1s_etc1 279->155,
etc1s_rgba_alpha 931->677; UASTC bc7 mix 457->437 (mode 8: 207->149).

Both arms run in THIS process with the kernel build caches cleared between
arms (the lru-cached pallas_call closures bind gather_chunked at trace
time), using bench.py's dependency-chained fori_loop timing.  Run on
hardware; trust the aggregate deltas, not single modes.

Usage: python tools/ab_gather.py [bc7] [etc1s] [astc ...]   (default: both)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from basisu_rs_tpu.ops import bits, etc1s_pallas, pallas_kernels

NEW_IMPL = bits.gather_chunked


def legacy_gather_chunked(loaded, idx):
    """The pre-rewrite form: default take_along_axis mode (wrap + fill
    normalization) and the chunk-select shift re-traced per chunk."""
    idx = idx.astype(jnp.int32)
    chunks = loaded.shape[0]
    within = idx & 127
    out = jnp.take_along_axis(jnp.broadcast_to(loaded[0:1], idx.shape), within, axis=1)
    for c in range(1, chunks):
        val = jnp.take_along_axis(
            jnp.broadcast_to(loaded[c : c + 1], idx.shape), within, axis=1
        )
        out = jnp.where((idx >> 7) == c, val, out)
    return out


def set_impl(fn):
    # Patch both binding sites: bits.lut_lookup resolves bits.gather_chunked
    # at call time; etc1s_pallas imported the name directly.
    bits.gather_chunked = fn
    etc1s_pallas.gather_chunked = fn
    pallas_kernels._pallas_build.cache_clear()
    etc1s_pallas._build.cache_clear()
    jax.clear_caches()
    assert bits.gather_chunked is fn and etc1s_pallas.gather_chunked is fn


def run_arm(name, fn, wants):
    set_impl(fn)
    out = {}
    if any(w not in ("etc1s",) for w in wants):
        blocks = bench.build_batch(bench.N_BLOCKS)
        for target in wants:
            if target == "etc1s":
                continue
            out[target] = bench.bench_target(target, blocks) / 1e9
            bench.log(f"[{name}] {target}: {out[target]:.1f} Gtex/s")
    if "etc1s" in wants:
        for kind, r in bench.bench_etc1s().items():
            out[f"etc1s_{kind}"] = r / 1e9
            bench.log(f"[{name}] etc1s {kind}: {r/1e9:.1f} Gtex/s")
    return out


def main(argv):
    wants = argv or ["bc7", "etc1s"]
    a = run_arm("legacy", legacy_gather_chunked, wants)
    b = run_arm("new", NEW_IMPL, wants)
    set_impl(NEW_IMPL)
    for k in a:
        d = (b[k] - a[k]) / a[k] * 100
        print(f"{k}: legacy {a[k]:.1f} -> new {b[k]:.1f} Gtex/s ({d:+.1f}%)")


if __name__ == "__main__":
    main(sys.argv[1:])
