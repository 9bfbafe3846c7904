"""Stage-2 kernel geometry trials on the real TPU.

Usage: python scripts/bench_tile.py [CHAN_TILE] [UNROLL_MAX] [k] [iters] [S1_UNROLL]

Measures the bench.py primary config (C=2048, T=4608, k-block scan) with
the given ops/mm_pallas geometry overrides and prints one JSON line.
Run alone (host CPU contention skews timings; CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    ct = int(sys.argv[1]) if len(sys.argv) > 1 else None
    um = int(sys.argv[2]) if len(sys.argv) > 2 else None
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    s1u = int(sys.argv[5]) if len(sys.argv) > 5 else None

    import jax
    import jax.numpy as jnp

    from tetra_tpu.ops import demod_pallas as DP
    from tetra_tpu.ops import mm_pallas as MP
    from tetra_tpu.rx import demod_fast as demod_mod

    if ct is not None:
        MP.CHAN_TILE = ct
    if um is not None:
        MP.UNROLL_MAX = um
        MP.UNROLL_MAX_PAIR = um
    if s1u is not None:
        DP.UNROLL_MAX = s1u

    channels, block = 2048, 4608
    n_chunks = demod_mod.n_chunks_for(block)

    def body(state, xs):
        xr, xi = xs
        state, outs = demod_mod._demod_block_impl(
            state, xr, xi, n_chunks, True, True)
        return state, outs["dist"].sum()

    def step(state, xr_k, xi_k):
        state, sums = jax.lax.scan(body, state, (xr_k, xi_k))
        return state, sums.sum()

    jit_step = jax.jit(step)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(
        rng.standard_normal((k, channels, block)).astype(np.float32))
    xi = jnp.asarray(
        rng.standard_normal((k, channels, block)).astype(np.float32))
    state = demod_mod.demod_init(channels)
    t0 = time.perf_counter()
    state, chk = jit_step(state, xr, xi)   # compile + warmup
    float(chk)
    compile_s = time.perf_counter() - t0
    state, chk = jit_step(state, xr, xi)
    float(chk)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, chk = jit_step(state, xr, xi)
        float(chk)
    dt = time.perf_counter() - t0
    msps = k * channels * block * iters / dt / 1e6
    print(json.dumps({
        "chan_tile": MP.CHAN_TILE, "unroll_max": MP.UNROLL_MAX,
        "s1_unroll": DP.UNROLL_MAX,
        "k": k, "msps": round(msps, 1), "compile_s": round(compile_s, 1),
        "checksum": float(chk),
    }))


if __name__ == "__main__":
    main()
