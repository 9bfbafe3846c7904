"""Attribute stage-2 (mm_pallas) kernel time to its internal stages.

Times the stage-2 kernel alone (k-block lax.scan, same dispatch pattern as
bench.py) with profiling ablations that skip one internal stage at a time
(wrong math, identical structure/shapes).  Also times stage 1 alone for the
split.  Run alone (host contention skews timings; CLAUDE.md).

Usage: python scripts/ablate_mm.py [k] [iters]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    from tetra_tpu.ops import demod_pallas as DP
    from tetra_tpu.ops import mm_pallas as MP
    from tetra_tpu.rx import demod_fast as DF

    C, T = 2048, 4608
    n_chunks = DF.n_chunks_for(T)
    rng = np.random.default_rng(0)

    def time_it(jit_step, carry, xs):
        t0 = time.perf_counter()
        carry2, chk = jit_step(carry, xs)
        float(chk)
        compile_s = time.perf_counter() - t0
        carry2, chk = jit_step(carry, xs)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry2, chk = jit_step(carry, xs)
            float(chk)
        dt = (time.perf_counter() - t0) / iters
        return dt, compile_s

    # ---- stage 2 alone, per ablation ----
    mf = rng.standard_normal((k, 2, T + MP.NTAPS - 1, C)).astype(np.float32)
    mf_j = jnp.asarray(mf)
    st0 = np.zeros((8, C), np.float32)
    st0[1] = 2.0
    st0_j = jnp.asarray(st0)

    results = {}
    for ablate in ((), ("barrel",), ("select",), ("interp",),
                   ("barrel", "select", "interp")):
        def step(st, xs, ablate=ablate):
            def body(st, x):
                res = MP.mm_costas(x[0], x[1], st, n_chunks, ablate=ablate)
                return res[5], res[4].sum()
            st, sums = jax.lax.scan(body, st, xs)
            return st, sums.sum()
        dt, compile_s = time_it(jax.jit(step), st0_j, mf_j)
        key = "+".join(ablate) if ablate else "full"
        results[f"stage2:{key}"] = {
            "s_per_dispatch": round(dt, 4),
            "msps": round(k * C * T / dt / 1e6, 1),
            "compile_s": round(compile_s, 1)}
        print(json.dumps({key: results[f"stage2:{key}"]}), flush=True)

    # ---- stage 1 alone ----
    xr = jnp.asarray(rng.standard_normal((k, T, C)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((k, T, C)).astype(np.float32))
    g = jnp.ones((C,), jnp.float32)
    z = jnp.zeros((C,), jnp.float32)
    h = jnp.zeros((DP.HIST, C), jnp.float32)

    def step1(carry, xs):
        def body(carry, x):
            g, p, f, hr, hi = carry
            mfr, mfi, g2, p2, f2, hr2, hi2 = DP.agc_fll_rrc(
                x[0], x[1], g[...], p, f, hr, hi)
            return (g2[0], p2[0], f2[0], hr2, hi2), mfr.sum()
        carry, sums = jax.lax.scan(body, carry, xs)
        return carry, sums.sum()

    dt, compile_s = time_it(jax.jit(step1), (g, z, z, h, h),
                            jnp.stack([xr, xi], axis=1))
    results["stage1"] = {"s_per_dispatch": round(dt, 4),
                         "msps": round(k * C * T / dt / 1e6, 1),
                         "compile_s": round(compile_s, 1)}
    print(json.dumps({"stage1": results["stage1"]}), flush=True)


if __name__ == "__main__":
    main()
