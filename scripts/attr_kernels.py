"""Time each demod kernel ALONE (stage-1 scan, stage-2 scan, full chain)
on identical data -- settles how the dispatch splits between the two
programs and how much a stage-1/stage-2 fusion could possibly recover
(r5: stage-1's ablatable compute is only 0.7 ms, so whatever its solo
time shows beyond that is orchestration the fusion would absorb).

Usage: python scripts/attr_kernels.py [k] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    from bench import heterogeneous_fleet_iq
    from tetra_tpu.ops import demod_pallas as DP
    from tetra_tpu.ops import mm_pallas as MP
    from tetra_tpu.rx import demod_fast as DF

    C, T = 2048, 4608
    n_chunks = DF.n_chunks_for(T)
    xr_h, xi_h = heterogeneous_fleet_iq(k, C, T)
    xr = jnp.asarray(np.swapaxes(xr_h, 1, 2).copy())   # (k, T, C)
    xi = jnp.asarray(np.swapaxes(xi_h, 1, 2).copy())
    del xr_h, xi_h

    HIST = DP.HIST
    NT = 7

    def s1_step(carry, xs):
        gain, phase, freq, hr, hi = carry
        a, b = xs
        mfr, mfi, g, p, f, hr, hi = DP.agc_fll_rrc(a, b, gain, phase, freq,
                                                   hr, hi)
        return (g[0], p[0], f[0], hr, hi), mfr.sum()

    @jax.jit
    def s1_scan(carry, xr_k, xi_k):
        carry, sums = jax.lax.scan(s1_step, carry, (xr_k, xi_k))
        return carry, sums.sum()

    def s2_step(carry, xs):
        st0, tr, ti = carry
        a, b = xs
        dib, val, dist, st = MP.mm_costas(a, b, st0, n_chunks,
                                          emit_syms=False,
                                          tail_re=tr, tail_im=ti)
        return (st, a[T - NT:], b[T - NT:]), dist.sum()

    @jax.jit
    def s2_scan(carry, xr_k, xi_k):
        carry, sums = jax.lax.scan(s2_step, carry, (xr_k, xi_k))
        return carry, sums.sum()

    @jax.jit
    def s1_collect(carry, xr_k, xi_k):
        def stepc(c, xs):
            gain, phase, freq, hr, hi = c
            a, b = xs
            mfr, mfi, g, p, f, hr, hi = DP.agc_fll_rrc(
                a, b, gain, phase, freq, hr, hi)
            return (g[0], p[0], f[0], hr, hi), (mfr, mfi)
        return jax.lax.scan(stepc, carry, (xr_k, xi_k))

    def time_it(name, fn, *args):
        t0 = time.perf_counter()
        _, chk = fn(*args)
        float(chk)
        compile_s = time.perf_counter() - t0
        _, chk = fn(*args)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(iters):
            _, chk = fn(*args)
        float(chk)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({name: {
            "ms_per_dispatch": round(dt * 1e3, 1),
            "msps": round(k * C * T / dt / 1e6, 1),
            "compile_s": round(compile_s, 1)}}), flush=True)
        return dt

    z = jnp.zeros((C,), jnp.float32)
    zh = jnp.zeros((HIST, C), jnp.float32)
    s1_carry = (jnp.ones((C,), jnp.float32), z, z, zh, zh)
    time_it("stage1_alone", s1_scan, s1_carry, xr, xi)

    st0 = jnp.stack([z, jnp.full((C,), 2.0), z, z, z, z, z, z])
    s2_carry = (st0, jnp.zeros((NT, C), jnp.float32),
                jnp.zeros((NT, C), jnp.float32))
    # feed stage 2 the REAL matched-filter stream (locked-like loop
    # behavior; raw IQ would overstate barrel/select activity)
    _, (mfr_k, mfi_k) = s1_collect(s1_carry, xr, xi)
    mfr_k.block_until_ready()
    time_it("stage2_alone", s2_scan, s2_carry, mfr_k, mfi_k)
    del mfr_k, mfi_k

    # full chain reference (same harness as ab_stage2)
    state = DF.demod_init(C)

    def full_body(st, xs):
        a, b = xs
        st, outs = DF._demod_block_impl(st, jnp.swapaxes(a, 0, 1),
                                        jnp.swapaxes(b, 0, 1), n_chunks,
                                        True, True, tc_out=True)
        return st, outs["dist_tc"].sum()

    @jax.jit
    def full_scan(st, xr_k, xi_k):
        st, sums = jax.lax.scan(full_body, st, (xr_k, xi_k))
        return st, sums.sum()

    time_it("full_chain", full_scan, state, xr, xi)


if __name__ == "__main__":
    main()
