"""Verify the predicated barrel skips on aligned channels (stage 2 only).

Feeds stage 2 (a) independent noise per channel (omega walks apart -> all
barrel passes run) and (b) the same stream in every channel (zero spread ->
passes above 4 skip).  The (b)/(a) ratio measures the predication win in
the locked steady state.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tetra_tpu.ops import mm_pallas as MP
    from tetra_tpu.rx import demod_fast as DF

    C, T, k, iters = 2048, 4608, 32, 4
    n_chunks = DF.n_chunks_for(T)
    rng = np.random.default_rng(0)

    def step(st, xs):
        def body(st, x):
            res = MP.mm_costas(x[0], x[1], st, n_chunks)
            return res[5], res[4].sum()
        st, sums = jax.lax.scan(body, st, xs)
        return st, sums.sum()

    jit_step = jax.jit(step)
    st0 = np.zeros((8, C), np.float32)
    st0[1] = 2.0
    st0_j = jnp.asarray(st0)

    for name, mf in (
        ("independent", rng.standard_normal(
            (k, 2, T + MP.NTAPS - 1, C)).astype(np.float32)),
        ("tiled", np.broadcast_to(
            rng.standard_normal((k, 2, T + MP.NTAPS - 1, 1)).astype(
                np.float32), (k, 2, T + MP.NTAPS - 1, C)).copy()),
    ):
        xs = jnp.asarray(mf)
        st, chk = jit_step(st0_j, xs)
        float(chk)
        st, chk = jit_step(st0_j, xs)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, chk = jit_step(st0_j, xs)
            float(chk)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({name: {"s": round(dt, 4),
                                 "msps": round(k * C * T / dt / 1e6, 1)}}),
              flush=True)


if __name__ == "__main__":
    main()
