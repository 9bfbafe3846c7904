"""In-context stage-1 attribution on LOCKED input (round-5: stage 1 is
the largest single demod term, ~27 ms of the 58 ms dispatch, and its
internal split was never measured).

Same harness as attr_stage2: full production chain on the settled locked
heterogeneous fleet, with the stage-1 kernel's profiling-only ablations
('ramp' = FLL rotator build + rotation apply, 'amp' = the AGC mean-|.|
estimator, 'mm' = the five stacked banded matmuls) patched in per run;
deltas vs the unablated chain are conservative in-context costs.

Run alone (host contention skews timings).
Usage: python scripts/attr_stage1.py [k] [iters]
"""

import functools
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
    from tetra_tpu.rx import demod_fast as DF

    C, T = 2048, 4608
    n_chunks = DF.n_chunks_for(T)
    orig = DP.agc_fll_rrc

    xr_h, xi_h = heterogeneous_fleet_iq(k, C, T)
    xr = jnp.asarray(xr_h)
    xi = jnp.asarray(xi_h)
    del xr_h, xi_h

    def make_step():
        def body(state, xs):
            a, b = xs
            state, outs = DF._demod_block_impl(state, a, b, n_chunks,
                                               True, True)
            return state, outs["dist"].sum()

        def step(state, xr_k, xi_k):
            state, sums = jax.lax.scan(body, state, (xr_k, xi_k))
            return state, sums.sum()
        return jax.jit(step)

    state = DF.demod_init(C)
    jit_step = make_step()
    for _ in range(3):
        state, chk = jit_step(state, xr, xi)
    float(chk)
    settled = jax.tree.map(lambda x: x, state)

    base = None
    for ablate in ((), ("ramp",), ("amp",), ("mm",), ("ramp", "amp", "mm")):
        DP.agc_fll_rrc = (orig if not ablate
                          else functools.partial(orig, ablate=ablate))
        DF._demod_block_impl.clear_cache()
        jit_step = make_step()
        t0 = time.perf_counter()
        _, chk = jit_step(settled, xr, xi)
        float(chk)
        compile_s = time.perf_counter() - t0
        _, chk = jit_step(settled, xr, xi)
        float(chk)
        t0 = time.perf_counter()
        chks = [jit_step(settled, xr, xi)[1] for _ in range(iters)]
        for c in chks:
            float(c)
        dt = (time.perf_counter() - t0) / iters
        key = "+".join(ablate) if ablate else "full"
        row = {"ms_per_dispatch": round(dt * 1e3, 1),
               "msps": round(k * C * T / dt / 1e6, 1),
               "compile_s": round(compile_s, 1)}
        if not ablate:
            base = dt
        else:
            row["stage_ms"] = round((base - dt) * 1e3, 1)
        print(json.dumps({key: row}), flush=True)
    DP.agc_fll_rrc = orig


if __name__ == "__main__":
    main()
