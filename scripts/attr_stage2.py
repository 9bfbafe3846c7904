"""In-context stage-2 attribution on LOCKED input (round-5 lever data).

scripts/ablate_mm.py times the stage-2 kernel alone on NOISE inputs --
free-running loops fire every spread-predicated barrel pass, so its split
is the worst case, not the operating point.  This script times the FULL
production chain (stage-1 + stage-2 Pallas kernels, bench.py's dispatch
pattern) on the heterogeneous LOCKED fleet, with the stage-2 internal
ablations (wrong math, identical structure; ops/mm_pallas `ablate`)
patched in per run: deltas vs the unablated chain attribute each stage's
IN-CONTEXT cost at the real operating point.

Loops are settled by warmup dispatches first; each timed iteration
restarts from the settled state (ablated math corrupts the carried loop
state, which would re-fire barrel passes and overstate the ablated run --
starting settled keeps the contamination to the within-dispatch tail, so
the reported deltas are conservative lower bounds on each stage's cost).

Run alone (host contention skews timings).
Usage: python scripts/attr_stage2.py [k] [iters]
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
    from tetra_tpu.ops import mm_pallas as MP
    from tetra_tpu.rx import demod_fast as DF

    C, T = 2048, 4608
    n_chunks = DF.n_chunks_for(T)
    orig_mm = MP.mm_costas

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

    # settle the loops with the production math
    state = DF.demod_init(C)
    jit_step = make_step()
    for _ in range(3):
        state, chk = jit_step(state, xr, xi)
    float(chk)
    settled = jax.tree.map(lambda x: x, state)

    results = {}
    base = None
    for ablate in ((), ("barrel",), ("select",), ("interp",),
                   ("selects",), ("costas",), ("extract",),
                   ("barrel", "select", "interp", "costas", "extract")):
        MP.mm_costas = (orig_mm if not ablate
                        else functools.partial(orig_mm, ablate=ablate))
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
        results[key] = row
        print(json.dumps({key: row}), flush=True)
    MP.mm_costas = orig_mm


if __name__ == "__main__":
    main()
