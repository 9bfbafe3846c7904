"""Same-process A/B harness for the stage-1/stage-2 kernel knobs on TPU.

Measures the full production chain (both Pallas kernels, bench.py's
dispatch pattern) on the heterogeneous LOCKED fleet.  EDIT `configs`
below per measurement session: set_cfg exposes every structure knob
(FOLD / SEL_DEINT / COPY_HEAD / PACK_RI / stage-1 CT+unroll) plus the
per-step tc_out (lean) form; all configs re-trace from cleared caches
and start from the SAME settled loop state, so deltas are same-process
and checksum equality across configs validates bit-exactness on real
hardware.  Round-5 results from this harness are tabulated in
BENCH_DETAIL.md (stage-2 structural rebuild section).

Run alone (host contention skews timings).
Usage: python scripts/ab_stage2.py [k] [iters]
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
    xr = jnp.asarray(xr_h)
    xi = jnp.asarray(xi_h)
    del xr_h, xi_h

    def make_step(tc_out=False):
        def body(state, xs):
            a, b = xs
            state, outs = DF._demod_block_impl(state, a, b, n_chunks,
                                               True, True, tc_out=tc_out)
            key = "dist_tc" if tc_out else "dist"
            return state, outs[key].sum()

        def step(state, xr_k, xi_k):
            state, sums = jax.lax.scan(body, state, (xr_k, xi_k))
            return state, sums.sum()
        return jax.jit(step)

    saved = dict(ALIGN8=MP.ALIGN8, NARROW_INTERP=MP.NARROW_INTERP,
                 FOLD=MP.FOLD, SEL_DEINT=MP.SEL_DEINT,
                 COPY_HEAD=MP.COPY_HEAD, PACK_RI=MP.PACK_RI,
                 CT=DP.CHAN_TILE, U=DP.UNROLL_MAX)

    def set_cfg(fold=3, deint=True, copyhead=True, packri=True,
                s1_ct=2048, s1_u=1):
        MP.ALIGN8 = False
        MP.NARROW_INTERP = False
        MP.FOLD = fold
        MP.SEL_DEINT = deint
        MP.COPY_HEAD = copyhead
        MP.PACK_RI = packri
        DP.CHAN_TILE = s1_ct
        DP.UNROLL_MAX = s1_u
        MP.mm_costas.clear_cache()
        DP.agc_fll_rrc.clear_cache()
        DF._demod_block_impl.clear_cache()

    configs = [
        ("full-outputs", dict()),
        ("lean(tc_out)", dict(tc_out=True)),
    ]

    # settle the loops once with the baseline config
    set_cfg()
    jit_step = make_step()
    state = DF.demod_init(C)
    for _ in range(3):
        state, chk = jit_step(state, xr, xi)
    float(chk)
    settled = jax.tree.map(lambda x: x, state)

    results = {}
    for name, cfg in configs:
        tc = cfg.pop("tc_out", False)
        set_cfg(**cfg)
        jit_step = make_step(tc)
        t0 = time.perf_counter()
        _, chk = jit_step(settled, xr, xi)
        chk0 = float(chk)
        compile_s = time.perf_counter() - t0
        _, chk = jit_step(settled, xr, xi)
        float(chk)
        t0 = time.perf_counter()
        chks = [jit_step(settled, xr, xi)[1] for _ in range(iters)]
        for c in chks:
            float(c)
        dt = (time.perf_counter() - t0) / iters
        row = {"ms_per_dispatch": round(dt * 1e3, 1),
               "msps": round(k * C * T / dt / 1e6, 1),
               "checksum": chk0,
               "compile_s": round(compile_s, 1)}
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    base_chk = results[configs[0][0]]["checksum"]
    for name, *_ in configs[1:]:
        same = results[name]["checksum"] == base_chk
        print(json.dumps({f"bitexact[{name}]": bool(same)}), flush=True)

    # restore the module defaults from the SAVED originals (not by
    # value: they must track future default changes)
    MP.ALIGN8, MP.NARROW_INTERP = saved["ALIGN8"], saved["NARROW_INTERP"]
    MP.FOLD, MP.SEL_DEINT = saved["FOLD"], saved["SEL_DEINT"]
    MP.COPY_HEAD, MP.PACK_RI = saved["COPY_HEAD"], saved["PACK_RI"]
    DP.CHAN_TILE, DP.UNROLL_MAX = saved["CT"], saved["U"]
    MP.mm_costas.clear_cache()
    DP.agc_fll_rrc.clear_cache()
    DF._demod_block_impl.clear_cache()


if __name__ == "__main__":
    main()
