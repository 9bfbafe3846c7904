"""Map the backend's shape ceilings (VERDICT r1 item 6).

Round 1 hit two unexplained limits on this TPU backend:
  * INVALID_ARGUMENT compiling the XLA chunked demod at (C=512, T=9216)
  * remote-compile helper HTTP 500 at C=4096 tiles (Pallas path)

This probe walks a (C, T) grid through BOTH compile paths (XLA twin and the
fused Pallas kernels) with tiny iteration counts, records exactly which
(path, C, T) compiles+executes vs which error each failure raises, and
prints one JSON line per probe so the boundary (and the winning config) is
documented rather than folklore.  Run alone on the TPU host (compiles are
minutes each; failures are usually fast).

Usage: python scripts/probe_shapes.py [--grid small|full]
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="small")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tetra_tpu.rx import demod_fast as DF

    def probe(channels, block, use_pallas, k=2):
        n_chunks = DF.n_chunks_for(block)

        def body(state, xs):
            xr, xi = xs
            state, outs = DF._demod_block_impl(state, xr, xi, n_chunks,
                                               use_pallas, use_pallas)
            return state, outs["dist"].sum()

        def step(state, xr_k, xi_k):
            state, sums = jax.lax.scan(body, state, (xr_k, xi_k))
            return state, sums.sum()

        rng = np.random.default_rng(0)
        xr = jnp.asarray(rng.standard_normal((k, channels, block))
                         .astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((k, channels, block))
                         .astype(np.float32))
        state = DF.demod_init(channels)
        t0 = time.perf_counter()
        state, chk = jax.jit(step)(state, xr, xi)
        v = float(chk)
        return dict(ok=True, compile_s=round(time.perf_counter() - t0, 1),
                    checksum=round(v, 1))

    if args.grid == "small":
        grid = [(512, 9216, False), (512, 9216, True),
                (1024, 9216, True), (2048, 9216, True),
                (3072, 4608, True), (4096, 4608, True),
                (4096, 2304, True), (2048, 18432, True)]
    else:
        grid = [(c, t, p) for c in (512, 1024, 2048, 3072, 4096)
                for t in (4608, 9216, 18432) for p in (True, False)]

    for channels, block, pallas in grid:
        rec = dict(channels=channels, block=block, pallas=pallas)
        try:
            rec.update(probe(channels, block, pallas))
        except Exception as e:
            tb = traceback.format_exc(limit=2)
            rec.update(ok=False, error=type(e).__name__,
                       detail=str(e)[:300].replace("\n", " "))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
