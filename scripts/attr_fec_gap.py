"""Attribute the FEC program's in-context vs isolated cost gap (VERDICT r3
item 3 / ROADMAP lever 2): in the round-3 e2e cycle the mixed FEC step
measured ~100 ms at 82k rows where the tight-loop ablation of the same
program read ~45 ms.  This probe measures the SAME program under
controlled conditions in one process to separate the candidate causes:

  A tight_loop      repeated back-to-back calls, inputs pre-staged on
                    device (the round-3 ablation's condition: upload and
                    host staging amortized/overlapped)
  B tight_host      repeated calls but with the production host-side work
                    per call: np.concatenate pad + jnp.asarray upload
  C after_sb        one call per superblock cycle, issued right after the
                    superblock program's output fetch (the production
                    in-context condition, minus the fleet/MAC host stages)
  D during_sb       one call issued while the superblock program is still
                    executing (dispatch not yet fetched): queueing cost
  E cold_alloc      like B but with a fresh (newly allocated) input array
                    each call: allocator/pinned-staging effects

Each condition reports ms/call split into host-prep / dispatch / fetch.
Run alone on the TPU host (host contention skews everything).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench_e2e import build_wideband
    from tetra_tpu import params as P
    from tetra_tpu.rx import fec as rx_fec
    from tetra_tpu.rx.receiver import TetraReceiver, _wideband_step_scan

    channels, t50, K = 256, 6400, 16
    prog = sys.argv[1] if len(sys.argv) > 1 else "short"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    rx = TetraReceiver(wideband=channels, t50=t50, fleet=True, events=False,
                       wb_k=K)
    wb = rx._wb
    fleet = rx.fleet
    bucket = rows or (fleet.short_bucket if prog == "short"
                      else fleet.pad_rows)

    # realistic inputs: random packed rows (content doesn't change cost)
    rng = np.random.default_rng(0)
    nb = 27 if prog == "short" else 54
    t5_host = rng.integers(0, 256, (bucket, nb)).astype(np.uint8)
    idx_host = np.zeros(bucket, np.int32)
    sel_host = (rng.integers(0, 2, bucket).astype(np.int32)
                if prog == "short" else
                rng.integers(0, 3, bucket).astype(np.int32))
    ks_host = np.zeros((16, 432), np.uint8)
    ks_host[0] = rx_fec.keystream(P.SCRAMB_INIT, 432)
    ks_dev = jnp.asarray(ks_host)

    def call(tc, ic, sc):
        if prog == "short":
            return rx_fec._decode_short_packed_jit(tc, ks_dev, ic, sc)
        return rx_fec._decode_mixed_packed_jit(tc, ks_dev, ic, sc)

    # superblock inputs for C/D
    adv, wlen = wb["advance"], wb["wide_len"]
    sb_adv = K * adv
    wide = build_wideband(channels, 6.0)
    n_super = (len(wide) - wlen) // sb_adv
    staged = []
    for s in range(n_super):
        base = s * sb_adv
        wr = np.stack([wide[base + j * adv: base + j * adv + wlen].real
                       for j in range(K)]).astype(np.float32)
        wi = np.stack([wide[base + j * adv: base + j * adv + wlen].imag
                       for j in range(K)]).astype(np.float32)
        staged.append((jax.device_put(wr), jax.device_put(wi)))
    for w in staged:
        w[0].block_until_ready(), w[1].block_until_ready()
    warm = max(1, int(1.0 * channels * 25_000 / sb_adv) + 1)
    for s in range(warm):
        rx.process_wideband_staged(*staged[s])

    # compile + warm the FEC program
    td = jnp.asarray(t5_host)
    ii = jnp.asarray(idx_host)
    ss = jnp.asarray(sel_host)
    np.asarray(call(td, ii, ss))

    res = {"prog": prog, "bucket": int(bucket)}

    def timed(fn, iters):
        host = disp = fetch = 0.0
        for _ in range(iters):
            h, d, f = fn()
            host += h
            disp += d
            fetch += f
        return dict(host_ms=round(host / iters * 1e3, 1),
                    dispatch_ms=round(disp / iters * 1e3, 1),
                    fetch_ms=round(fetch / iters * 1e3, 1),
                    total_ms=round((host + disp + fetch) / iters * 1e3, 1))

    def base_call(make_input):
        t0 = time.perf_counter()
        tc, ic, sc = make_input()
        t1 = time.perf_counter()
        o = call(tc, ic, sc)
        t2 = time.perf_counter()
        np.asarray(o)
        t3 = time.perf_counter()
        return t1 - t0, t2 - t1, t3 - t2

    # A: device-resident inputs, back to back
    res["A_tight_loop"] = timed(lambda: base_call(lambda: (td, ii, ss)), 8)

    # B: production host staging per call (pad + upload)
    def stage():
        tc = np.concatenate([t5_host[:-7],
                             np.zeros((7, nb), np.uint8)])
        return (jnp.asarray(tc), jnp.asarray(idx_host),
                jnp.asarray(sel_host))
    res["B_tight_host"] = timed(lambda: base_call(stage), 8)

    # E: fresh allocation each call
    def fresh():
        tc = rng.integers(0, 256, (bucket, nb)).astype(np.uint8)
        return (jnp.asarray(tc), jnp.asarray(idx_host),
                jnp.asarray(sel_host))
    res["E_cold_alloc"] = timed(lambda: base_call(fresh), 8)

    # C: right after a fetched superblock cycle
    sidx = [warm]
    def after_sb():
        s = sidx[0]
        sidx[0] = warm + (s + 1 - warm) % (n_super - warm)
        (rx.state, fused, wb["hist_r"], wb["hist_i"]) = _wideband_step_scan(
            rx.state, *staged[s], wb["hist_r"], wb["hist_i"], channels,
            wb["t36"], wb["n_chunks"], True, True, False, K)
        np.asarray(fused)                 # force superblock completion
        return base_call(stage)
    res["C_after_sb"] = timed(after_sb, 6)

    # D: while the superblock program is still executing
    def during_sb():
        s = sidx[0]
        sidx[0] = warm + (s + 1 - warm) % (n_super - warm)
        (rx.state, fused, wb["hist_r"], wb["hist_i"]) = _wideband_step_scan(
            rx.state, *staged[s], wb["hist_r"], wb["hist_i"], channels,
            wb["t36"], wb["n_chunks"], True, True, False, K)
        r = base_call(stage)
        np.asarray(fused)                 # drain before next iter
        return r
    res["D_during_sb"] = timed(during_sb, 6)

    print(json.dumps(res))
    with open("/tmp/attr_fec_gap.json", "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
