"""Fused Pallas stage-1 kernel vs the XLA-scan reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from tetra_tpu.core.fir import fir_stream_pair
from tetra_tpu.ops.demod_pallas import agc_fll_rrc
from tetra_tpu.rx.demod import _tables
from tetra_tpu.rx.demod_fast import _agc_fll_chunked

RNG = np.random.default_rng(17)


def test_pallas_matches_chunked_stage1():
    C, T = 8, 512
    xr = RNG.standard_normal((C, T)).astype(np.float32) * 0.7
    xi = RNG.standard_normal((C, T)).astype(np.float32) * 0.7
    gain = np.ones(C, np.float32)
    phase = np.zeros(C, np.float32)
    freq = np.full(C, 0.05, np.float32)

    rrc, be, _ = _tables()
    rotr, roti, g2, p2, f2, _, _ = _agc_fll_chunked(
        jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(gain),
        jnp.asarray(phase), jnp.asarray(freq),
        jnp.zeros((C, 64)), jnp.zeros((C, 64)), be)
    mfr, mfi, _, _ = fir_stream_pair(rotr, roti, jnp.asarray(rrc),
                                     jnp.zeros((C, 64)), jnp.zeros((C, 64)))

    out = agc_fll_rrc(jnp.asarray(xr.T), jnp.asarray(xi.T),
                      jnp.asarray(gain), jnp.asarray(phase),
                      jnp.asarray(freq), jnp.zeros((64, C)),
                      jnp.zeros((64, C)), interpret=True)
    pmfr, pmfi, pg, pp, pf, phr, phi = [np.asarray(o) for o in out]
    np.testing.assert_allclose(pmfr.T, np.asarray(mfr), atol=2e-5)
    np.testing.assert_allclose(pmfi.T, np.asarray(mfi), atol=2e-5)
    np.testing.assert_allclose(pg[0], np.asarray(g2), atol=1e-5)
    np.testing.assert_allclose(pp[0], np.asarray(p2), atol=1e-5)
    np.testing.assert_allclose(pf[0], np.asarray(f2), atol=1e-6)


def test_pallas_streaming_history():
    """Two half-blocks through the kernel == one full block (history carry)."""
    C, T = 8, 512
    xr = RNG.standard_normal((C, T)).astype(np.float32) * 0.7
    xi = RNG.standard_normal((C, T)).astype(np.float32) * 0.7
    g = jnp.ones(C); p = jnp.zeros(C); f = jnp.full(C, 0.03)
    z = jnp.zeros((64, C))
    full = agc_fll_rrc(jnp.asarray(xr.T), jnp.asarray(xi.T), g, p, f, z, z,
                       interpret=True)
    h = T // 2
    a = agc_fll_rrc(jnp.asarray(xr[:, :h].T), jnp.asarray(xi[:, :h].T),
                    g, p, f, z, z, interpret=True)
    b = agc_fll_rrc(jnp.asarray(xr[:, h:].T), jnp.asarray(xi[:, h:].T),
                    a[2][0], a[3][0], a[4][0], a[5], a[6], interpret=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(full[0][:h]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(full[0][h:]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(b[4]), np.asarray(full[4]),
                               atol=1e-6)


def test_mm_pallas_matches_chunked_stage2():
    """Stage-2 kernel (interpret) == XLA chunked timing/Costas, exactly."""
    import functools
    from tetra_tpu.rx import demod_fast as DF
    from tetra_tpu.ops.mm_pallas import mm_costas

    rng = np.random.default_rng(3)
    C, T = 8, 1024
    n_chunks = int(np.ceil(T / (DF.K_SYM * 1.96))) + 1
    yr = rng.standard_normal((C, T)).astype(np.float32)
    yi = rng.standard_normal((C, T)).astype(np.float32)
    tail = np.zeros((C, 7), np.float32)
    pos = rng.uniform(0, 3, C).astype(np.float32)
    omega = rng.uniform(1.97, 2.03, C).astype(np.float32)
    z = np.zeros(C, np.float32)
    prev = rng.integers(0, 4, C).astype(np.int32)

    outs, mtr, mti, pos2, om2, cp2, cf2, ph22, pv2 = DF._mm_costas_chunked(
        jnp.asarray(yr), jnp.asarray(yi), jnp.asarray(tail), jnp.asarray(tail),
        jnp.asarray(pos), jnp.asarray(omega), jnp.asarray(z), jnp.asarray(z),
        jnp.asarray(z), jnp.asarray(prev), n_chunks)

    mfr_ext = np.concatenate([tail, yr], axis=1).T.copy()
    mfi_ext = np.concatenate([tail, yi], axis=1).T.copy()
    st0 = np.zeros((8, C), np.float32)
    st0[0], st0[1], st0[5] = pos, omega, prev
    res = mm_costas(jnp.asarray(mfr_ext), jnp.asarray(mfi_ext),
                    jnp.asarray(st0), n_chunks, interpret=True)
    psr, psi, pdib, pval, pdist, pst = [np.asarray(x) for x in res]

    np.testing.assert_array_equal(pval.T.astype(bool),
                                  np.asarray(outs["valid"]))
    m = np.asarray(outs["valid"])
    np.testing.assert_array_equal(pdib.T[m], np.asarray(outs["dibits"])[m])
    np.testing.assert_allclose(psr.T[m], np.asarray(outs["sym_re"])[m],
                               atol=2e-3)
    np.testing.assert_allclose(pst[0], np.asarray(pos2), atol=1e-4)
    np.testing.assert_allclose(pst[1], np.asarray(om2), atol=1e-5)
    np.testing.assert_array_equal(pst[5].astype(np.int32), np.asarray(pv2))


def test_full_pallas_pipeline_matches_xla():
    """Both Pallas kernels through _demod_block_impl == XLA path (interpret)."""
    import functools
    import tetra_tpu.ops.demod_pallas as DP
    import tetra_tpu.ops.mm_pallas as MP
    from tetra_tpu.rx import demod_fast as DF
    from tetra_tpu.tx.modulator import modulate

    orig1, orig2 = DP.agc_fll_rrc, MP.mm_costas
    DP.agc_fll_rrc = functools.partial(orig1, interpret=True)
    MP.mm_costas = functools.partial(orig2, interpret=True)
    try:
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, (2, 8000)).astype(np.uint8)
        iq = np.asarray(modulate(jnp.asarray(bits)))
        iq = iq[:, :iq.shape[1] // DF.K_SAMP * DF.K_SAMP]
        nch = int(np.ceil(iq.shape[1] / (DF.K_SYM * 1.96))) + 1
        xr = jnp.asarray(iq.real.astype(np.float32))
        xi = jnp.asarray(iq.imag.astype(np.float32))
        s1, o1 = DF._demod_block_impl(DF.demod_init(2), xr, xi, nch, False)
        s2, o2 = DF._demod_block_impl(DF.demod_init(2), xr, xi, nch, True,
                                      True)
        v1 = np.asarray(o1["valid"])
        np.testing.assert_array_equal(v1, np.asarray(o2["valid"]))
        np.testing.assert_array_equal(np.asarray(o1["dibits"])[v1],
                                      np.asarray(o2["dibits"])[v1])
        np.testing.assert_allclose(np.asarray(s1.mm_pos),
                                   np.asarray(s2.mm_pos), atol=1e-4)
    finally:
        DP.agc_fll_rrc = orig1
        MP.mm_costas = orig2


def test_mm_pallas_channel_tiling():
    """Multi-tile grid (C > CHAN_TILE) == single-tile result (interpret)."""
    from tetra_tpu.ops import mm_pallas as MP
    from tetra_tpu.rx import demod_fast as DF

    rng = np.random.default_rng(9)
    C, T = 256, 512
    n_chunks = int(np.ceil(T / (DF.K_SYM * 1.96))) + 1
    mfr = rng.standard_normal((T + 7, C)).astype(np.float32)
    mfi = rng.standard_normal((T + 7, C)).astype(np.float32)
    st0 = np.zeros((8, C), np.float32)
    st0[1] = 2.0
    res = MP.mm_costas(jnp.asarray(mfr), jnp.asarray(mfi), jnp.asarray(st0),
                       n_chunks, interpret=True)
    # reference: run each 128-lane half independently (tiles must not leak)
    for h in range(2):
        sl = slice(h * 128, (h + 1) * 128)
        r2 = MP.mm_costas(jnp.asarray(mfr[:, sl].copy()),
                          jnp.asarray(mfi[:, sl].copy()),
                          jnp.asarray(st0[:, sl].copy()), n_chunks,
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(res[2])[:, sl],
                                      np.asarray(r2[2]))
        np.testing.assert_allclose(np.asarray(res[5])[:, sl],
                                   np.asarray(r2[5]), atol=1e-5)


def test_chan_pallas_matches_xla_channelizer():
    """Fused fold+DFT kernel (interpret) == the XLA channelizer twin."""
    import numpy as np
    from tetra_tpu.parallel import channelizer as CH
    from tetra_tpu.ops import chan_pallas as CP

    rng = np.random.default_rng(11)
    for n_ch, t50 in ((16, 800), (16, 775)):
        hop = n_ch // 2
        L = n_ch * CH.TAPS_PER_BRANCH
        wide_len = (t50 - 1) * hop + L
        xr = jnp.asarray(rng.standard_normal(wide_len).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal(wide_len).astype(np.float32))
        ref_r, ref_i = CH._channelize_block_impl(xr, xi, n_ch,
                                                 use_pallas=False)
        n_z = wide_len // hop
        zr = xr[:n_z * hop].reshape(n_z, hop)
        zi = xi[:n_z * hop].reshape(n_z, hop)
        Wr, Wi = CH._dft_basis(n_ch)
        F = jnp.asarray(CP._fold_weights(CH._prototype(n_ch), n_ch))
        need = t50 + 2 * CH.TAPS_PER_BRANCH - 1
        yr, yi = CP.fold_dft(zr[:need], zi[:need], F,
                             jnp.asarray(Wr.T), jnp.asarray(Wi.T), n_ch,
                             q_tile=64, interpret=True)
        np.testing.assert_allclose(np.asarray(yr).T, np.asarray(ref_r),
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(np.asarray(yi).T, np.asarray(ref_i),
                                   rtol=0, atol=2e-5)


def test_chan_pallas_fused_resample_matches_xla():
    """fold_dft_resample (interpret): the single-kernel front-end ==
    XLA channelize (frame-major) + streaming superblock resample, across
    streamed blocks (halo continuity across blocks AND grid tiles)."""
    import numpy as np
    from tetra_tpu.parallel import channelizer as CH
    from tetra_tpu.ops import chan_pallas as CP

    rng = np.random.default_rng(21)
    n_ch, t50 = 16, 1600            # 2 grid tiles of 800
    t36 = t50 * 18 // 25
    hop = n_ch // 2
    L = n_ch * CH.TAPS_PER_BRANCH
    wide_len = (t50 - 1) * hop + L
    advance = t50 * hop
    pad = CH.RS_TAPS_PER_PHASE - 1
    raw = rng.standard_normal((2, 2 * advance + wide_len - advance)
                              ).astype(np.float32)
    Wr, Wi = CH._dft_basis(n_ch)
    F = jnp.asarray(CP._fold_weights(CH._prototype(n_ch), n_ch))
    WS = jnp.asarray(CH._resamp_super_matrix(18, 25, 32))
    hr_k = hi_k = jnp.zeros((pad, n_ch), jnp.float32)
    hr_x = hi_x = jnp.zeros((pad, n_ch), jnp.float32)
    for b in range(2):
        win = raw[:, b * advance:b * advance + wide_len]
        xr, xi = jnp.asarray(win[0]), jnp.asarray(win[1])
        # XLA composition
        yr, yi = CH._channelize_block_impl(xr, xi, n_ch, use_pallas=False,
                                           frame_major=True)
        rr_x, ri_x, hr_x, hi_x = CH._resample_stream_block_fm(
            yr, yi, hr_x, hi_x, t36)
        # fused kernel (interpret)
        n_z = wide_len // hop
        zr = xr[:n_z * hop].reshape(n_z, hop)
        zi = xi[:n_z * hop].reshape(n_z, hop)
        need = t50 + 2 * CH.TAPS_PER_BRANCH - 1
        zf = jnp.zeros((2, n_ch), jnp.float32)
        rr_k, ri_k, tr, ti = CP.fold_dft_resample(
            zr[:need], zi[:need], F, jnp.asarray(Wr.T), jnp.asarray(Wi.T),
            WS, jnp.concatenate([zf, hr_k]), jnp.concatenate([zf, hi_k]),
            n_ch, t36, q_tile=800, interpret=True)
        hr_k, hi_k = tr[2:], ti[2:]
        np.testing.assert_allclose(np.asarray(rr_k), np.asarray(rr_x),
                                   rtol=0, atol=3e-5, err_msg=str(b))
        np.testing.assert_allclose(np.asarray(ri_k), np.asarray(ri_x),
                                   rtol=0, atol=3e-5, err_msg=str(b))
        np.testing.assert_allclose(np.asarray(hr_k), np.asarray(hr_x),
                                   rtol=0, atol=2e-5, err_msg=str(b))
