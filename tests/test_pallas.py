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
