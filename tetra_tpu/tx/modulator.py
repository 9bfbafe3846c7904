"""pi/4-DQPSK modulator with RRC pulse shaping (JAX, batched over channels).

TX counterpart of the RX demod chain: bit stream (MSB-first dibits) ->
differential phase -> 18 ksym/s complex symbols -> 2x upsample -> RRC pulse
shaping at 36 ksps.  Together with tx.burst and tx.fec_enc this forms the
golden modulator used as the test fixture (SURVEY.md section 7 step 2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..core import taps as T
from ..core.fir import fir_valid

# phase step per dibit, in radians (ETSI table 9.14)
_DIBIT_PHASE = np.array([1, 3, -1, -3], np.float32) * (np.pi / 4.0)


def bits_to_symbols(bits: jnp.ndarray, phase0: float = 0.0) -> jnp.ndarray:
    """Bit stream (..., 2K) -> pi/4-DQPSK unit-circle symbols (..., K).

    bits are consumed MSB-first in pairs; symbol k carries cumulative phase
    phi_k = phi_{k-1} + dphi(dibit_k).
    """
    bits = jnp.asarray(bits)
    dibits = (bits[..., 0::2] << 1) | bits[..., 1::2]
    dphi = jnp.asarray(_DIBIT_PHASE)[dibits]
    phase = phase0 + jnp.cumsum(dphi, axis=-1)
    return jnp.exp(1j * phase).astype(jnp.complex64)


def modulate(bits: jnp.ndarray, sps: int = 2,
             rrc_taps: int = P.RRC_TAP_COUNT,
             rrc_alpha: float = P.RRC_ALPHA,
             phase0: float = 0.0) -> jnp.ndarray:
    """Full modulator: bits (C, 2K) -> baseband IQ (C, K*sps) complex64.

    Impulse-train upsampling followed by an RRC shaping filter (matched to the
    receiver's RRC at pi4dqpsk.cpp:18).  The shaping filter gain is scaled so
    symbol peaks come out near unit amplitude.
    """
    bits = jnp.atleast_2d(bits)
    syms = bits_to_symbols(bits, phase0)          # (C, K)
    C, K = syms.shape
    up = jnp.zeros((C, K * sps), jnp.complex64)
    up = up.at[:, ::sps].set(syms)
    h = T.root_raised_cosine(rrc_taps, rrc_alpha, 1.0, float(sps))
    h = h * sps  # unit symbol-peak gain after impulse-train upsampling
    pad = jnp.zeros((C, h.shape[0] - 1), jnp.complex64)
    ext = jnp.concatenate([pad, up], axis=1)
    return fir_valid(ext, jnp.asarray(h))          # (C, K*sps)
