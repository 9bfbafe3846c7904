"""pi/4-DQPSK demodulation chain (JAX), batched over a channel axis.

TPU-first re-design of the reference chain AGC -> FLL -> RRC -> ML timing
recovery -> Costas -> symbol extraction (src/dsp/pi4dqpsk.cpp:132-140,
fll.cpp:135-149, complex_fd.cpp:89-151, pi4dqpsk_costas.cpp:5-21,
dqpsk_sym_extr.cpp:4-55).  Instead of one thread per block pulling samples
through ring buffers, the chain is a pure function over (channels, time)
blocks:

  * per-sample feedback loops (AGC gain, FLL phase/freq) run as a single
    fused `lax.scan` over time, vectorized across channels on the VPU;
  * the RRC matched filter is a stateless overlap-save convolution;
  * timing recovery + Costas + differential symbol extraction run as a second
    fused scan over output-symbol slots with a data-dependent stride into the
    block (fixed trip count + validity mask keeps shapes static for XLA);
  * block-to-block loop state is threaded through an explicit DemodState
    pytree, so streaming is `state, out = demod_block(state, iq)`.

Loop constants and semantics follow the reference (main.cpp:35-44, 77-82);
see tetra_tpu/ops/demod_pallas.py for the fused Pallas production kernel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..core import taps as taps_mod
from ..core.fir import fir_stream
from ..core.loops import critically_damped

# ---------------------------------------------------------------------------
# Constants (derived once on host)
# ---------------------------------------------------------------------------

_FLL_ALPHA, _FLL_BETA = critically_damped(P.FLL_LOOP_BANDWIDTH)
_FLL_ALPHA = 0.0  # FLL tracks frequency only (fll.cpp:25-26)
_COSTAS_ALPHA, _COSTAS_BETA = critically_damped(P.COSTAS_LOOP_BANDWIDTH)
_MM_MU_GAIN, _MM_OMEGA_GAIN = critically_damped(
    P.CLOCK_RECOVERY_BW, P.CLOCK_RECOVERY_DAMPING)
# (main.cpp:77-82: recov_mu = alpha term -> muGain, recov_omega = beta term)

_OMEGA = 2.0  # samples per symbol
_OMEGA_MIN = _OMEGA * (1.0 - P.CLOCK_RECOVERY_REL_LIMIT)
_OMEGA_MAX = _OMEGA * (1.0 + P.CLOCK_RECOVERY_REL_LIMIT)
_FLL_FREQ_LIM = np.pi / 2.0
_COSTAS_FREQ_LIM = np.pi / 10.0

_RRC = None
_BE_LOW = None
_BE_HIGH = None
_BANK = None


def _tables():
    # NumPy constants (NOT jnp): these are closed over by jitted functions;
    # device arrays created inside a trace would leak tracers across traces.
    global _RRC, _BE_LOW, _BE_HIGH, _BANK
    if _RRC is None:
        _RRC = taps_mod.root_raised_cosine(
            P.RRC_TAP_COUNT, P.RRC_ALPHA, P.SYMBOL_RATE, P.SAMPLE_RATE)
        _BE_LOW, _BE_HIGH = taps_mod.band_edge_pair(
            P.RRC_TAP_COUNT, P.RRC_ALPHA, P.SYMBOL_RATE, P.SAMPLE_RATE)
        _BANK = taps_mod.interp_bank(
            P.INTERP_PHASE_COUNT, P.INTERP_TAP_COUNT)
    return _RRC, _BE_LOW, _BE_HIGH, _BANK


def max_symbols(block_len: int) -> int:
    """Static output-slot count for a block of `block_len` samples."""
    return int(np.ceil(block_len / _OMEGA_MIN)) + 2


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------


class DemodState(NamedTuple):
    agc_gain: jnp.ndarray    # (C,) f32
    fll_phase: jnp.ndarray   # (C,) f32
    fll_freq: jnp.ndarray    # (C,) f32
    fll_hist: jnp.ndarray    # (C, RRC_TAP_COUNT-1) c64 rotated-sample history
    rrc_tail: jnp.ndarray    # (C, RRC_TAP_COUNT-1) c64
    mm_tail: jnp.ndarray     # (C, INTERP_TAP_COUNT-1) c64
    mm_offset: jnp.ndarray   # (C,) i32 read offset into current block
    mm_mu: jnp.ndarray       # (C,) f32 fractional sample phase in [0,1)
    mm_freq: jnp.ndarray     # (C,) f32 samples/symbol estimate
    cos_phase: jnp.ndarray   # (C,) f32
    cos_freq: jnp.ndarray    # (C,) f32
    cos_ph2: jnp.ndarray     # (C,) f32 cumulative -pi/4 derotation
    prev_sym: jnp.ndarray    # (C,) i32 previous quadrant for diff decode


def demod_init(channels: int) -> DemodState:
    C = channels
    zf = jnp.zeros((C,), jnp.float32)
    zc = lambda n: jnp.zeros((C, n), jnp.complex64)
    return DemodState(
        agc_gain=jnp.ones((C,), jnp.float32),
        fll_phase=zf, fll_freq=zf,
        fll_hist=zc(P.RRC_TAP_COUNT - 1),
        rrc_tail=zc(P.RRC_TAP_COUNT - 1),
        mm_tail=zc(P.INTERP_TAP_COUNT - 1),
        mm_offset=jnp.zeros((C,), jnp.int32),
        mm_mu=zf, mm_freq=jnp.full((C,), _OMEGA, jnp.float32),
        cos_phase=zf, cos_freq=zf, cos_ph2=zf,
        prev_sym=jnp.zeros((C,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Stage 1: fused AGC + FLL per-sample scan
# ---------------------------------------------------------------------------


def _fast_amplitude(z: jnp.ndarray) -> jnp.ndarray:
    """Alpha-max-beta-min |z| approximation used by the reference
    (SDR++ complex_t::fastAmplitude: max + 0.4*min)."""
    a, b = jnp.abs(jnp.real(z)), jnp.abs(jnp.imag(z))
    return jnp.maximum(a, b) + 0.4 * jnp.minimum(a, b)


def _agc_fll_scan(x: jnp.ndarray, gain, phase, freq, hist, be_low, be_high):
    """x: (C, T) -> rotated, gain-normalized samples (C, T) + final loop state.

    Per sample (fll.cpp:135-149 + SDR++ FastAGC):
      y   = x * gain;            gain += rate * (setpoint - |y|)
      xr  = y * exp(-j phase)
      err = fastamp(FIR_high(xr)) - fastamp(FIR_low(xr))
      freq = clamp(freq + beta * err);  phase = wrap(phase + freq)
    """
    C, T = x.shape
    ntaps = be_low.shape[0]

    def step(carry, xt):
        gain, phase, freq, hist = carry
        y = xt * gain
        gain = gain + P.AGC_RATE * (P.AGC_SETPOINT - jnp.abs(y))
        gain = jnp.minimum(gain, P.AGC_MAX_GAIN)
        rot = y * jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))
        win = jnp.concatenate([hist, rot[:, None]], axis=1)  # (C, ntaps)
        # convolution: newest sample multiplies kernel tap 0
        lo = jnp.sum(win * be_low[::-1][None, :], axis=1)
        hi = jnp.sum(win * be_high[::-1][None, :], axis=1)
        err = _fast_amplitude(hi) - _fast_amplitude(lo)
        freq = jnp.clip(freq + _FLL_BETA * err, -_FLL_FREQ_LIM, _FLL_FREQ_LIM)
        phase = phase + freq
        phase = phase - 2 * np.pi * jnp.floor((phase + np.pi) / (2 * np.pi))
        new_hist = win[:, 1:]
        return (gain, phase, freq, new_hist), rot

    (gain, phase, freq, hist), out = jax.lax.scan(
        step, (gain, phase, freq, hist), jnp.swapaxes(x, 0, 1))
    return jnp.swapaxes(out, 0, 1), gain, phase, freq, hist


# ---------------------------------------------------------------------------
# Stage 2: timing recovery + Costas + symbol extraction scan
# ---------------------------------------------------------------------------

# dqpsk_sym_extr.cpp:33-52: quadrant sym = (im<0)<<1 | ((im<0)!=(re<0));
# diff = (sym - prev) mod 4; remap swaps 0b10/0b11.
_DIFF_REMAP = jnp.asarray(np.array([0, 1, 3, 2], np.int32))


def _mm_costas_scan(y: jnp.ndarray, tail, offset, mu, freq,
                    cphase, cfreq, ph2, prev_sym, bank, n_slots: int):
    """y: (C, T) matched-filter output.  Returns per-slot outputs + state.

    Timing (complex_fd.cpp:89-151): polyphase interpolate at phase
    floor(mu*128); ML error sign(re)*d re/dt + sign(im)*d im/dt from adjacent
    filter phases; 2nd-order loop on (mu, omega); stride floor(mu) samples.
    Costas (pi4dqpsk_costas.cpp): derotate by loop phase and cumulative
    -pi/4/symbol; QPSK decision error step(re)*im - step(im)*re.
    """
    C, T = y.shape
    ext = jnp.concatenate([tail, y], axis=1)  # (C, T + taps - 1)
    ntaps = P.INTERP_TAP_COUNT
    nph = P.INTERP_PHASE_COUNT
    k = jnp.arange(ntaps, dtype=jnp.int32)

    def step(carry, _):
        offset, mu, freq, cphase, cfreq, ph2, prev_sym = carry
        valid = offset < T
        safe_off = jnp.clip(offset, 0, T - 1)
        win = jnp.take_along_axis(
            ext, safe_off[:, None] + k[None, :], axis=1)  # (C, ntaps)
        phase_i = jnp.clip((mu * nph).astype(jnp.int32), 0, nph - 1)
        c0 = bank[phase_i]                                  # (C, ntaps)
        cp = bank[jnp.minimum(phase_i + 1, nph - 1)]
        cm = bank[jnp.maximum(phase_i - 1, 0)]
        f0 = jnp.sum(win * c0, axis=1)
        fp = jnp.sum(win * cp, axis=1)
        fm = jnp.sum(win * cm, axis=1)
        dfdt = jnp.where(phase_i == 0, fp - f0,
                         jnp.where(phase_i == nph - 1, f0 - fm,
                                   (fp - fm) * 0.5))
        sgn = lambda v: jnp.where(v > 0, 1.0, -1.0)
        err = (sgn(jnp.real(f0)) * jnp.real(dfdt)
               + sgn(jnp.imag(f0)) * jnp.imag(dfdt))
        err = jnp.clip(err, -1.0, 1.0)
        err = jnp.where(valid, err, 0.0)
        freq_n = jnp.clip(freq + _MM_OMEGA_GAIN * err, _OMEGA_MIN, _OMEGA_MAX)
        mu_n = mu + freq_n + _MM_MU_GAIN * err
        delta = jnp.floor(mu_n)
        offset_n = offset + delta.astype(jnp.int32)
        mu_n = mu_n - delta
        freq = jnp.where(valid, freq_n, freq)
        mu = jnp.where(valid, mu_n, mu)
        offset = jnp.where(valid, offset_n, offset)

        # ---- Costas on the interpolated symbol ----
        ph2_n = ph2 - np.pi / 4.0
        ph2_n = jnp.where(ph2_n <= -2 * np.pi, ph2_n + 2 * np.pi, ph2_n)
        rot = f0 * jax.lax.complex(jnp.cos(cphase), -jnp.sin(cphase))
        sym = rot * jax.lax.complex(jnp.cos(ph2_n), jnp.sin(ph2_n))
        cerr = jnp.clip(sgn(jnp.real(sym)) * jnp.imag(sym)
                        - sgn(jnp.imag(sym)) * jnp.real(sym), -1.0, 1.0)
        cerr = jnp.where(valid, cerr, 0.0)
        cfreq_n = jnp.clip(cfreq + _COSTAS_BETA * cerr,
                           -_COSTAS_FREQ_LIM, _COSTAS_FREQ_LIM)
        cphase_n = cphase + cfreq_n + _COSTAS_ALPHA * cerr
        cphase_n = cphase_n - 2 * np.pi * jnp.floor(
            (cphase_n + np.pi) / (2 * np.pi))
        cphase = jnp.where(valid, cphase_n, cphase)
        cfreq = jnp.where(valid, cfreq_n, cfreq)
        ph2 = jnp.where(valid, ph2_n, ph2)

        # ---- differential symbol extraction ----
        a = (jnp.imag(sym) < 0)
        b = (jnp.real(sym) < 0)
        quad = (a.astype(jnp.int32) << 1) | (a != b).astype(jnp.int32)
        dibit = _DIFF_REMAP[(quad - prev_sym) & 3]
        prev_sym = jnp.where(valid, quad, prev_sym)
        # phase distance to ideal constellation point, for the quality gate
        ideal = jax.lax.complex(jnp.where(b, -0.7071, 0.7071).astype(jnp.float32),
                                jnp.where(a, -0.7071, 0.7071).astype(jnp.float32))
        dist = jnp.abs(jnp.angle(ideal) - jnp.angle(sym))

        out = (sym, dibit.astype(jnp.uint8), valid, dist)
        return (offset, mu, freq, cphase, cfreq, ph2, prev_sym), out

    carry = (offset, mu, freq, cphase, cfreq, ph2, prev_sym)
    carry, (syms, dibits, valids, dists) = jax.lax.scan(
        step, carry, None, length=n_slots)
    offset, mu, freq, cphase, cfreq, ph2, prev_sym = carry
    offset = offset - T
    new_tail = ext[:, T:]
    outs = dict(
        syms=jnp.swapaxes(syms, 0, 1),
        dibits=jnp.swapaxes(dibits, 0, 1),
        valid=jnp.swapaxes(valids, 0, 1),
        dist=jnp.swapaxes(dists, 0, 1),
    )
    return outs, new_tail, offset, mu, freq, cphase, cfreq, ph2, prev_sym


# ---------------------------------------------------------------------------
# Full chain
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_slots",))
def _demod_block_impl(state: DemodState, iq: jnp.ndarray, n_slots: int):
    rrc, be_low, be_high, bank = map(jnp.asarray, _tables())
    rot, gain, fphase, ffreq, fhist = _agc_fll_scan(
        iq, state.agc_gain, state.fll_phase, state.fll_freq, state.fll_hist,
        be_low, be_high)
    mf, rrc_tail = fir_stream(rot, rrc, state.rrc_tail)
    outs, mm_tail, offset, mu, mfreq, cphase, cfreq, ph2, prev_sym = (
        _mm_costas_scan(mf, state.mm_tail, state.mm_offset, state.mm_mu,
                        state.mm_freq, state.cos_phase, state.cos_freq,
                        state.cos_ph2, state.prev_sym, bank, n_slots))
    new_state = DemodState(
        agc_gain=gain, fll_phase=fphase, fll_freq=ffreq, fll_hist=fhist,
        rrc_tail=rrc_tail, mm_tail=mm_tail, mm_offset=offset, mm_mu=mu,
        mm_freq=mfreq, cos_phase=cphase, cos_freq=cfreq, cos_ph2=ph2,
        prev_sym=prev_sym)
    outs["fll_freq"] = ffreq
    outs["agc_gain"] = gain
    return new_state, outs


def demod_block(state: DemodState, iq: jnp.ndarray):
    """Demodulate one (C, T) block of complex baseband.

    Returns (new_state, outs) with outs:
      syms   (C, S) complex64 post-Costas constellation points
      dibits (C, S) uint8 TETRA dibits (MSB-first bit pairs)
      valid  (C, S) bool   slot produced a symbol (per-channel symbol counts
                            differ because the clock recovery is fractional)
      dist   (C, S) f32    |phase error| vs ideal constellation point
    """
    iq = jnp.atleast_2d(iq)
    return _demod_block_impl(state, iq.astype(jnp.complex64),
                             max_symbols(iq.shape[1]))


def dibits_to_bits(dibits: np.ndarray) -> np.ndarray:
    """Unpack dibit stream to bits, MSB first (bit_unpacker.cpp:4-11)."""
    dibits = np.asarray(dibits, np.uint8)
    out = np.empty(dibits.shape[:-1] + (dibits.shape[-1] * 2,), np.uint8)
    out[..., 0::2] = (dibits >> 1) & 1
    out[..., 1::2] = dibits & 1
    return out
