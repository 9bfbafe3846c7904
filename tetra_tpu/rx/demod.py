"""pi/4-DQPSK demodulation chain (JAX), batched over a channel axis.

TPU-first re-design of the reference chain AGC -> FLL -> RRC -> ML timing
recovery -> Costas -> symbol extraction (src/dsp/pi4dqpsk.cpp:132-140,
fll.cpp:135-149, complex_fd.cpp:89-151, pi4dqpsk_costas.cpp:5-21,
dqpsk_sym_extr.cpp:4-55).  Instead of one thread per block pulling samples
through ring buffers, the chain is a pure function over (channels, time)
blocks:

  * ALL device arithmetic is on explicit (re, im) float32 pairs - the TPU
    vector unit has no complex type (and this environment's TPU backend
    rejects complex64 outright), so complex math is spelled out, which is
    also exactly what the fused Pallas kernels need;
  * per-sample feedback loops (AGC gain, FLL phase/freq) run as a single
    fused `lax.scan` over time, vectorized across channels on the VPU;
  * the RRC matched filter is a stateless overlap-save convolution;
  * timing recovery + Costas + differential symbol extraction run as a second
    fused scan over output-symbol slots with a data-dependent stride into the
    block (fixed trip count + validity mask keeps shapes static for XLA);
  * block-to-block loop state is threaded through an explicit DemodState
    pytree, so streaming is `state, out = demod_block(state, iq)`.

Loop constants and semantics follow the reference (main.cpp:35-44, 77-82).
See rx/demod_fast.py for the chunked-update production variant.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..core import taps as taps_mod
from ..core.fir import fir_stream_pair
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
_BE = None
_BANK = None


def _tables():
    # NumPy constants (NOT jnp): closed over by jitted functions; device
    # arrays created inside a trace would leak tracers across traces.
    global _RRC, _BE, _BANK
    if _RRC is None:
        _RRC = taps_mod.root_raised_cosine(
            P.RRC_TAP_COUNT, P.RRC_ALPHA, P.SYMBOL_RATE, P.SAMPLE_RATE)
        lo, hi = taps_mod.band_edge_pair(
            P.RRC_TAP_COUNT, P.RRC_ALPHA, P.SYMBOL_RATE, P.SAMPLE_RATE)
        _BE = (np.real(lo).astype(np.float32), np.imag(lo).astype(np.float32),
               np.real(hi).astype(np.float32), np.imag(hi).astype(np.float32))
        _BANK = taps_mod.interp_bank(
            P.INTERP_PHASE_COUNT, P.INTERP_TAP_COUNT)
    return _RRC, _BE, _BANK


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
    fll_hist_re: jnp.ndarray  # (C, RRC_TAP_COUNT-1) rotated-sample history
    fll_hist_im: jnp.ndarray
    rrc_tail_re: jnp.ndarray  # (C, RRC_TAP_COUNT-1)
    rrc_tail_im: jnp.ndarray
    mm_tail_re: jnp.ndarray   # (C, INTERP_TAP_COUNT-1)
    mm_tail_im: jnp.ndarray
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
    z2 = lambda n: jnp.zeros((C, n), jnp.float32)
    return DemodState(
        agc_gain=jnp.ones((C,), jnp.float32),
        fll_phase=zf, fll_freq=zf,
        fll_hist_re=z2(P.RRC_TAP_COUNT - 1), fll_hist_im=z2(P.RRC_TAP_COUNT - 1),
        rrc_tail_re=z2(P.RRC_TAP_COUNT - 1), rrc_tail_im=z2(P.RRC_TAP_COUNT - 1),
        mm_tail_re=z2(P.INTERP_TAP_COUNT - 1), mm_tail_im=z2(P.INTERP_TAP_COUNT - 1),
        mm_offset=jnp.zeros((C,), jnp.int32),
        mm_mu=zf, mm_freq=jnp.full((C,), _OMEGA, jnp.float32),
        cos_phase=zf, cos_freq=zf, cos_ph2=zf,
        prev_sym=jnp.zeros((C,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Stage 1: fused AGC + FLL per-sample scan
# ---------------------------------------------------------------------------


def _fast_amplitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """Alpha-max-beta-min |z| approximation used by the reference
    (SDR++ complex_t::fastAmplitude: max + 0.4*min)."""
    a, b = jnp.abs(re), jnp.abs(im)
    return jnp.maximum(a, b) + 0.4 * jnp.minimum(a, b)


def _agc_fll_scan(xr, xi, gain, phase, freq, hist_re, hist_im, be):
    """x: (C, T) -> rotated, gain-normalized samples (C, T) + final state.

    Per sample (fll.cpp:135-149 + SDR++ FastAGC):
      y   = x * gain;            gain += rate * (setpoint - |y|)
      xr  = y * exp(-j phase)
      err = fastamp(FIR_high(xr)) - fastamp(FIR_low(xr))
      freq = clamp(freq + beta * err);  phase = wrap(phase + freq)
    """
    lo_r, lo_i, hi_r, hi_i = [jnp.asarray(t[::-1]) for t in be]

    def step(carry, xt):
        gain, phase, freq, hre, him = carry
        xtr, xti = xt
        yr, yi = xtr * gain, xti * gain
        amp = jnp.sqrt(yr * yr + yi * yi)
        gain = gain + P.AGC_RATE * (P.AGC_SETPOINT - amp)
        gain = jnp.minimum(gain, P.AGC_MAX_GAIN)
        c, s = jnp.cos(phase), jnp.sin(phase)
        rr = yr * c + yi * s          # y * exp(-j phase)
        ri = yi * c - yr * s
        wre = jnp.concatenate([hre, rr[:, None]], axis=1)  # (C, ntaps)
        wim = jnp.concatenate([him, ri[:, None]], axis=1)
        lo_re = jnp.sum(wre * lo_r - wim * lo_i, axis=1)
        lo_im = jnp.sum(wre * lo_i + wim * lo_r, axis=1)
        hi_re = jnp.sum(wre * hi_r - wim * hi_i, axis=1)
        hi_im = jnp.sum(wre * hi_i + wim * hi_r, axis=1)
        err = (_fast_amplitude(hi_re, hi_im) - _fast_amplitude(lo_re, lo_im))
        freq = jnp.clip(freq + _FLL_BETA * err, -_FLL_FREQ_LIM, _FLL_FREQ_LIM)
        phase = phase + freq
        phase = phase - 2 * np.pi * jnp.floor((phase + np.pi) / (2 * np.pi))
        return (gain, phase, freq, wre[:, 1:], wim[:, 1:]), (rr, ri)

    (gain, phase, freq, hist_re, hist_im), (outr, outi) = jax.lax.scan(
        step, (gain, phase, freq, hist_re, hist_im),
        (jnp.swapaxes(xr, 0, 1), jnp.swapaxes(xi, 0, 1)))
    return (jnp.swapaxes(outr, 0, 1), jnp.swapaxes(outi, 0, 1),
            gain, phase, freq, hist_re, hist_im)


# ---------------------------------------------------------------------------
# Stage 2: timing recovery + Costas + symbol extraction scan
# ---------------------------------------------------------------------------

# dqpsk_sym_extr.cpp:33-52: quadrant sym = (im<0)<<1 | ((im<0)!=(re<0));
# diff = (sym - prev) mod 4; remap swaps 0b10/0b11.
_DIFF_REMAP = np.array([0, 1, 3, 2], np.int32)


def _mm_costas_scan(yr, yi, tail_re, tail_im, offset, mu, freq,
                    cphase, cfreq, ph2, prev_sym, bank, n_slots: int):
    """y: (C, T) matched-filter output.  Returns per-slot outputs + state.

    Timing (complex_fd.cpp:89-151): polyphase interpolate at phase
    floor(mu*128); ML error sign(re)*d re/dt + sign(im)*d im/dt from adjacent
    filter phases; 2nd-order loop on (mu, omega); stride floor(mu) samples.
    Costas (pi4dqpsk_costas.cpp): derotate by loop phase and cumulative
    -pi/4/symbol; QPSK decision error step(re)*im - step(im)*re.
    """
    C, T = yr.shape
    er = jnp.concatenate([tail_re, yr], axis=1)  # (C, T + taps - 1)
    ei = jnp.concatenate([tail_im, yi], axis=1)
    ntaps = P.INTERP_TAP_COUNT
    nph = P.INTERP_PHASE_COUNT
    k = jnp.arange(ntaps, dtype=jnp.int32)
    bank = jnp.asarray(bank)
    remap = jnp.asarray(_DIFF_REMAP)

    def step(carry, _):
        offset, mu, freq, cphase, cfreq, ph2, prev_sym = carry
        valid = offset < T
        safe_off = jnp.clip(offset, 0, T - 1)
        idx = safe_off[:, None] + k[None, :]
        wre = jnp.take_along_axis(er, idx, axis=1)   # (C, ntaps)
        wim = jnp.take_along_axis(ei, idx, axis=1)
        phase_i = jnp.clip((mu * nph).astype(jnp.int32), 0, nph - 1)
        c0 = bank[phase_i]                                  # (C, ntaps)
        cp = bank[jnp.minimum(phase_i + 1, nph - 1)]
        cm = bank[jnp.maximum(phase_i - 1, 0)]
        f0r = jnp.sum(wre * c0, axis=1)
        f0i = jnp.sum(wim * c0, axis=1)
        fpr = jnp.sum(wre * cp, axis=1)
        fpi = jnp.sum(wim * cp, axis=1)
        fmr = jnp.sum(wre * cm, axis=1)
        fmi = jnp.sum(wim * cm, axis=1)
        dr = jnp.where(phase_i == 0, fpr - f0r,
                       jnp.where(phase_i == nph - 1, f0r - fmr,
                                 (fpr - fmr) * 0.5))
        di = jnp.where(phase_i == 0, fpi - f0i,
                       jnp.where(phase_i == nph - 1, f0i - fmi,
                                 (fpi - fmi) * 0.5))
        sgn = lambda v: jnp.where(v > 0, 1.0, -1.0)
        err = jnp.clip(sgn(f0r) * dr + sgn(f0i) * di, -1.0, 1.0)
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
        ang = ph2_n - cphase      # combined rotation exp(j(ph2 - cphase))
        c, s = jnp.cos(ang), jnp.sin(ang)
        sr = f0r * c - f0i * s
        si = f0i * c + f0r * s
        cerr = jnp.clip(sgn(sr) * si - sgn(si) * sr, -1.0, 1.0)
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
        a = si < 0
        b = sr < 0
        quad = (a.astype(jnp.int32) << 1) | (a != b).astype(jnp.int32)
        dibit = remap[(quad - prev_sym) & 3]
        prev_sym = jnp.where(valid, quad, prev_sym)
        # phase distance to ideal constellation point, for the quality gate
        ideal_r = jnp.where(b, -0.7071, 0.7071)
        ideal_i = jnp.where(a, -0.7071, 0.7071)
        dist = jnp.abs(jnp.arctan2(ideal_i, ideal_r) - jnp.arctan2(si, sr))

        out = (sr, si, dibit.astype(jnp.uint8), valid, dist)
        return (offset, mu, freq, cphase, cfreq, ph2, prev_sym), out

    carry = (offset, mu, freq, cphase, cfreq, ph2, prev_sym)
    carry, (sre, sim, dibits, valids, dists) = jax.lax.scan(
        step, carry, None, length=n_slots)
    offset, mu, freq, cphase, cfreq, ph2, prev_sym = carry
    offset = offset - T
    outs = dict(
        sym_re=jnp.swapaxes(sre, 0, 1),
        sym_im=jnp.swapaxes(sim, 0, 1),
        dibits=jnp.swapaxes(dibits, 0, 1),
        valid=jnp.swapaxes(valids, 0, 1),
        dist=jnp.swapaxes(dists, 0, 1),
    )
    return (outs, er[:, T:], ei[:, T:], offset, mu, freq, cphase, cfreq,
            ph2, prev_sym)


# ---------------------------------------------------------------------------
# Full chain
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_slots",))
def _demod_block_impl(state: DemodState, xr: jnp.ndarray, xi: jnp.ndarray,
                      n_slots: int):
    rrc, be, bank = _tables()
    (rotr, roti, gain, fphase, ffreq, fhre, fhim) = _agc_fll_scan(
        xr, xi, state.agc_gain, state.fll_phase, state.fll_freq,
        state.fll_hist_re, state.fll_hist_im, be)
    mfr, mfi, rtr, rti = fir_stream_pair(
        rotr, roti, jnp.asarray(rrc), state.rrc_tail_re, state.rrc_tail_im)
    (outs, mtr, mti, offset, mu, mfreq, cphase, cfreq, ph2, prev_sym) = (
        _mm_costas_scan(mfr, mfi, state.mm_tail_re, state.mm_tail_im,
                        state.mm_offset, state.mm_mu, state.mm_freq,
                        state.cos_phase, state.cos_freq, state.cos_ph2,
                        state.prev_sym, bank, n_slots))
    new_state = DemodState(
        agc_gain=gain, fll_phase=fphase, fll_freq=ffreq,
        fll_hist_re=fhre, fll_hist_im=fhim,
        rrc_tail_re=rtr, rrc_tail_im=rti,
        mm_tail_re=mtr, mm_tail_im=mti, mm_offset=offset, mm_mu=mu,
        mm_freq=mfreq, cos_phase=cphase, cos_freq=cfreq, cos_ph2=ph2,
        prev_sym=prev_sym)
    outs["fll_freq"] = ffreq
    outs["agc_gain"] = gain
    return new_state, outs


def demod_block(state: DemodState, iq: np.ndarray):
    """Demodulate one (C, T) block of complex baseband (complex at the host
    boundary only; split into float pairs before entering the device).

    Returns (new_state, outs) with outs:
      sym_re/sym_im (C, S) f32  post-Costas constellation points
      dibits (C, S) uint8  TETRA dibits (MSB-first bit pairs)
      valid  (C, S) bool   slot produced a symbol
      dist   (C, S) f32    |phase error| vs ideal constellation point
    """
    iq = np.atleast_2d(iq)
    xr = jnp.asarray(np.ascontiguousarray(iq.real, dtype=np.float32))
    xi = jnp.asarray(np.ascontiguousarray(iq.imag, dtype=np.float32))
    return _demod_block_impl(state, xr, xi, max_symbols(iq.shape[1]))


def dibits_to_bits(dibits: np.ndarray) -> np.ndarray:
    """Unpack dibit stream to bits, MSB first (bit_unpacker.cpp:4-11)."""
    dibits = np.asarray(dibits, np.uint8)
    out = np.empty(dibits.shape[:-1] + (dibits.shape[-1] * 2,), np.uint8)
    out[..., 0::2] = (dibits >> 1) & 1
    out[..., 1::2] = dibits & 1
    return out
