"""Fused Pallas TPU kernel: chunked AGC + FLL + RRC matched filter.

One `pallas_call` replaces the XLA scan of rx/demod_fast.py's stage 1 plus
the RRC convolution: the grid iterates over K-sample chunks (TPU grid steps
run sequentially on a core, so VMEM scratch carries the loop state and the
filter history), channels ride the lane dimension, and all filtering is
banded matmuls on the MXU.  Per grid step:

    y     = x * gain                      (AGC, gain frozen per chunk)
    rot   = y * exp(-j(phase + freq n))   (FLL derotation ramp)
    lo,hi = band-edge filters(rot)        (banded matmul over [hist|chunk])
    err   = sum fastamp(hi) - fastamp(lo) -> one freq/phase update
    mf    = RRC(rot)                      (banded matmul, same history)
    gain update from mean amplitude

Semantics match rx/demod_fast._agc_fll_chunked + fir_stream_pair exactly
(same chunk size and update rules), validated by tests/test_pallas.py.
Layout: time on sublanes, channels on lanes -> inputs are (T, C) float32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import params as P
from ..rx.demod import _FLL_FREQ_LIM, _tables
from ..rx.demod_fast import _FLL_BETA
from ..rx.demod_fast import K_SAMP, rot_ramp

M = P.RRC_TAP_COUNT              # 65
HIST = M - 1                     # 64
ROWS = HIST + K_SAMP             # rows of the banded matrices


def _band_matrix(h: np.ndarray) -> np.ndarray:
    """(ROWS, K) matrix with y[k] = sum_j ext[j] H[j, k] = causal conv."""
    H = np.zeros((ROWS, K_SAMP), np.float32)
    for k in range(K_SAMP):
        H[k:k + M, k] = h[::-1]
    return H


def _chunk_body(xr, xi, Hs_ref, ext_r, ext_i, gain, phase, freq):
    """One K_SAMP-sample AGC/FLL/RRC chunk over the (K, C) block xr/xi.

    ext_r/ext_i hold the rotated [history | chunk] rows and must contain the
    current history in rows [:HIST] on entry; on exit rows [K_SAMP:] hold
    this chunk's tail (the next chunk's history).  Returns the matched-filter
    chunk and the updated loop state.  Factored out so the grid kernel can
    unroll U chunks per grid step (fixed per-step overhead dominates the
    sequential chain; BENCH_DETAIL.md roofline).
    """
    # AGC apply (frozen gain)
    yr = xr * gain[None, :]
    yi = xi * gain[None, :]
    amp = jnp.sqrt(yr * yr + yi * yi)

    # FLL derotation ramp via the rotator recurrence (2 transcendental
    # pairs per chunk instead of per sample -- the VPU special-function
    # unit is the chain's binding resource, BENCH_DETAIL.md roofline)
    c, s = rot_ramp(phase, freq, K_SAMP, time_first=True)
    rr = yr * c + yi * s
    ri = yi * c - yr * s

    ext_r[HIST:, :] = rr
    ext_i[HIST:, :] = ri

    er = ext_r[:, :]
    ei = ext_i[:, :]

    # ALL five filters (band-edge lo/hi complex pairs + RRC) in two stacked
    # matmuls: Hs is (5K, ROWS) with the per-filter banded matrices stacked
    # along rows, so one (5K, ROWS) @ (ROWS, C) pair replaces ten separate
    # (K, ROWS) @ (ROWS, C) products -- same FLOPs, 5x fewer MXU ops and
    # full 128-row tile occupancy instead of half
    Hall = Hs_ref[:, :]                  # (5K, ROWS)
    ar = jnp.dot(Hall, er, preferred_element_type=jnp.float32)   # (5K, C)
    ai = jnp.dot(Hall, ei, preferred_element_type=jnp.float32)
    K = K_SAMP
    lo_r = ar[0 * K:1 * K] - ai[1 * K:2 * K]
    lo_i = ar[1 * K:2 * K] + ai[0 * K:1 * K]
    hi_r = ar[2 * K:3 * K] - ai[3 * K:4 * K]
    hi_i = ar[3 * K:4 * K] + ai[2 * K:3 * K]

    def fastamp(a, b):
        aa, ab = jnp.abs(a), jnp.abs(b)
        return jnp.maximum(aa, ab) + 0.4 * jnp.minimum(aa, ab)

    err = jnp.sum(fastamp(hi_r, hi_i) - fastamp(lo_r, lo_i), axis=0)

    # loop updates (identical to demod_fast._agc_fll_chunked, incl. the
    # multiplicative log-domain AGC step -- see the note there)
    r_eff = 1.0 - (1.0 - P.AGC_RATE) ** K_SAMP
    amp_mean = jnp.maximum(jnp.mean(amp, axis=0), 1e-9)
    ratio = jnp.clip(P.AGC_SETPOINT / amp_mean, 0.25, 4.0)
    ratio = jnp.where(amp_mean < 0.01 * P.AGC_SETPOINT, 1.0, ratio)
    new_gain = jnp.minimum(gain * ratio ** r_eff, P.AGC_MAX_GAIN)
    new_freq = jnp.clip(freq + _FLL_BETA * err, -_FLL_FREQ_LIM, _FLL_FREQ_LIM)
    new_phase = phase + freq * K_SAMP
    new_phase = new_phase - 2 * np.pi * jnp.floor(
        (new_phase + np.pi) / (2 * np.pi))
    # RRC matched filter chunk (real taps)
    return ar[4 * K:5 * K], ai[4 * K:5 * K], new_gain, new_phase, new_freq


def _kernel(U, xr_ref, xi_ref, gain0, phase0, freq0, hist_r0, hist_i0, Hs_ref,
            mfr_ref, mfi_ref, gain_out, phase_out, freq_out,
            hist_r_out, hist_i_out,
            ext_r, ext_i, state, sem):
    """Grid: (n_tiles, n_chunks // U); U chunks unrolled per step.  Refs:
    xr/xi:   (U*K, C) chunk block
    gain0/phase0/freq0: (1, C) initial state
    hist_r0/hist_i0: (HIST, C) rotated-sample history carried across blocks
    Hs:      (5*K, ROWS) stacked transposed banded matrices
             [lo_r, lo_i, hi_r, hi_i, rrc]
    outputs: mf chunk (U*K, C); final state (1, C) x3; history (HIST, C) x2
    scratch: ext_r/ext_i (ROWS, C) rotated history+chunk; state (3, C)
    """
    i = pl.program_id(1)          # grid step (inner, sequential per tile)
    n = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        state[0, :] = gain0[0, :]
        state[1, :] = phase0[0, :]
        state[2, :] = freq0[0, :]
        ext_r[:HIST, :] = hist_r0[:, :]
        ext_i[:HIST, :] = hist_i0[:, :]

    gain = state[0, :]
    phase = state[1, :]
    freq = state[2, :]

    for u in range(U):
        # history shift: the previous chunk's tail becomes this chunk's
        # history (rows 0..HIST-1 <- rows K..ROWS-1 do not overlap since
        # HIST == K_SAMP); at the very first chunk _init loaded it instead
        if u > 0:
            ext_r[:HIST, :] = ext_r[K_SAMP:, :]
            ext_i[:HIST, :] = ext_i[K_SAMP:, :]
        else:
            @pl.when(i > 0)
            def _shift_hist():
                ext_r[:HIST, :] = ext_r[K_SAMP:, :]
                ext_i[:HIST, :] = ext_i[K_SAMP:, :]

        r0 = u * K_SAMP
        mfr, mfi, gain, phase, freq = _chunk_body(
            xr_ref[r0:r0 + K_SAMP, :], xi_ref[r0:r0 + K_SAMP, :],
            Hs_ref, ext_r, ext_i, gain, phase, freq)
        mfr_ref[r0:r0 + K_SAMP, :] = mfr
        mfi_ref[r0:r0 + K_SAMP, :] = mfi

    state[0, :] = gain
    state[1, :] = phase
    state[2, :] = freq

    @pl.when(i == n - 1)
    def _fin():
        gain_out[0, :] = gain
        phase_out[0, :] = phase
        freq_out[0, :] = freq
        hist_r_out[:, :] = ext_r[K_SAMP:, :]
        hist_i_out[:, :] = ext_i[K_SAMP:, :]


_HS = None


def _band_stack():
    """(5*K_SAMP, ROWS): transposed banded matrices for the five filters
    stacked along rows [lo_r, lo_i, hi_r, hi_i, rrc] -- the single left
    operand of the fused stage-1 matmul pair."""
    global _HS
    if _HS is None:
        rrc, be, _ = _tables()
        lo_r, lo_i, hi_r, hi_i = be
        _HS = np.concatenate(
            [_band_matrix(lo_r).T, _band_matrix(lo_i).T,
             _band_matrix(hi_r).T, _band_matrix(hi_i).T,
             _band_matrix(rrc).T], axis=0)
    return _HS


# channel tile for the outer grid dim: bounds the per-step VMEM working set
# (K=128 x C=2048 blocks blew the 16 MB scoped-vmem limit at ~18 MB)
CHAN_TILE = 2048
# chunks unrolled per grid step (must divide n_chunks).  Stage 1's unroll
# MEASURED AS A REGRESSION at U=2/CT=2048 (full chain 2432 -> 2322 Msps:
# the double-buffered (U*K, CT) in/out blocks cost ~4.2*U MB and push the
# working set against the 16 MB scoped-VMEM limit), unlike stage 2 where
# the same regrouping wins -- stage 1 is ~5% of chain time with big MXU
# matmuls per step, so there is no per-step overhead worth amortizing.
# Kept as a knob for future geometries; default off.
UNROLL_MAX = 1


@partial(jax.jit, static_argnames=("interpret",))
def agc_fll_rrc(xr_t, xi_t, gain, phase, freq, hist_r, hist_i,
                interpret=False):
    """Fused stage-1: (T, C) float pair + (HIST, C) rotated-sample history ->
    matched-filter output (T, C) pair, final (gain, phase, freq), and the new
    history (streaming continuity across blocks).

    Channels tile on the outer grid dimension (chunks iterate sequentially
    inside each tile, mirroring ops/mm_pallas) so VMEM stays bounded for
    any C."""
    T, C = xr_t.shape
    assert T % K_SAMP == 0
    assert K_SAMP >= HIST  # history shift assumes non-overlapping copy
    n_chunks = T // K_SAMP
    Hs = jnp.asarray(_band_stack())
    CT = CHAN_TILE if C % CHAN_TILE == 0 and C > CHAN_TILE else C
    n_tiles = C // CT
    U = max(u for u in range(1, min(UNROLL_MAX, n_chunks) + 1)
            if n_chunks % u == 0)

    chunk = lambda c, i: (i, c)
    ctile = lambda c, i: (0, c)
    const = lambda c, i: (0, 0)
    in_specs = [
        pl.BlockSpec((U * K_SAMP, CT), chunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((U * K_SAMP, CT), chunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((HIST, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((HIST, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((5 * K_SAMP, ROWS), const, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((U * K_SAMP, CT), chunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((U * K_SAMP, CT), chunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((HIST, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((HIST, CT), ctile, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, C), jnp.float32),
        jax.ShapeDtypeStruct((T, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((1, C), jnp.float32),
        jax.ShapeDtypeStruct((HIST, C), jnp.float32),
        jax.ShapeDtypeStruct((HIST, C), jnp.float32),
    ]
    return pl.pallas_call(
        partial(_kernel, U),
        grid=(n_tiles, n_chunks // U),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ROWS, CT), jnp.float32),
            pltpu.VMEM((ROWS, CT), jnp.float32),
            pltpu.VMEM((3, CT), jnp.float32),
            pltpu.SemaphoreType.REGULAR,
        ],
        interpret=interpret,
    )(xr_t, xi_t, gain[None, :], phase[None, :], freq[None, :],
      hist_r, hist_i, Hs)
