"""Fused Pallas TPU kernel: chunked AGC + FLL + RRC matched filter.

One `pallas_call` replaces the XLA scan of rx/demod_fast.py's stage 1 plus
the RRC convolution: the grid iterates over K-sample chunks (TPU grid steps
run sequentially on a core, so VMEM scratch carries the loop state and the
filter history), channels ride the lane dimension, and all filtering is
banded matmuls on the MXU.  Per grid step:

    y     = x * gain                      (AGC, gain frozen per group)
    rot   = y * exp(-j(phase + freq n))   (FLL derotation ramp)
    lo,hi = band-edge filters(rot)        (banded matmul over [hist|group])
    err   = sum fastamp(hi) - fastamp(lo) -> freq/gain updates
    mf    = RRC(rot)                      (banded matmul, same history)

PAIR MODE (round 4, default OFF -- rx/demod_fast.PAIR_STAGE1): with the
flag on and T a multiple of 2*K_SAMP the kernel processes a
2*K_SAMP-sample GROUP per sequential step -- gain/rotation frozen over
the group, the five banded filters as one (5*2K, HIST+2K) matmul pair
((HIST+K)/K -> (HIST+2K)/2K ops per sample-tap), then TWO sequential loop
updates from the per-half error/amplitude sums (FRESH measurements: the
tuned K_SAMP=64 dynamics are kept; a single update per 128 samples
measurably fails 600 Hz pull-in).  Measured a LOSS on this TPU (see the
flag's note: the doubled stacked-matmul intermediates force CHAN_TILE
down to 1024, keeping the grid-step chain length unchanged, and stage 1
is VPU-elementwise bound) -- kept as a knob for other geometries.

Semantics match rx/demod_fast._agc_fll_chunked + fir_stream_pair exactly
(same grouping rule and update equations), validated by
tests/test_pallas.py.  Layout: time on sublanes, channels on lanes ->
inputs are (T, C) float32.
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
from ..rx import demod_fast as DF
from ..rx.demod_fast import _FLL_BETA, _AMP_KAPPA
from ..rx.demod_fast import _fll_tap_offsets
from ..rx.demod_fast import K_SAMP, rot_ramp

# The A/B knobs (FLL_DECIM / AGC_RMS / PAIR_STAGE1) are read through the
# demod_fast MODULE at trace time (ADVICE r4: by-value imports went stale
# when scripts mutated demod_fast.FLL_DECIM before the first trace, leaving
# _fll_tap_offsets on the new value but Kd/beta_d and the cached band stack
# on the old one).  They remain trace-time constants: mutate only before
# the first demod call (demod_fast documents the contract and validates D).

M = P.RRC_TAP_COUNT              # 65
HIST = M - 1                     # 64


def _geom(pair: bool):
    """(halves per group, group samples, banded-matrix rows)."""
    H = 2 if pair else 1
    KG = H * K_SAMP
    return H, KG, HIST + KG


def _band_matrix(h: np.ndarray, KG: int) -> np.ndarray:
    """(HIST+KG, KG) matrix with y[k] = sum_j ext[j] H[j, k] = causal conv."""
    rows = HIST + KG
    Hm = np.zeros((rows, KG), np.float32)
    for k in range(KG):
        Hm[k:k + M, k] = h[::-1]
    return Hm


_HS = {}


def _band_stack(pair: bool):
    """(4*KG//D + KG, HIST+KG): transposed banded matrices for the five
    filters stacked along rows [lo_r, lo_i, hi_r, hi_i, rrc] -- the single
    left operand of the fused stage-1 matmul pair.  The four band-edge
    blocks keep only every FLL_DECIM-th output tap (rx/demod_fast.FLL_DECIM:
    the FLL consumes only the error SUM, so decimated taps carry ~the full
    information at 1/D the matmul rows and per-tap VPU work)."""
    key = (pair, DF.FLL_DECIM)   # keyed on D too: a pre-trace FLL_DECIM
    if key not in _HS:           # mutation must never reuse a stale stack
        _, KG, _ = _geom(pair)
        rrc, be, _ = _tables()
        lo_r, lo_i, hi_r, hi_i = be
        offs = _fll_tap_offsets(KG)
        _HS[key] = np.concatenate(
            [_band_matrix(lo_r, KG)[:, offs].T,
             _band_matrix(lo_i, KG)[:, offs].T,
             _band_matrix(hi_r, KG)[:, offs].T,
             _band_matrix(hi_i, KG)[:, offs].T,
             _band_matrix(rrc, KG).T], axis=0)
    return _HS[key]


def _chunk_body(pair, ablate, xr, xi, Hs_ref, ext_r, ext_i, gain, phase,
                freq):
    """One group (K_SAMP or 2*K_SAMP samples) of the AGC/FLL/RRC loop.

    ext_r/ext_i hold the rotated [history | group] rows and must contain
    the current history in rows [:HIST] on entry; on exit rows [KG:] hold
    this group's tail (the next group's history).  Returns the
    matched-filter group and the updated loop state.
    """
    H_g, KG, _ = _geom(pair)
    D = DF.FLL_DECIM
    Kd = KG // D
    npd = K_SAMP // D
    # AGC apply (frozen gain over the group)
    yr = xr * gain[None, :]
    yi = xi * gain[None, :]

    # FLL derotation ramp via the rotator recurrence (2 transcendental
    # pairs per group instead of per sample -- the VPU special-function
    # unit is the chain's binding resource, BENCH_DETAIL.md roofline)
    if "ramp" in ablate:      # profiling only: skip ramp build + rotation
        rr, ri = yr, yi
    else:
        c, s = rot_ramp(phase, freq, KG, time_first=True)
        rr = yr * c + yi * s
        ri = yi * c - yr * s

    ext_r[HIST:, :] = rr
    ext_i[HIST:, :] = ri

    er = ext_r[:, :]
    ei = ext_i[:, :]

    # ALL five filters (band-edge lo/hi complex pairs decimated to Kd taps
    # + full-rate RRC) in two stacked matmuls: Hs is (4Kd+KG, HIST+KG)
    # with the per-filter banded matrices stacked along rows, so one
    # (4Kd+KG, HIST+KG) @ (HIST+KG, C) pair replaces ten separate
    # products -- 5x fewer MXU ops than the separate form and, with the
    # FLL_DECIM tap cut, 40% of the full-rate stack's FLOPs
    Hall = Hs_ref[:, :]                  # (4Kd+KG, HIST+KG)
    if "mm" in ablate:        # profiling only: skip the stacked matmuls
        rows = Hall.shape[0]
        ar = jnp.broadcast_to(er[:1, :], (rows, er.shape[1]))
        ai = jnp.broadcast_to(ei[:1, :], (rows, ei.shape[1]))
    else:
        ar = jnp.dot(Hall, er, preferred_element_type=jnp.float32)
        ai = jnp.dot(Hall, ei, preferred_element_type=jnp.float32)
    lo_r = ar[0 * Kd:1 * Kd] - ai[1 * Kd:2 * Kd]
    lo_i = ar[1 * Kd:2 * Kd] + ai[0 * Kd:1 * Kd]
    hi_r = ar[2 * Kd:3 * Kd] - ai[3 * Kd:4 * Kd]
    hi_i = ar[3 * Kd:4 * Kd] + ai[2 * Kd:3 * Kd]

    def fastamp(a, b):
        aa, ab = jnp.abs(a), jnp.abs(b)
        return jnp.maximum(aa, ab) + 0.4 * jnp.minimum(aa, ab)

    err = fastamp(hi_r, hi_i) - fastamp(lo_r, lo_i)        # (Kd, C)

    # per-K_SAMP sequential updates from FRESH per-half sums (identical
    # equations to demod_fast._agc_fll_chunked pair mode, incl. the
    # multiplicative log-domain AGC step and the decimated-error scale /
    # AGC sub-window -- see the notes there)
    ramp_freq = freq                   # the frozen freq the ramp applied
    r_eff = 1.0 - (1.0 - P.AGC_RATE) ** K_SAMP
    beta_d = _FLL_BETA * D
    if DF.AGC_RMS:
        pw = yr * yr + yi * yi         # |y|^2, (KG, C)
    for h in range(H_g):
        sa = slice(h * K_SAMP, (h + 1) * K_SAMP)
        if "amp" in ablate:   # profiling only: skip the |y| estimator
            amp_mean = jnp.mean(yr[sa, :], axis=0)
        elif DF.AGC_RMS:
            amp_mean = _AMP_KAPPA * jnp.sqrt(jnp.mean(pw[sa, :], axis=0))
        else:
            awr, awi = yr[sa, :], yi[sa, :]
            amp_mean = jnp.mean(jnp.sqrt(awr * awr + awi * awi), axis=0)
        amp_mean = jnp.maximum(amp_mean, 1e-9)
        ratio = jnp.clip(P.AGC_SETPOINT / amp_mean, 0.25, 4.0)
        ratio = jnp.where(amp_mean < 0.01 * P.AGC_SETPOINT, 1.0, ratio)
        gain = jnp.minimum(gain * ratio ** r_eff, P.AGC_MAX_GAIN)
        err_sum = jnp.sum(err[h * npd:(h + 1) * npd, :], axis=0)
        freq = jnp.clip(freq + beta_d * err_sum,
                        -_FLL_FREQ_LIM, _FLL_FREQ_LIM)
    # carried phase = the APPLIED rotation's end (continuity of the
    # rotated stream into the next group)
    new_phase = phase + ramp_freq * KG
    new_phase = new_phase - 2 * np.pi * jnp.floor(
        (new_phase + np.pi) / (2 * np.pi))
    # RRC matched filter group (real taps)
    return ar[4 * Kd:4 * Kd + KG], ai[4 * Kd:4 * Kd + KG], gain, \
        new_phase, freq


def _kernel(U, pair, ablate, xr_ref, xi_ref, gain0, phase0, freq0,
            hist_r0, hist_i0,
            Hs_ref, mfr_ref, mfi_ref, gain_out, phase_out, freq_out,
            hist_r_out, hist_i_out,
            ext_r, ext_i, state, sem):
    """Grid: (n_tiles, n_groups // U); U groups unrolled per step.  Refs:
    xr/xi:   (U*KG, C) group block
    gain0/phase0/freq0: (1, C) initial state
    hist_r0/hist_i0: (HIST, C) rotated-sample history carried across blocks
    Hs:      (4*KG//D+KG, HIST+KG) stacked transposed banded matrices
    outputs: mf block (U*KG, C); final state (1, C) x3; history (HIST, C) x2
    scratch: ext_r/ext_i (HIST+KG, C) rotated history+group; state (3, C)
    """
    _, KG, _ = _geom(pair)
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
        # history shift: the previous group's tail becomes this group's
        # history (rows 0..HIST-1 <- rows KG..HIST+KG-1 do not overlap
        # since HIST <= KG); at the very first group _init loaded it
        if u > 0:
            ext_r[:HIST, :] = ext_r[KG:, :]
            ext_i[:HIST, :] = ext_i[KG:, :]
        else:
            @pl.when(i > 0)
            def _shift_hist():
                ext_r[:HIST, :] = ext_r[KG:, :]
                ext_i[:HIST, :] = ext_i[KG:, :]

        r0 = u * KG
        mfr, mfi, gain, phase, freq = _chunk_body(
            pair, ablate, xr_ref[r0:r0 + KG, :], xi_ref[r0:r0 + KG, :],
            Hs_ref, ext_r, ext_i, gain, phase, freq)
        mfr_ref[r0:r0 + KG, :] = mfr
        mfi_ref[r0:r0 + KG, :] = mfi

    state[0, :] = gain
    state[1, :] = phase
    state[2, :] = freq

    @pl.when(i == n - 1)
    def _fin():
        gain_out[0, :] = gain
        phase_out[0, :] = phase
        freq_out[0, :] = freq
        hist_r_out[:, :] = ext_r[KG:, :]
        hist_i_out[:, :] = ext_i[KG:, :]


# channel tile for the outer grid dim: bounds the per-step VMEM working set.
# Pair mode halves the tile: the stacked-matmul intermediates (5*KG, CT)
# double with the group size and blow the 16 MB scoped-VMEM limit at
# CT=2048.
CHAN_TILE = 2048
CHAN_TILE_PAIR = 1024
# groups unrolled per grid step (must divide n_groups).  Stage 1's unroll
# MEASURED AS A REGRESSION at U=2/CT=2048 (full chain 2432 -> 2322 Msps:
# the double-buffered (U*K, CT) in/out blocks cost ~4.2*U MB and push the
# working set against the 16 MB scoped-VMEM limit), unlike stage 2 where
# the same regrouping wins.  Kept as a knob for future geometries.
UNROLL_MAX = 1


@partial(jax.jit, static_argnames=("interpret", "ablate"))
def agc_fll_rrc(xr_t, xi_t, gain, phase, freq, hist_r, hist_i,
                interpret=False, ablate: tuple = ()):
    """Fused stage-1: (T, C) float pair + (HIST, C) rotated-sample history ->
    matched-filter output (T, C) pair, final (gain, phase, freq), and the new
    history (streaming continuity across blocks).

    Channels tile on the outer grid dimension (groups iterate sequentially
    inside each tile, mirroring ops/mm_pallas) so VMEM stays bounded for
    any C.  Pair mode follows rx/demod_fast.PAIR_STAGE1 (measured a loss
    on this TPU -- see that flag's note -- so off by default), mirroring
    rx/demod_fast._agc_fll_chunked exactly."""
    T, C = xr_t.shape
    assert T % K_SAMP == 0
    assert K_SAMP >= HIST  # history shift assumes non-overlapping copy
    pair = DF.PAIR_STAGE1 and (T % (2 * K_SAMP) == 0)
    _, KG, ROWS_G = _geom(pair)
    n_groups = T // KG
    Hs = jnp.asarray(_band_stack(pair))
    ct0 = CHAN_TILE_PAIR if pair else CHAN_TILE
    CT = ct0 if C % ct0 == 0 and C > ct0 else C
    n_tiles = C // CT
    U = max(u for u in range(1, min(UNROLL_MAX, n_groups) + 1)
            if n_groups % u == 0)

    chunk = lambda c, i: (i, c)
    ctile = lambda c, i: (0, c)
    const = lambda c, i: (0, 0)
    in_specs = [
        pl.BlockSpec((U * KG, CT), chunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((U * KG, CT), chunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((HIST, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((HIST, CT), ctile, memory_space=pltpu.VMEM),
        pl.BlockSpec((int(Hs.shape[0]), ROWS_G), const,
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((U * KG, CT), chunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((U * KG, CT), chunk, memory_space=pltpu.VMEM),
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
        partial(_kernel, U, pair, frozenset(ablate)),
        grid=(n_tiles, n_groups // U),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((ROWS_G, CT), jnp.float32),
            pltpu.VMEM((ROWS_G, CT), jnp.float32),
            pltpu.VMEM((3, CT), jnp.float32),
            pltpu.SemaphoreType.REGULAR,
        ],
        interpret=interpret,
    )(xr_t, xi_t, gain[None, :], phase[None, :], freq[None, :],
      hist_r, hist_i, Hs)
