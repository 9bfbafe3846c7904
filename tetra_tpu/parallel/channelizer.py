"""Polyphase DFT-filterbank channelizer + rational resampler (JAX, TPU-first).

Splits a wideband IQ capture into N x 25 kHz TETRA channels - the data
parallel axis of the whole pipeline (SURVEY.md section 2.10; the reference
handles exactly one VFO channel, main.cpp:75).

Design:
  * 2x-oversampled polyphase channelizer: input at fs = N*25 kHz, hop N/2
    samples per output -> each channel emits 50 kHz complex baseband.  The
    DFT across branches runs as real matmuls against the DFT basis (MXU
    friendly; the TPU backend here has no complex dtype).
  * rational 18/25 polyphase resampler: 50 kHz -> 36 kHz so the demod chain
    sees its native 2 samples/symbol.

Everything is a stateless gather/matmul over a block with small tail carries,
so it composes with the sharded demod (channels axis) and the halo-exchange
time sharding of mesh.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.taps import nuttall

TAPS_PER_BRANCH = 48


@lru_cache(maxsize=8)
def _prototype(n_ch: int, taps_per_branch: int = TAPS_PER_BRANCH) -> np.ndarray:
    """Lowpass prototype for the filterbank: Nuttall-windowed sinc.

    The bank is 2x oversampled (50 kHz out per 25 kHz channel), so the
    passband can extend past half the channel spacing.  Cutoff 0.53/n_ch
    with 48 taps/branch keeps the TETRA RRC band edge (+-12.15 kHz) in the
    FLAT region (-0.2 dB; cutoff at half-spacing would put -6 dB right at
    the band edge and wreck the matched filter's Nyquist property) while
    still rejecting adjacent-channel energy by -71 dB at 15 kHz -- the
    demod's band-edge FLL discriminator sits at +-12.15 kHz and a leaky
    prototype biases it (the reference's 30 kHz VFO prefilter plays this
    role, main.cpp:35-36)."""
    L = n_ch * taps_per_branch
    n = np.arange(L)
    c = (L - 1) / 2.0
    cutoff = 0.53 / n_ch  # cycles/sample at the wideband rate
    h = 2 * cutoff * np.sinc(2 * cutoff * (n - c)) * nuttall(n, L)
    h = h / h.sum() * n_ch
    return h.astype(np.float32)


@lru_cache(maxsize=8)
def _dft_basis(n_ch: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n_ch)
    # negative exponent: channel k extracts +k*25 kHz (verified by tone test)
    W = np.exp(-2j * np.pi * np.outer(k, k) / n_ch)
    return (W.real.astype(np.float32), W.imag.astype(np.float32))


@partial(jax.jit, static_argnames=("n_ch",))
def _channelize_block(xr, xi, n_ch: int):
    """(T,) wideband float pair -> (n_ch, T//(n_ch//2)) channel float pairs.

    2x oversampled: hop = n_ch//2.  Input must be padded so that
    (T - L) % hop == 0 with L = n_ch*TAPS_PER_BRANCH.
    """
    hop = n_ch // 2
    L = n_ch * TAPS_PER_BRANCH
    h = jnp.asarray(_prototype(n_ch))
    Wr, Wi = map(jnp.asarray, _dft_basis(n_ch))
    T = xr.shape[0]
    n_out = (T - L) // hop + 1
    # frame the signal: (n_out, L)
    starts = jnp.arange(n_out) * hop
    idx = starts[:, None] + jnp.arange(L)[None, :]
    fr = xr[idx] * h[None, :]
    fi = xi[idx] * h[None, :]
    # fold the L-long windows into n_ch branches (sum over taps_per_branch)
    fr = fr.reshape(n_out, TAPS_PER_BRANCH, n_ch).sum(axis=1)
    fi = fi.reshape(n_out, TAPS_PER_BRANCH, n_ch).sum(axis=1)
    # DFT across branches: y[m, k] = sum_b f[m, b] * exp(+j 2 pi k b / N)
    yr = fr @ Wr.T - fi @ Wi.T          # (n_out, n_ch)
    yi = fr @ Wi.T + fi @ Wr.T
    # hop phase correction: branch m shifts by hop*m samples; channel k picks
    # up exp(-j 2 pi k hop m / N) = (-1)^(k m) for hop = N/2
    m = jnp.arange(n_out)
    k = jnp.arange(n_ch)
    signflip = jnp.where((m[:, None] * k[None, :]) % 2 == 1, -1.0, 1.0)
    yr = yr * signflip
    yi = yi * signflip
    return jnp.swapaxes(yr, 0, 1), jnp.swapaxes(yi, 0, 1)


def channelize(iq: np.ndarray, n_ch: int) -> np.ndarray:
    """Host-facing: wideband complex (T,) at n_ch*25 kHz -> (n_ch, T2)
    complex at 50 kHz per channel (2x oversampled)."""
    iq = np.asarray(iq)
    xr = jnp.asarray(iq.real.astype(np.float32))
    xi = jnp.asarray(iq.imag.astype(np.float32))
    yr, yi = _channelize_block(xr, xi, n_ch)
    return np.asarray(yr) + 1j * np.asarray(yi)


# ---------------------------------------------------------------------------
# Rational polyphase resampler (50 kHz -> 36 kHz: L=18, M=25)
# ---------------------------------------------------------------------------

RS_TAPS_PER_PHASE = 24


@lru_cache(maxsize=8)
def _resamp_bank(L: int, M: int) -> np.ndarray:
    """Polyphase bank for rational L/M resampling (upsample L, filter,
    downsample M).  Cutoff at 0.48x the lower of the two Nyquists: the
    Nuttall transition then straddles the band 12.5..23.85 kHz (for 50->36)
    so the TETRA signal band stays flat while everything that would fold
    onto it is stopped.  24 taps/phase keeps the RRC band-edge droop at
    -0.09 dB with -62 dB at the first alias edge (the original 8 taps/phase
    drooped ~2 dB at the band edge and wrecked wideband EVM)."""
    total = L * RS_TAPS_PER_PHASE
    n = np.arange(total)
    c = (total - 1) / 2.0
    cutoff = 0.48 / max(L, M)  # cycles/sample in the upsampled domain
    h = 2 * cutoff * np.sinc(2 * cutoff * (n - c)) * nuttall(n, total)
    h = h * (L / h.sum())     # DC gain L compensates the zero-stuffing
    bank = np.zeros((L, RS_TAPS_PER_PHASE), np.float64)
    for p in range(L):
        bank[p] = h[p::L]
    return bank.astype(np.float32)


@lru_cache(maxsize=64)
def _resamp_indices(n_in: int, L: int, M: int):
    """Output sample n taps the window starting at floor(n*M/L) with
    polyphase phase (n*M) % L."""
    n_out = (n_in - RS_TAPS_PER_PHASE) * L // M
    n = np.arange(n_out)
    base = (n * M) // L
    phase = (n * M) % L
    return base.astype(np.int32), phase.astype(np.int32), n_out


@partial(jax.jit, static_argnames=("n_in", "L", "M"))
def _resample_block(xr, xi, n_in: int, L: int, M: int):
    # y[n] = sum_k x[base - k] h[r + k L] with base = floor(nM/L), r = nM%L:
    # the window runs BACKWARD from base.  Implemented as a forward window
    # over a (taps-1)-zero-padded input with flipped per-phase coefficients
    # (constant taps-1-sample delay).
    base, phase, n_out = _resamp_indices(n_in, L, M)
    bank = jnp.asarray(_resamp_bank(L, M))
    pad = RS_TAPS_PER_PHASE - 1
    zshape = xr.shape[:-1] + (pad,)
    xr = jnp.concatenate([jnp.zeros(zshape, xr.dtype), xr], axis=-1)
    xi = jnp.concatenate([jnp.zeros(zshape, xi.dtype), xi], axis=-1)
    idx = jnp.asarray(base)[:, None] + jnp.arange(RS_TAPS_PER_PHASE)[None, :]
    coef = jnp.flip(bank[jnp.asarray(phase)], axis=-1)  # (n_out, taps)
    wr = xr[..., idx]                                # (..., n_out, taps)
    wi = xi[..., idx]
    yr = jnp.sum(wr * coef, axis=-1)
    yi = jnp.sum(wi * coef, axis=-1)
    return yr, yi


def resample(iq: np.ndarray, L: int, M: int) -> np.ndarray:
    """(C, T) complex at fs -> (C, ~T*L/M) complex at fs*L/M."""
    iq = np.atleast_2d(np.asarray(iq))
    xr = jnp.asarray(iq.real.astype(np.float32))
    xi = jnp.asarray(iq.imag.astype(np.float32))
    yr, yi = _resample_block(xr, xi, iq.shape[1], L, M)
    return np.asarray(yr) + 1j * np.asarray(yi)


def resample_50_to_36(iq: np.ndarray) -> np.ndarray:
    return resample(iq, 18, 25)


def resample_36_to_50(iq: np.ndarray) -> np.ndarray:
    return resample(iq, 25, 18)


@partial(jax.jit, static_argnames=("t_out", "L", "M"))
def _resample_stream_block(xr, xi, hr, hi, t_out: int, L: int = 18,
                           M: int = 25):
    """Streaming polyphase resampler block with carried history.

    xr/xi: (..., t_in) NEW input samples; hr/hi: (..., RS_TAPS_PER_PHASE-1)
    tail of the previous block's inputs.  Requires t_out*M == t_in*L (the
    polyphase pattern then repeats identically every block, so static
    indices give exact sample-stream continuity).  Returns (yr, yi, hr2,
    hi2) with hr2/hi2 the new history.
    """
    t_in = xr.shape[-1]
    assert t_out * M == t_in * L, (t_out, M, t_in, L)
    pad = RS_TAPS_PER_PHASE - 1
    n = np.arange(t_out)
    base = (n * M) // L + pad
    phase = (n * M) % L
    bank = jnp.asarray(_resamp_bank(L, M))
    coef = jnp.flip(bank[jnp.asarray(phase)], axis=-1)   # (t_out, taps)
    xr = jnp.concatenate([hr, xr], axis=-1)
    xi = jnp.concatenate([hi, xi], axis=-1)
    idx = jnp.asarray(base)[:, None] - pad + jnp.arange(RS_TAPS_PER_PHASE)
    yr = jnp.sum(xr[..., idx] * coef, axis=-1)
    yi = jnp.sum(xi[..., idx] * coef, axis=-1)
    return yr, yi, xr[..., -pad:], xi[..., -pad:]
