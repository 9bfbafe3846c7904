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

TAPS_PER_BRANCH = 16


@lru_cache(maxsize=8)
def _prototype(n_ch: int, taps_per_branch: int = TAPS_PER_BRANCH) -> np.ndarray:
    """Lowpass prototype for the filterbank: Nuttall-windowed sinc, cutoff
    at half the channel spacing, unity branch gain."""
    L = n_ch * taps_per_branch
    n = np.arange(L)
    c = (L - 1) / 2.0
    cutoff = 0.5 / n_ch  # cycles/sample at the wideband rate
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

RS_TAPS_PER_PHASE = 8


@lru_cache(maxsize=8)
def _resamp_bank(L: int, M: int) -> np.ndarray:
    """Polyphase bank for rational L/M resampling (upsample L, filter,
    downsample M).  Anti-alias cutoff at min(in, out) Nyquist in the
    L-upsampled domain; unity passband gain."""
    total = L * RS_TAPS_PER_PHASE
    n = np.arange(total)
    c = (total - 1) / 2.0
    cutoff = 0.5 / max(L, M)  # cycles/sample in the upsampled domain
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
