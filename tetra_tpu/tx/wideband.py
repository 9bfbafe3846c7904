"""Wideband multi-channel TX fixture: place TETRA channels on a 25 kHz raster.

Generates the BASELINE configs 3-5 inputs: an N-channel wideband capture at
fs = N x 25 kHz containing independent TETRA downlink signals, to be split by
the polyphase channelizer and demodulated batched.
"""

from __future__ import annotations

import numpy as np

from ..parallel.channelizer import resample


def synthesize_wideband(bitmat: np.ndarray, n_ch: int,
                        cfo_hz: np.ndarray | float = 0.0,
                        snr_db: float | None = None,
                        seed: int = 0) -> np.ndarray:
    """Bulk wideband fixture: one TETRA downlink per 25 kHz carrier, built
    entirely on the host via FFT placement (no device programs, no per-
    channel full-rate mixing -- assemble_wideband costs O(n_ch * T_wide)
    host work and device compiles, prohibitive at 256+ channels).

    bitmat: (n_ch, L) downlink bit streams (tx.cell.downlink_bits rows).
    Each stream is modulated at 36 kHz on the host, CFO-rotated, polyphase-
    resampled to 50 kHz, and placed in the wideband spectrum at its carrier
    (circular in time: bench fixtures process the interior).  Returns
    complex64 at n_ch * 25 kHz.
    """
    from scipy.signal import resample_poly
    from ..core.taps import root_raised_cosine
    from .. import params as P
    from .modulator import _DIBIT_PHASE

    rng = np.random.default_rng(seed)
    n_ch_sig, L = bitmat.shape
    assert n_ch_sig == n_ch
    cfo = np.broadcast_to(np.asarray(cfo_hz, np.float64), (n_ch,))
    h = np.asarray(root_raised_cosine(P.RRC_TAP_COUNT, P.RRC_ALPHA, 1.0, 2.0),
                   np.float32) * 2.0
    # common time base: T36 36-kHz samples -> T50 = T36*25/18 -> wideband
    T36 = (L // 2) * 2 - (len(h) - 1)
    T36 -= T36 % 36           # whole ms so T50 is integral
    T50 = T36 * 25 // 18
    n_wide = T50 * (n_ch // 2)              # fs = n_ch*25k; T50 at 50 kHz
    spec = np.zeros(n_wide, np.complex128)
    t36 = np.arange(T36) / P.SAMPLE_RATE
    for c in range(n_ch):
        bits = bitmat[c]
        dib = (bits[0::2] << 1) | bits[1::2]
        phase = np.cumsum(np.asarray(_DIBIT_PHASE)[dib])
        syms = np.exp(1j * phase).astype(np.complex64)
        up = np.zeros(2 * len(syms), np.complex64)
        up[::2] = syms
        x = np.convolve(up, h, mode="full")[:T36 + len(h) - 1][len(h) - 1:]
        x = x[:T36]
        if cfo[c]:
            x = x * np.exp(2j * np.pi * cfo[c] * t36)
        y = resample_poly(x, 25, 18)[:T50]
        Y = np.fft.fft(y, T50)
        # channel c sits at c*25 kHz: bin offset = c * (T50/2) in the
        # n_wide-point spectrum (25 kHz = T50/2 bins at df = fs/n_wide)
        k0 = c * (T50 // 2)
        idx = (k0 + np.concatenate([np.arange(0, T50 // 2),
                                    np.arange(-T50 // 2, 0)])) % n_wide
        spec[idx] += Y * (n_wide / T50)
    wide = np.fft.ifft(spec).astype(np.complex64)
    if snr_db is not None:
        # per-channel SNR in its 25 kHz slot: noise density set against the
        # mean per-channel signal power
        sig_p = np.mean(np.abs(wide) ** 2) / n_ch
        noise_p = sig_p * n_ch * 10 ** (-snr_db / 10)  # full-band noise
        nr = rng.standard_normal(n_wide).astype(np.float32)
        ni = rng.standard_normal(n_wide).astype(np.float32)
        wide = wide + np.sqrt(noise_p / 2) * (nr + 1j * ni)
    return wide.astype(np.complex64)


def assemble_wideband(channels: dict[int, np.ndarray], n_ch: int,
                      amplitude: float = 1.0) -> np.ndarray:
    """channels: {channel_index: complex IQ at 36 kHz}.  Returns wideband
    complex at n_ch*25 kHz with each signal centered at k*25 kHz."""
    fs = n_ch * 25_000
    # 36 kHz -> fs: L/M = fs/36000 reduced
    from math import gcd
    g = gcd(fs, 36_000)
    L, M = fs // g, 36_000 // g
    length = None
    up = {}
    for k, iq in channels.items():
        y = resample(np.asarray(iq)[None], L, M)[0]
        up[k] = y
        length = len(y) if length is None else min(length, len(y))
    t = np.arange(length) / fs
    wide = np.zeros(length, np.complex64)
    for k, y in up.items():
        f0 = k * 25_000.0
        if f0 > fs / 2:
            f0 -= fs
        wide += (y[:length] * np.exp(2j * np.pi * f0 * t) * amplitude
                 ).astype(np.complex64)
    return wide
