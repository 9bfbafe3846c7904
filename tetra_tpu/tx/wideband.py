"""Wideband multi-channel TX fixture: place TETRA channels on a 25 kHz raster.

Generates the BASELINE configs 3-5 inputs: an N-channel wideband capture at
fs = N x 25 kHz containing independent TETRA downlink signals, to be split by
the polyphase channelizer and demodulated batched.
"""

from __future__ import annotations

import numpy as np

from ..parallel.channelizer import resample


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
