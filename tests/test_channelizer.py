"""Channelizer + resampler + wideband multichannel end-to-end tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetra_tpu import params as P
from tetra_tpu.parallel import channelizer as CH
from tetra_tpu.rx.receiver import TetraReceiver
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.tx import cell
from tetra_tpu.tx.modulator import modulate
from tetra_tpu.tx.wideband import assemble_wideband

RNG = np.random.default_rng(44)


def test_channel_tone_mapping():
    N = 16
    fs = N * 25000.0
    t = np.arange(32768) / fs
    for k, df in ((3, 4000.0), (9, -6000.0)):
        f0 = k * 25000.0 + df
        if f0 > fs / 2:
            f0 -= fs
        wide = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
        ch = CH.channelize(wide, N)
        p = np.mean(np.abs(ch) ** 2, axis=1)
        assert int(np.argmax(p)) == k
        # adjacent leakage well suppressed
        assert 10 * np.log10(sorted(p)[-2] / p[k]) < -40
        z = ch[k][300:3000]
        fmeas = np.angle(np.mean(z[1:] * np.conj(z[:-1]))) * 50000 / (2 * np.pi)
        assert abs(fmeas - df) < 20


def test_resampler_phase_exact():
    z = np.exp(2j * np.pi * 5000 * np.arange(20000) / 50000).astype(np.complex64)
    y = CH.resample_50_to_36(z[None])[0]
    d = np.diff(np.unwrap(np.angle(y[200:800])))
    assert abs(d.mean() - 2 * np.pi * 5000 / 36000) < 1e-4
    assert d.std() < 1e-3


def test_wideband_16ch_multicell_decode():
    """BASELINE config 3: wideband capture -> channelizer -> batched demod ->
    per-channel cell decode."""
    N = 16
    start = TdmaTime(mn=1, fn=17, tn=4)
    cells = {
        2: cell.CellConfig(mcc=244, mnc=100, cc=1),
        7: cell.CellConfig(mcc=262, mnc=200, cc=2),
        12: cell.CellConfig(mcc=208, mnc=300, cc=3),
    }
    chans = {}
    for k, cfg in cells.items():
        bits, _ = cell.downlink_bits(cfg, 170, start=start.copy())
        chans[k] = np.asarray(modulate(jnp.asarray(bits[None, :])))[0]
    wide = assemble_wideband(chans, N, amplitude=0.5)
    # channelize + resample all N channels, feed the batched receiver
    ch50 = CH.channelize(wide, N)
    ch36 = CH.resample_50_to_36(ch50)
    rx = TetraReceiver(len(cells))
    occupied = sorted(cells)
    iq = np.stack([ch36[k] for k in occupied])
    T = 4096
    for i in range(iq.shape[1] // T):
        rx.process(iq[:, i * T:(i + 1) * T])
    for c, k in enumerate(occupied):
        d = rx.display(c)
        assert rx.locked(c), (c, k)
        assert d.mcc == cells[k].mcc, (c, k, d.mcc)
        assert d.mnc == cells[k].mnc
        assert d.cc == cells[k].cc
