"""Demodulator chain unit tests: clean-channel bit exactness, CFO pull-in,
streaming state continuity, and multi-channel batching."""

import numpy as np
import jax
import jax.numpy as jnp

from tetra_tpu import params as P
from tetra_tpu.rx import demod as D
from tetra_tpu.tx.channel import channel
from tetra_tpu.tx.modulator import modulate

RNG = np.random.default_rng(0)


def _demod_stream(iq, block=1024):
    C = iq.shape[0]
    state = D.demod_init(C)
    dibs, vals = [], []
    for i in range(iq.shape[1] // block):
        state, outs = D.demod_block(state, jnp.asarray(iq[:, i*block:(i+1)*block]))
        dibs.append(np.asarray(outs["dibits"]))
        vals.append(np.asarray(outs["valid"]))
    return np.concatenate(dibs, 1), np.concatenate(vals, 1), state


def _ber_after_convergence(tx_bits, rx_bits, skip=1000, probe=400):
    pat = tx_bits[skip:skip + probe]
    errs = [np.mean(rx_bits[o:o + probe] != pat)
            for o in range(len(rx_bits) - probe)]
    off = int(np.argmin(errs))
    n = min(len(rx_bits) - off, len(tx_bits) - skip)
    return float(np.mean(rx_bits[off:off + n] != tx_bits[skip:skip + n]))


def test_clean_channel_zero_ber():
    bits = RNG.integers(0, 2, (1, 4000)).astype(np.uint8)
    iq = np.asarray(modulate(jnp.asarray(bits)))
    dib, val, _ = _demod_stream(iq)
    rx_bits = D.dibits_to_bits(dib[0][val[0]])
    assert _ber_after_convergence(bits[0], rx_bits) == 0.0


def test_cfo_and_noise():
    bits = RNG.integers(0, 2, (1, 60000)).astype(np.uint8)
    iq = modulate(jnp.asarray(bits))
    iq = np.asarray(channel(iq, jax.random.key(1), snr_db=20.0, cfo_hz=800.0,
                            sample_rate=P.SAMPLE_RATE))
    dib, val, state = _demod_stream(iq, block=4096)
    rx_bits = D.dibits_to_bits(dib[0][val[0]])
    # skip the FLL pull-in region, then demand near-zero BER
    ber = _ber_after_convergence(bits[0], rx_bits, skip=40000)
    assert ber < 1e-3, ber
    # FLL should have pulled most of the 800 Hz offset
    fhz = float(state.fll_freq[0]) * P.SAMPLE_RATE / (2 * np.pi)
    assert abs(fhz - 800.0) < 80.0, fhz


def test_block_size_invariance():
    """Streaming in different block sizes must yield the same symbol stream
    (state continuity across block boundaries)."""
    bits = RNG.integers(0, 2, (1, 8000)).astype(np.uint8)
    iq = np.asarray(modulate(jnp.asarray(bits)))
    dib_a, val_a, _ = _demod_stream(iq[:, :7168], block=1024)
    dib_b, val_b, _ = _demod_stream(iq[:, :7168], block=512)
    a = dib_a[0][val_a[0]]
    b = dib_b[0][val_b[0]]
    n = min(len(a), len(b))
    assert (a[:n] == b[:n]).all()


def test_multichannel_independent():
    """Channels in one batch demodulate independently and identically to a
    single-channel run."""
    bits = RNG.integers(0, 2, (3, 6000)).astype(np.uint8)
    iq = np.asarray(modulate(jnp.asarray(bits)))
    # give each channel a different gain and phase
    gains = np.array([0.5, 1.0, 2.0])[:, None]
    phases = np.exp(1j * np.array([0.3, -1.0, 2.2]))[:, None]
    iq3 = (iq * gains * phases).astype(np.complex64)
    dib, val, _ = _demod_stream(iq3, block=1024)
    solo_dib, solo_val, _ = _demod_stream(iq3[1:2], block=1024)
    assert (dib[1][val[1]] == solo_dib[0][solo_val[0]]).all()
    for c in range(3):
        rx_bits = D.dibits_to_bits(dib[c][val[c]])
        assert _ber_after_convergence(bits[c], rx_bits) == 0.0, c
