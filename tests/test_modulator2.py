"""Clean-room modulator fixture tests (VERDICT r3 missing #2).

tx/modulator2 implements pi/4-DQPSK + RRC directly from the ETSI
EN 300 392-2 clause 9 equations with zero shared code with the golden TX
chain (frequency-sampled pulse, per-case phase table, superposition
assembly).  If the production receiver decodes its output cleanly, the
IQ->bits front half demonstrably implements the published air interface
rather than merely its own modulator's conventions -- the strongest
self-reference kill available without live captures.
"""

import numpy as np

from tetra_tpu.rx.receiver import TetraReceiver
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.tx import cell, modulator, modulator2

RNG = np.random.default_rng(4)


def test_pulse_matches_clause_9_spectrum():
    """The frequency-sampled pulse must realize the clause 9.4.3 sqrt-RC
    magnitude response: unity in the passband, 0 beyond (1+r)/2T, and the
    half-power point at exactly 1/2T."""
    sps = 2
    g = modulator2.sqrt_raised_cosine_pulse(sps, half_span_symbols=24,
                                            grid=8192)
    H = np.abs(np.fft.rfft(g, 16384))
    f = np.fft.rfftfreq(16384) * sps            # cycles/symbol
    H = H / H[0]
    assert np.allclose(H[f <= 0.30], 1.0, atol=5e-3)
    assert (H[f >= 0.70] < 2e-3).all()
    i_half = np.argmin(np.abs(f - 0.5))
    assert abs(H[i_half] - np.sqrt(0.5)) < 5e-3


def test_phase_mapping_agrees_with_production():
    """Two independent transcriptions of the clause 9.4.2 phase-transition
    table must produce identical symbol phases (cross-implementation
    agreement on the spec, not shared code)."""
    bits = RNG.integers(0, 2, 400).astype(np.uint8)
    syms_prod = np.asarray(modulator.bits_to_symbols(bits))
    phases2 = []
    phi = 0.0
    for k in range(len(bits) // 2):
        phi += modulator2._PHASE_TRANSITION[(int(bits[2 * k]),
                                             int(bits[2 * k + 1]))]
        phases2.append(phi)
    syms2 = np.exp(1j * np.asarray(phases2))
    assert np.abs(syms2 - syms_prod).max() < 1e-5


def test_production_receiver_decodes_cleanroom_modulator():
    """Feed a full downlink (SYNC + NDB slots) shaped by the clean-room
    modulator, impaired at 20 dB SNR + 300 Hz CFO + arbitrary phase,
    through the production receiver: it must lock, adopt the cell's
    scrambling from a SYNC it decoded itself, and run CRC-CLEAN in steady
    state (cold-start failures before the first decodable SYNC are the
    normal scrambling-acquisition transient, same as on the golden TX)."""
    bits, _ = cell.downlink_bits(cell.CellConfig(mcc=262, mnc=31, cc=4),
                                 170, start=TdmaTime(mn=2, fn=14, tn=1))
    iq = modulator2.modulate(bits)
    n = len(iq)
    cfo = 2 * np.pi * 300.0 / 36000.0
    iq = iq * np.exp(1j * (cfo * np.arange(n) + 1.23))
    sigma = np.sqrt(np.mean(np.abs(iq) ** 2)) * 10 ** (-20 / 20) / np.sqrt(2)
    iq = iq + sigma * (RNG.standard_normal(n) + 1j * RNG.standard_normal(n))
    rx = TetraReceiver(1)
    iq = iq[: (len(iq) // 512) * 512].astype(np.complex64)
    fails_after_first_ok = 0
    first_ok_seen = False
    prev = (0, 0)
    for i in range(0, len(iq), 512 * 16):
        rx.process(iq[None, i:i + 512 * 16])
        cur = rx.crc_counts(0)
        if first_ok_seen:
            fails_after_first_ok += cur[1] - prev[1]
        if cur[0] > 0:
            first_ok_seen = True
        prev = cur
    oks, fails = rx.crc_counts(0)
    d = rx.display(0)
    assert rx.locked(0)
    assert (d.mcc, d.mnc, d.cc) == (262, 31, 4)
    assert oks > 200, (oks, fails)
    # steady state (post scrambling acquisition) must be clean at 20 dB
    assert fails_after_first_ok <= 2, fails_after_first_ok
    assert float(rx.sym_quality[0]) < 0.15
