"""BASELINE config 2: CFO + SNR sweep stressing loop convergence.

Burst-bit-level acceptance across the operating region: at >= 20 dB the
decoded MAC blocks must be clean after acquisition; at lower SNR the FEC
stack must degrade gracefully (CRC gates failures rather than emitting
garbage)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetra_tpu import params as P
from tetra_tpu.rx.receiver import TetraReceiver
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.tx import cell
from tetra_tpu.tx.channel import channel
from tetra_tpu.tx.modulator import modulate

CFG = cell.CellConfig()
START = TdmaTime(mn=1, fn=17, tn=4)


def _run(snr_db, cfo_hz, n_slots=240, mode="fast"):
    bits, records = cell.downlink_bits(CFG, n_slots, start=START.copy())
    iq = modulate(jnp.asarray(bits[None, :]))
    iq = np.asarray(channel(iq, jax.random.key(int(snr_db * 10)),
                            snr_db=snr_db, cfo_hz=cfo_hz,
                            sample_rate=P.SAMPLE_RATE))
    rx = TetraReceiver(1, mode=mode)
    T = 4096
    for i in range(iq.shape[1] // T):
        rx.process(iq[:, i * T:(i + 1) * T])
    return rx


@pytest.mark.parametrize("snr_db,cfo_hz,mode", [
    (30.0, 0.0, "fast"),
    (25.0, -400.0, "fast"),
    (20.0, 900.0, "fast"),
    (20.0, 900.0, "exact"),
])
def test_operating_region_clean(snr_db, cfo_hz, mode):
    rx = _run(snr_db, cfo_hz, mode=mode)
    assert rx.locked()
    d = rx.display()
    assert (d.mcc, d.mnc, d.cc) == (CFG.mcc, CFG.mnc, CFG.cc)
    assert rx.quality_ok()
    # post-acquisition blocks decode cleanly (acquisition may consume up to
    # two SYNC periods while the FLL pulls in the CFO)
    assert rx.mac[0].crc_oks >= 60


def test_low_snr_graceful():
    """At 8 dB the chain may not decode, but must not emit false intel:
    either no lock, or CRC gates the bad blocks (no bogus network info)."""
    rx = _run(8.0, 0.0, n_slots=100)
    d = rx.display()
    ok = rx.mac[0].crc_oks
    # whatever decoded must be the true cell (CRC protects against aliasing)
    if d.mcc != 0:
        assert (d.mcc, d.mnc) == (CFG.mcc, CFG.mnc)
    assert rx.mac[0].crc_fails >= 0  # counters coherent
    total = ok + rx.mac[0].crc_fails
    assert total == 0 or ok <= total
