"""Production streaming topology soak (VERDICT r2 item 7): native ring
feed -> staged superblocks -> fleet engine -> voice, with a mid-stream
checkpoint/resume, proven end to end on CPU.

The pieces were each tested alone (runtime ring: test_runtime.py; staged
superblocks: test_fleet.py; voice: test_voice.py); this wires the whole
production streaming topology: an IqStream file playback (the SDR stand-in)
drains through overlapped superblock windows into
TetraReceiver.process_wideband_staged (wb_pipeline double buffering on),
the native fleet bit pipeline decodes, the voice callback synthesizes, a
checkpoint is taken mid-stream and restored into a SECOND receiver whose
subsequent decode must track the original exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from tetra_tpu.rx.fleet import load as fleet_load
from tetra_tpu.rx.receiver import TetraReceiver
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.runtime.iq_stream import IqStream
from tetra_tpu.tx import cell
from tetra_tpu.tx.wideband import synthesize_wideband

pytestmark = pytest.mark.skipif(fleet_load() is None,
                                reason="native fleet engine unavailable")

N, KW = 8, 2


def _build_stream(tmp_path, slots=220):
    rng = np.random.default_rng(33)
    framegen = lambda: rng.integers(0, 2, (2, 137)).astype(np.uint8)
    streams = []
    for i in range(2):
        bits, _ = cell.downlink_bits(
            cell.CellConfig(mcc=262, mnc=100 + i, cc=1 + i), slots,
            start=TdmaTime(mn=2, fn=14, tn=1),
            voice_slots={2: framegen} if i == 0 else None)
        streams.append(bits)
    L = min(len(s) for s in streams)
    bitmat = np.stack([streams[c % 2][:L] for c in range(N)])
    wide = synthesize_wideband(bitmat, N, cfo_hz=120.0, snr_db=25.0, seed=3)
    f = tmp_path / "soak.cf32"
    np.asarray(wide, np.complex64).tofile(f)
    return str(f), len(wide)


class _StagedFeeder:
    """Drains an IqStream into exact process_wideband_staged superblocks:
    window j of superblock s covers wide samples
    [(s*KW + j)*advance, ... + wide_len) -- the framing contract of
    TetraReceiver.process_wideband_staged."""

    def __init__(self, stream: IqStream, wide_len: int, advance: int,
                 kw: int):
        self.stream, self.wide_len, self.advance, self.kw = (
            stream, wide_len, advance, kw)
        self.buf = np.zeros(0, np.complex64)
        self.need = (kw - 1) * advance + wide_len

    def next_superblock(self):
        while len(self.buf) < self.need:
            blk = self.stream.read(1 << 16, timeout_ms=500)
            if len(blk) == 0:
                return None
            self.buf = np.concatenate([self.buf, blk])
        wins = [self.buf[j * self.advance:j * self.advance + self.wide_len]
                for j in range(self.kw)]
        self.buf = self.buf[self.kw * self.advance:]
        wr = jnp.asarray(np.stack([w.real for w in wins]).astype(np.float32))
        wi = jnp.asarray(np.stack([w.imag for w in wins]).astype(np.float32))
        return wr, wi


def test_streaming_soak_ring_staged_fleet_voice_checkpoint(tmp_path):
    path, total = _build_stream(tmp_path)
    audio = []

    class VoiceSink:
        half = None

        def __call__(self, t, type4):
            audio.append((str(t), np.asarray(type4).copy()))

    rx1 = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=KW,
                        wb_pipeline=True, voice_cb=VoiceSink())
    wb = rx1._wb
    stream = IqStream(capacity=1 << 22)
    stream.feed_file(path)
    feeder = _StagedFeeder(stream, wb["wide_len"], wb["advance"], KW)

    supers = []
    while True:
        sb = feeder.next_superblock()
        if sb is None:
            break
        supers.append(sb)
    assert stream.overruns == 0 and stream.eof
    stream.stop()
    assert len(supers) >= 8, len(supers)

    mid = len(supers) // 2
    for sb in supers[:mid]:
        rx1.process_wideband_staged(*sb)
    rx1.flush_wideband()
    assert any(rx1.locked(c) for c in range(N))

    # mid-stream checkpoint -> restore into a FRESH receiver (no voice to
    # keep dispatch identical; voice presence does not affect decode state)
    ckpt = tmp_path / "soak.npz"
    rx1.save_state(str(ckpt))
    rx2 = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=KW,
                        wb_pipeline=True)
    rx2.load_state(str(ckpt))
    for c in range(N):
        assert rx2.locked(c) == rx1.locked(c), c
        assert rx2.crc_counts(c) == rx1.crc_counts(c), c

    losses_before = [rx1.fleet.lock_losses(c) for c in range(N)]
    for sb in supers[mid:]:
        rx1.process_wideband_staged(*sb)
        rx2.process_wideband_staged(*sb)
    rx1.flush_wideband()
    rx2.flush_wideband()

    for c in range(N):
        assert rx1.locked(c) and rx2.locked(c), c
        assert rx2.crc_counts(c) == rx1.crc_counts(c), c
        assert rx2.display(c).as_dict() == rx1.display(c).as_dict(), c
        # soak invariant: zero lock losses across the steady-state run
        assert rx1.fleet.lock_losses(c) == losses_before[c], c
        oks, fails = rx1.crc_counts(c)
        assert oks > 50 and oks > 10 * max(fails, 1), (c, oks, fails)
    # voice flowed through the deferred-action path
    assert len(audio) > 20
    # bounded memory: the feeder drained everything; the wideband buffer
    # holds less than one superblock of residue
    assert len(feeder.buf) < feeder.need
