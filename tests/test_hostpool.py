"""MacPool (multiprocess host-MAC sharding) parity vs the in-process stack."""

import numpy as np
import pytest

from tetra_tpu.rx.burst_sync import BurstSync
from tetra_tpu.rx.hostpool import MacPool
from tetra_tpu.rx.lower_mac import LowerMac, process_bursts_multi
from tetra_tpu.rx.tdma import PhyState, TdmaTime
from tetra_tpu.tx import cell

START = TdmaTime(mn=1, fn=17, tn=4)


def _mk_streams(C, n_slots=150):
    rng = np.random.default_rng(5)
    streams, cfgs = [], []
    for c in range(C):
        cfg = cell.CellConfig(mcc=300 + c, mnc=40 + c, cc=1 + c)
        framegen = lambda: rng.integers(0, 2, (2, 137)).astype(np.uint8)
        bits, _ = cell.downlink_bits(
            cfg, n_slots, start=START.copy(), voice_slots={2: framegen},
            stolen_slots={(6, 2): "both", (9, 2): "first"},
            frag_message=((9, 3), np.concatenate(
                [np.array([0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0], np.uint8),
                 rng.integers(0, 2, 250).astype(np.uint8)])))
        streams.append(bits)
        cfgs.append(cfg)
    return np.stack(streams), cfgs


def test_pool_parity_with_inprocess():
    """Same bit streams through (a) in-process LowerMacs and (b) a 2-worker
    MacPool: identical display state, CRC counters, event kinds and TDMA
    times, and identical PhyState evolution in the parent."""
    C = 4
    bits, cfgs = _mk_streams(C)

    # (a) in-process
    phys_a = [PhyState() for _ in range(C)]
    syncs_a = [BurstSync(phy=p) for p in phys_a]
    macs_a = [LowerMac(phy=p) for p in phys_a]
    vtimes_a = [[] for _ in range(C)]
    for c in range(C):
        macs_a[c].voice_cb = (
            lambda t, x, c=c: vtimes_a[c].append((t.mn, t.fn, t.tn)))
    for i in range(0, bits.shape[1] - 4096, 4096):
        fm, fb = [], []
        for c in range(C):
            bs = syncs_a[c].feed(bits[c, i:i + 4096])
            if bs:
                fm.append(macs_a[c])
                fb.append(bs)
        if fm:
            process_bursts_multi(fm, fb)

    # (b) pooled (no voice pipelines: voice times aren't part of the reply,
    # but traffic handling still runs; audio parity is covered separately)
    phys_b = [PhyState() for _ in range(C)]
    syncs_b = [BurstSync(phy=p) for p in phys_b]
    pool = MacPool(C, workers=2)
    try:
        for i in range(0, bits.shape[1] - 4096, 4096):
            ids, ph, fb = [], [], []
            for c in range(C):
                bs = syncs_b[c].feed(bits[c, i:i + 4096])
                if bs:
                    ids.append(c)
                    ph.append(phys_b[c])
                    fb.append(bs)
            if ids:
                pool.process_bursts(ph, ids, fb)

        for c in range(C):
            da = macs_a[c].upper.display.as_dict()
            db = pool.views[c].display
            assert da == db, (c, da, db)
            assert macs_a[c].crc_oks == pool.views[c].crc_oks
            assert macs_a[c].crc_fails == pool.views[c].crc_fails
            ev_a = macs_a[c].upper.events
            ev_b = pool.views[c].events
            assert len(ev_a) == len(ev_b)
            for ea, eb in zip(ev_a, ev_b):
                assert ea[0] == eb[0]
                assert (ea[1].mn, ea[1].fn, ea[1].tn) == \
                       (eb[1].mn, eb[1].fn, eb[1].tn)
            # reassembled fragment payloads bit-exact through the pool
            ra = [e[2] for e in ev_a if e[0] == "tm_sdu_reassembled"]
            rb = [e[2] for e in ev_b if e[0] == "tm_sdu_reassembled"]
            assert len(ra) == len(rb) >= 1
            for xa, xb in zip(ra, rb):
                assert (xa == xb).all()
            # parent PhyState evolution matched the in-process run
            assert (phys_a[c].slot_count, str(phys_a[c].time)) == \
                   (phys_b[c].slot_count, str(phys_b[c].time))
            assert pool.views[c].display["mcc"] == cfgs[c].mcc
    finally:
        pool.close()


def test_pool_voice_audio_parity():
    """Worker-side voice pipelines produce the same PCM as in-process."""
    from tetra_tpu.voice.pipeline import VoicePipeline

    bits, _ = _mk_streams(1)
    # in-process voice
    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    vp = VoicePipeline()
    mac.voice_cb = vp
    for i in range(0, bits.shape[1] - 4096, 4096):
        bs = sync.feed(bits[0, i:i + 4096])
        if bs:
            mac.process_bursts(bs)
    pcm_a = vp.take_audio()

    phy_b = PhyState()
    sync_b = BurstSync(phy=phy_b)
    pool = MacPool(1, workers=1, voice=True)
    try:
        for i in range(0, bits.shape[1] - 4096, 4096):
            bs = sync_b.feed(bits[0, i:i + 4096])
            if bs:
                pool.process_bursts([phy_b], [0], [bs])
        pcm_b = pool.take_audio()
    finally:
        pool.close()
    assert pcm_a.shape == pcm_b.shape and len(pcm_a) > 0
    assert (pcm_a == pcm_b).all()
