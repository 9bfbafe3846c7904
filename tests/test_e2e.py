"""End-to-end slice tests: TX cell stream -> (modem ->) sync -> MAC decode.

This is SURVEY.md section 7's "minimum end-to-end slice": SYNC/BSCH path plus
BNCH SYSINFO, AACH and NDB payloads, validated first at the bit level (golden
TX bits straight into burst sync) and then through the full modem with
channel impairments at the BASELINE operating point (>= 20 dB SNR, CFO).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tetra_tpu import params as P
from tetra_tpu.rx.burst_sync import BurstSync, RX_LOCKED
from tetra_tpu.rx.lower_mac import LowerMac
from tetra_tpu.rx.receiver import TetraReceiver
from tetra_tpu.tx import cell
from tetra_tpu.rx.tdma import PhyState, TdmaTime
from tetra_tpu.tx.channel import channel
from tetra_tpu.tx.modulator import modulate

CFG = cell.CellConfig()
# start just before frame 18 so the first SYNC burst (acquisition) comes
# quickly and a second one (decoded) follows one multiframe later
START = TdmaTime(mn=1, fn=17, tn=4)


def run_bit_level(n_slots=170):
    """170 slots = SYNC bursts at slots 1 (acquisition), 73, 145."""
    bits, records = cell.downlink_bits(CFG, n_slots, start=START.copy())
    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    fails_at_80 = None
    # feed in chunks like the streaming receiver would
    for i in range(0, len(bits), 510 * 4):
        bursts = sync.feed(bits[i:i + 510 * 4])
        mac.process_bursts(bursts)
        if fails_at_80 is None and i // 510 >= 80:
            fails_at_80 = mac.crc_fails  # cold-start fails before 2nd SYNC
    return sync, mac, records, fails_at_80


def test_bit_level_lock_and_sync_pdu():
    sync, mac, records, fails_at_80 = run_bit_level()
    assert sync.state == RX_LOCKED
    assert sync.lock_losses == 0
    d = mac.upper.display
    assert d.mcc == CFG.mcc
    assert d.mnc == CFG.mnc
    assert d.cc == CFG.cc
    # SYNC PDU sets cell data + scrambling code
    assert mac.cell.scramb_init == P.scramb_get_init(CFG.mcc, CFG.mnc, CFG.cc)
    # before the first decoded SYNC PDU the cell scrambling code is unknown,
    # so cold-start blocks fail CRC (the reference behaves identically); once
    # acquired at slot 73 every subsequent block must decode cleanly
    assert mac.crc_fails == fails_at_80
    assert mac.crc_oks >= 3 * 85  # slots 74..169 decode fine


def test_bit_level_sysinfo_and_aach():
    _, mac, _, _ = run_bit_level()
    d = mac.upper.display
    sid = mac.upper.last_sysinfo
    assert sid is not None
    assert sid.main_carrier == CFG.main_carrier
    assert sid.freq_band == CFG.freq_band
    assert sid.hyperframe_number == CFG.hyperframe
    assert sid.la == CFG.la
    assert sid.bs_service_details == CFG.bs_service_details
    assert d.curr_hyperframe == CFG.hyperframe
    assert d.dl_freq == CFG.freq_band * 100_000_000 + CFG.main_carrier * 25_000
    # AACH usage markers from the cell fixture (dl=2 common control, ul=0)
    assert d.dl_usage == 2 and d.ul_usage == 0
    # service flags from 0b111001110111 (bit0 advanced_link ... bit11 reg)
    assert d.voice_service and d.normal_mode and d.advanced_link
    assert d.circuit_data and d.reg_mandatory
    assert not d.migration_supported and not d.never_minimum_mode


def test_bit_level_aach_survives_3bit_bbk_errors():
    """Every BBK (AACH) field takes 3 bit errors and the MAC stack must be
    indistinguishable from the clean run: the ML RM(30,14) decode corrects
    up to 3 errors (d_min = 8), where the reference consumes the AACH
    unverified ("FIXME: RM3014-decode", tetra_lower_mac.c:231) and a
    parity-only gate would drop every corrupted block."""
    n_slots = 170
    bits, records = cell.downlink_bits(CFG, n_slots, start=START.copy())
    corrupted = bits.copy()
    for s, rec in enumerate(records):
        b = s * P.BITS_PER_TS
        if rec.kind == "sync":
            for off in (3, 11, 27):
                corrupted[b + P.SB_BBK_OFFSET + off] ^= 1
        else:
            for off in (P.NDB_BBK1_OFFSET + 2, P.NDB_BBK1_OFFSET + 9,
                        P.NDB_BBK2_OFFSET + 5):
                corrupted[b + off] ^= 1

    def run(stream):
        phy = PhyState()
        sync = BurstSync(phy=phy)
        mac = LowerMac(phy=phy)
        for i in range(0, len(stream), 510 * 4):
            mac.process_bursts(sync.feed(stream[i:i + 510 * 4]))
        return sync, mac

    s_clean, m_clean = run(bits)
    s_bad, m_bad = run(corrupted)
    assert s_bad.state == RX_LOCKED and s_bad.lock_losses == 0
    # block accounting identical to the clean run: every corrupted AACH was
    # repaired and accepted, nothing else was disturbed
    assert (m_bad.crc_oks, m_bad.crc_fails) == (m_clean.crc_oks,
                                                m_clean.crc_fails)
    d = m_bad.upper.display
    assert d.dl_usage == 2 and d.ul_usage == 0


def test_bit_level_tdma_time_tracking():
    sync, mac, records, _ = run_bit_level()
    # once the SYNC PDU has re-synchronized the shared PHY time, the burst
    # times must track the TX slot times exactly
    d = mac.upper.display
    assert d.curr_frame == records[-1].time.fn
    assert d.curr_multiframe == records[-1].time.mn


@pytest.mark.parametrize("snr_db,cfo_hz", [(30.0, 0.0), (20.0, 500.0)])
def test_full_modem_e2e(snr_db, cfo_hz):
    """Full chain: bits -> pi/4-DQPSK -> channel -> demod -> sync -> MAC."""
    # SYNC bursts at slots ~1, 72, 146, 218; at 20 dB with 500 Hz CFO the
    # FLL pull-in (~2 s) consumes the first two for acquisition
    n_slots = 220
    bits, records = cell.downlink_bits(CFG, n_slots, start=START.copy())
    iq = modulate(jnp.asarray(bits[None, :]))
    iq = channel(iq, jax.random.key(42), snr_db=snr_db, cfo_hz=cfo_hz,
                 sample_rate=P.SAMPLE_RATE)
    iq = np.asarray(iq)

    rx = TetraReceiver(1)
    T = 4096
    for i in range(iq.shape[1] // T):
        rx.process(iq[:, i * T:(i + 1) * T])
    d = rx.display()
    assert rx.locked()
    assert d.mcc == CFG.mcc and d.mnc == CFG.mnc and d.cc == CFG.cc
    assert rx.quality_ok()
    sid = rx.mac[0].upper.last_sysinfo
    assert sid is not None and sid.main_carrier == CFG.main_carrier
    # after scrambling acquisition most blocks pass CRC; cold-start blocks
    # (pre-SYNC-PDU) legitimately fail, so gate on the post-acquisition share
    assert rx.mac[0].crc_oks >= 3 * 40


def test_voice_e2e_bit_level():
    """Traffic slots: TX voice frames -> burst -> sync -> MAC -> speech
    channel decode -> ACELP synthesis -> audio samples."""
    from tetra_tpu.rx.tdma import PhyState
    from tetra_tpu.voice.pipeline import VoicePipeline

    rng = np.random.default_rng(33)
    sent_frames = []

    def framegen():
        f = rng.integers(0, 2, (2, 137)).astype(np.uint8)
        sent_frames.append(f)
        return f

    bits, records = cell.downlink_bits(
        CFG, 170, start=START.copy(), voice_slots={2: framegen})
    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    vp = VoicePipeline()
    decoded_frames = []

    def voice_cb(time, type4):
        from tetra_tpu.voice import channel as vch2
        frames, bfi = vch2.decode_slot(type4[None])
        decoded_frames.append((time.copy(), frames[0], bool(bfi[0])))
        vp(time, type4)

    mac.voice_cb = voice_cb
    for i in range(0, len(bits), 510 * 4):
        mac.process_bursts(sync.feed(bits[i:i + 510 * 4]))

    # voice only decodes after scrambling acquisition (2nd SYNC at slot 73)
    assert len(decoded_frames) > 10
    good = [f for _, f, bfi in decoded_frames if not bfi]
    assert len(good) >= len(decoded_frames) - 2
    # decoded frames must match what was sent (find them in the sent list)
    sent = {f.tobytes() for f in sent_frames}
    matched = sum(1 for f in good if f.astype(np.uint8).tobytes() in sent)
    assert matched == len(good), (matched, len(good))
    # audio came out
    audio = vp.take_audio()
    assert len(audio) == 480 * vp.slots_decoded
    assert vp.slots_decoded >= len(good) - 1


def test_speech_over_air_pitch_preserved():
    """Real encoded speech through the whole air interface: vowel ->
    AcelpEncoder -> cell TX -> burst sync -> MAC -> channel decode ->
    AcelpDecoder; the reconstructed audio keeps the source pitch."""
    from scipy.signal import lfilter
    from tetra_tpu.rx.tdma import PhyState
    from tetra_tpu.voice.acelp import AcelpEncoder
    from tetra_tpu.voice.pipeline import VoicePipeline

    fs = 8000
    t = np.arange(fs * 2) / fs
    phase = 2 * np.pi * np.cumsum(110 * (1 + 0.02 * np.sin(
        2 * np.pi * 2.5 * t))) / fs
    x = sum(np.cos(h * phase) / h for h in range(1, 30))
    for fc, bw in ((700, 110), (1200, 140), (2600, 250)):
        r = np.exp(-np.pi * bw / fs)
        th = 2 * np.pi * fc / fs
        x = lfilter([1.0], [1, -2 * r * np.cos(th), r * r], x)
    pcm = (x / np.abs(x).max() * 12000).astype(np.int16)

    enc = AcelpEncoder()
    slot_idx = [0]

    def framegen():
        s = slot_idx[0] % (len(pcm) // 480)
        slot_idx[0] += 1
        return enc.encode_slot(pcm[s * 480:(s + 1) * 480])

    bits, _ = cell.downlink_bits(
        CFG, 170, start=START.copy(), voice_slots={2: framegen})
    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    vp = VoicePipeline()
    mac.voice_cb = vp
    for i in range(0, len(bits), 510 * 4):
        mac.process_bursts(sync.feed(bits[i:i + 510 * 4]))
    audio = vp.take_audio().astype(float)
    assert vp.slots_decoded > 10 and vp.bad_frames == 0
    seg = audio[len(audio) // 2:] - audio[len(audio) // 2:].mean()
    ac = np.correlate(seg, seg, "full")[len(seg) - 1:]
    peak = np.argmax(ac[40:120]) + 40
    assert 70 <= peak <= 76, peak       # 8000/110 = 72.7 samples


def test_llc_mle_layer_decodes_sdus():
    """The (reference-disabled) LLC + MLE layer: TM-SDUs parse down to the
    CMCE PDU name carried by the fixture."""
    _, mac, records, _ = run_bit_level()
    llc_events = [e for e in mac.upper.events if e[0] == "llc"]
    assert len(llc_events) > 50
    for _, _, llc, tl in llc_events:
        assert llc.name == "BL-UDATA"
        assert tl is not None
        assert tl.pdisc_name == "CMCE"
        assert tl.pdu_name == "D-SDS DATA"


def test_signal_dropout_and_relock():
    """Sync-loss recovery (SURVEY.md section 5 'failure detection'): the
    receiver must drop lock during a signal gap and re-acquire afterwards."""
    bits1, _ = cell.downlink_bits(CFG, 170, start=START.copy())
    # resume the TX one multiframe later so times keep advancing
    bits2, recs2 = cell.downlink_bits(CFG, 170, start=TdmaTime(mn=9, fn=17, tn=4))
    iq1 = np.asarray(modulate(jnp.asarray(bits1[None, :])))
    iq2 = np.asarray(modulate(jnp.asarray(bits2[None, :])))
    gap = np.zeros((1, 36000), np.complex64)  # 1 s of dead air
    iq = np.concatenate([iq1, gap, iq2], axis=1)
    iq = np.asarray(channel(jnp.asarray(iq), jax.random.key(8), snr_db=25.0,
                            cfo_hz=100.0, sample_rate=P.SAMPLE_RATE))
    rx = TetraReceiver(1)
    T = 4096
    for i in range(iq.shape[1] // T):
        rx.process(iq[:, i * T:(i + 1) * T])
    assert rx.locked()
    assert rx.sync[0].lock_losses >= 1          # the gap broke the lock
    d = rx.display()
    assert (d.mcc, d.mnc, d.cc) == (CFG.mcc, CFG.mnc, CFG.cc)
    # time tracking resumed on the post-gap stream
    assert d.curr_multiframe >= 9


def test_stolen_slot_stch_bit_level():
    """Clause 19.4.4 slot stealing: a traffic slot transmitted with training
    sequence 2 carries STCH signalling in both half blocks.  The receiver
    must flag block-1 stealing (tetra_lower_mac.c:197-200), parse the length
    indicator 0x3E announcing the stolen second half, and decode both STCH
    PDUs down through LLC/CMCE -- while normal voice slots keep decoding."""
    from tetra_tpu.rx.tdma import PhyState

    rng = np.random.default_rng(44)
    framegen = lambda: rng.integers(0, 2, (2, 137)).astype(np.uint8)
    stolen = {(5, 2), (9, 2)}
    bits, records = cell.downlink_bits(
        CFG, 170, start=START.copy(), voice_slots={2: framegen},
        stolen_slots=stolen)
    assert any(r.kind == "stch" for r in records)

    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    voice_times = []
    mac.voice_cb = lambda time, type4: voice_times.append(time.copy())
    stolen_flags = []
    orig_resrc = mac.upper._rx_resrc

    def spy_resrc(bits_, time):
        n = orig_resrc(bits_, time)
        stolen_flags.append((mac.upper.blk1_stolen, mac.upper.blk2_stolen))
        return n

    mac.upper._rx_resrc = spy_resrc
    for i in range(0, len(bits), 510 * 4):
        mac.process_bursts(sync.feed(bits[i:i + 510 * 4]))

    ev = mac.upper.events
    stch_rsd = [e[2] for e in ev if e[0] == "resource"
                and e[2].addr.ssi == 0x654321]
    # both STCH halves of at least one stolen slot parsed
    assert len(stch_rsd) >= 2
    from tetra_tpu.rx import mac_pdu as mp
    assert any(r.macpdu_length == mp.MACPDU_LEN_2ND_STOLEN for r in stch_rsd)
    # block-1 stealing was flagged before the STCH PDU parsed, and the
    # 0x3E length indicator latched blk2_stolen
    assert (True, True) in stolen_flags
    # the LLC/CMCE payloads of the stolen halves decode by name
    names = [e[3].pdu_name for e in ev if e[0] == "llc" and len(e) > 3
             and getattr(e[3], "pdu_name", None)]
    assert "D-ALERT" in names and "D-CONNECT ACK" in names
    # no voice frame was synthesized for stolen slots; other traffic slots
    # still produced voice
    stolen_voice = [t for t in voice_times if (t.fn, t.tn) in stolen]
    assert not stolen_voice
    assert len(voice_times) > 10


def test_multi_channel_cross_batched_fec_different_cells():
    """Channels tuned to DIFFERENT cells decode in one cross-channel batched
    FEC pass: each channel adopts its own SYNC PDU scrambling code and the
    per-row keystream path keeps every cell's blocks decoding cleanly."""
    from tetra_tpu.rx.lower_mac import process_bursts_multi
    from tetra_tpu.rx.tdma import PhyState

    cfgs = [cell.CellConfig(mcc=262, mnc=1234, cc=7),
            cell.CellConfig(mcc=901, mnc=77, cc=21),
            cell.CellConfig(mcc=310, mnc=9999, cc=63)]
    feeds = [cell.downlink_bits(c, 170, start=START.copy())[0] for c in cfgs]
    phys = [PhyState() for _ in cfgs]
    syncs = [BurstSync(phy=p) for p in phys]
    macs = [LowerMac(phy=p) for p in phys]
    for i in range(0, len(feeds[0]), 510 * 4):
        batch_macs, batch_bursts = [], []
        for c in range(len(cfgs)):
            bursts = syncs[c].feed(feeds[c][i:i + 510 * 4])
            if bursts:
                batch_macs.append(macs[c])
                batch_bursts.append(bursts)
        if batch_macs:
            process_bursts_multi(batch_macs, batch_bursts)
    for c, cfg in enumerate(cfgs):
        d = macs[c].upper.display
        assert (d.mcc, d.mnc, d.cc) == (cfg.mcc, cfg.mnc, cfg.cc), c
        assert macs[c].cell.scramb_init == P.scramb_get_init(
            cfg.mcc, cfg.mnc, cfg.cc)
        # post-acquisition blocks decode cleanly for every cell
        assert macs[c].crc_oks >= 3 * 85, c


def test_cell_handover_scrambling_change():
    """Soak element: the serving cell changes mid-stream (new MCC/MNC/CC =
    new scrambling code).  The receiver must keep slot lock (continuous
    bits), decode the new cell's SYNC PDU under predefined SB1 scrambling,
    adopt the new scrambling code, and decode the new cell's payloads."""
    from tetra_tpu.rx.tdma import PhyState

    cfg_a = cell.CellConfig(mcc=262, mnc=1234, cc=7)
    cfg_b = cell.CellConfig(mcc=505, mnc=88, cc=33)
    bits_a, _ = cell.downlink_bits(cfg_a, 170, start=START.copy())
    # cell B continues the TDMA timeline (same slot grid, new identity)
    bits_b, _ = cell.downlink_bits(cfg_b, 170,
                                   start=TdmaTime(mn=4, fn=5, tn=1))
    bits = np.concatenate([bits_a, bits_b])
    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    crc_at_switch = None
    for i in range(0, len(bits), 510 * 4):
        mac.process_bursts(sync.feed(bits[i:i + 510 * 4]))
        if crc_at_switch is None and i >= 170 * 510:
            crc_at_switch = mac.crc_oks
    assert sync.state == RX_LOCKED
    assert sync.lock_losses == 0           # lock survives the handover
    d = mac.upper.display
    # new cell adopted
    assert (d.mcc, d.mnc, d.cc) == (cfg_b.mcc, cfg_b.mnc, cfg_b.cc)
    assert mac.cell.scramb_init == P.scramb_get_init(
        cfg_b.mcc, cfg_b.mnc, cfg_b.cc)
    # cell B's payloads decode after its first SYNC PDU
    assert mac.crc_oks >= crc_at_switch + 150


def test_fragment_reassembly_e2e():
    """Fragmented TM-SDU across slots: START (fills half block) + MAC-FRAG
    + MAC-END on the next frame's same timeslot reassemble into one SDU
    that parses through LLC/CMCE (21.4.3.1-3; fragslots keyed per
    timeslot, aged on fn 18)."""
    from tetra_tpu.rx.tdma import PhyState

    rng = np.random.default_rng(55)
    # message: LLC BL-UDATA -> CMCE D-SDS DATA + payload, 280 bits total
    msg = np.concatenate([
        np.array([0,0,1,0], np.uint8),          # LLC BL-UDATA
        np.array([0,1,0], np.uint8),            # MLE pdisc CMCE
        np.array([0,1,1,1,1], np.uint8),        # CMCE D-SDS DATA (0x0F)
        rng.integers(0, 2, 268).astype(np.uint8)])
    bits, records = cell.downlink_bits(
        CFG, 170, start=START.copy(), frag_message=((5, 3), msg))
    kinds = [r.kind for r in records]
    assert "frag_start" in kinds and "frag_end" in kinds
    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    for i in range(0, len(bits), 510 * 4):
        mac.process_bursts(sync.feed(bits[i:i + 510 * 4]))
    reass = [e for e in mac.upper.events if e[0] == "tm_sdu_reassembled"]
    assert len(reass) >= 1
    got = reass[-1][2]
    # reassembled SDU = message (+ zero padding from the octet-aligned END)
    assert len(got) >= len(msg)
    assert (got[:len(msg)] == msg).all()
    assert not got[len(msg):].any()
    # and it parsed through LLC down to the CMCE PDU name
    names = [e[3].pdu_name for e in mac.upper.events
             if e[0] == "llc" and e[3] is not None]
    assert "D-SDS DATA" in names


def test_checkpoint_resume_continuity(tmp_path):
    """Receiver checkpoint/resume (+ over the reference, which has none):
    saving mid-stream and resuming in a FRESH receiver continues decoding
    without re-acquisition -- total decoded blocks match an uninterrupted
    run exactly."""
    bits, _ = cell.downlink_bits(CFG, 220, start=START.copy())
    iq = np.asarray(modulate(jnp.asarray(bits[None, :])))

    # uninterrupted run
    rx_ref = TetraReceiver(1)
    T = 4096
    n_blocks = iq.shape[1] // T
    for i in range(n_blocks):
        rx_ref.process(iq[:, i * T:(i + 1) * T])

    # checkpointed run: save at the midpoint, resume in a new receiver
    rx1 = TetraReceiver(1)
    half = n_blocks // 2
    for i in range(half):
        rx1.process(iq[:, i * T:(i + 1) * T])
    ckpt = str(tmp_path / "rx_state.npz")
    rx1.save_state(ckpt)
    rx2 = TetraReceiver(1)
    rx2.load_state(ckpt)
    for i in range(half, n_blocks):
        rx2.process(iq[:, i * T:(i + 1) * T])

    assert rx2.locked()
    d = rx2.display()
    assert (d.mcc, d.mnc, d.cc) == (CFG.mcc, CFG.mnc, CFG.cc)
    assert rx2.sync[0].lock_losses == rx_ref.sync[0].lock_losses == 0
    # no re-acquisition penalty: identical decode totals
    assert rx2.mac[0].crc_oks == rx_ref.mac[0].crc_oks
    assert rx2.mac[0].crc_fails == rx_ref.mac[0].crc_fails


def test_soak_all_features_mixed_stream():
    """Integration soak: one continuous stream exercising voice traffic,
    slot stealing, a fragmented SDU, a cell handover (scrambling change)
    and a signal dropout with re-acquisition -- decoded through the full
    modem at 25 dB SNR with CFO."""
    from tetra_tpu.rx.tdma import PhyState
    from tetra_tpu.voice.pipeline import VoicePipeline

    rng = np.random.default_rng(77)
    framegen = lambda: rng.integers(0, 2, (2, 137)).astype(np.uint8)
    msg = np.concatenate([
        np.array([0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0], np.uint8),
        rng.integers(0, 2, 260).astype(np.uint8)])  # BL-UDATA MM pdu
    cfg_a = cell.CellConfig(mcc=262, mnc=1234, cc=7)
    cfg_b = cell.CellConfig(mcc=901, mnc=42, cc=11)
    bits_a, _ = cell.downlink_bits(
        cfg_a, 240, start=START.copy(), voice_slots={2: framegen},
        stolen_slots={(6, 2)}, frag_message=((9, 3), msg))
    bits_b, _ = cell.downlink_bits(
        cfg_b, 170, start=TdmaTime(mn=9, fn=17, tn=4))
    iq_a = np.asarray(modulate(jnp.asarray(bits_a[None, :])))
    iq_b = np.asarray(modulate(jnp.asarray(bits_b[None, :])))
    gap = np.zeros((1, 18000), np.complex64)  # 0.5 s dead air = handover
    iq = np.concatenate([iq_a, gap, iq_b], axis=1)
    iq = np.asarray(channel(jnp.asarray(iq), jax.random.key(5), snr_db=25.0,
                            cfo_hz=-250.0, sample_rate=P.SAMPLE_RATE))

    voice_slots_seen = []
    vp = VoicePipeline()

    def voice_cb(time, type4):
        voice_slots_seen.append(time.copy())
        vp(time, type4)

    rx = TetraReceiver(1, voice_cb=voice_cb)
    T = 4096
    for i in range(iq.shape[1] // T):
        rx.process(iq[:, i * T:(i + 1) * T])

    ev = rx.mac[0].upper.events
    # 1. voice decoded on the traffic timeslot
    assert len(voice_slots_seen) > 10
    assert vp.slots_decoded > 10
    # 2. stolen slot STCH parsed
    stch = [e for e in ev if e[0] == "resource" and e[2].addr.ssi == 0x654321]
    assert len(stch) >= 2
    # 3. fragment reassembled bit-exact
    reass = [e for e in ev if e[0] == "tm_sdu_reassembled"]
    assert any((r[2][:len(msg)] == msg).all() for r in reass)
    # 4. dropout detected and lock re-acquired on the new cell
    assert rx.sync[0].lock_losses >= 1
    assert rx.locked()
    d = rx.display()
    assert (d.mcc, d.mnc, d.cc) == (cfg_b.mcc, cfg_b.mnc, cfg_b.cc)


def test_half_stolen_slot_recovers_speech():
    """First-half-only stealing: STCH in blk1 (no 0x3E marker), speech frame
    2 surviving in blk2.  The reference drops voice in stolen slots
    (tetra_lower_mac.c routes both halves to signalling); here the surviving
    half-slot must decode bit-exact and keep the 480-sample audio clock."""
    from tetra_tpu.rx.tdma import PhyState
    from tetra_tpu.voice.pipeline import VoicePipeline

    rng = np.random.default_rng(47)
    sent_frames = []

    def framegen():
        f = rng.integers(0, 2, (2, 137)).astype(np.uint8)
        sent_frames.append(f)
        return f

    stolen = {(5, 2): "first", (9, 2): "first"}
    bits, records = cell.downlink_bits(
        CFG, 170, start=START.copy(), voice_slots={2: framegen},
        stolen_slots=stolen)
    # the stolen (fn, tn) recurs every multiframe over the 170-slot run
    half_recs = [r for r in records if r.kind == "stch" and "frames" in r.type1]
    assert len(half_recs) >= 2

    phy = PhyState()
    sync = BurstSync(phy=phy)
    mac = LowerMac(phy=phy)
    vp = VoicePipeline()
    recovered_halves = []
    orig_half = vp.half

    def spy_half(time, type4):
        recovered_halves.append((time.copy(), np.asarray(type4)))
        orig_half(time, type4)

    vp.half = spy_half
    mac.voice_cb = vp
    for i in range(0, len(bits), 510 * 4):
        mac.process_bursts(sync.feed(bits[i:i + 510 * 4]))

    # STCH first halves parsed as signalling (no second-half-stolen marker)
    from tetra_tpu.rx import mac_pdu as mp
    stch_rsd = [e[2] for e in mac.upper.events if e[0] == "resource"
                and e[2].addr.ssi == 0x654321]
    assert len(stch_rsd) >= 2
    assert all(r.macpdu_length != mp.MACPDU_LEN_2ND_STOLEN for r in stch_rsd)

    # surviving speech halves routed to the voice path and decoded bit-exact
    # (stolen slots transmitted before the first BSCH arrive before the
    # receiver can know the cell scrambling code and are unrecoverable by
    # protocol -- match recovered halves to TX ground truth by TDMA time)
    by_time = {(r.time.mn, r.time.fn, r.time.tn): r for r in half_recs}
    assert len(recovered_halves) >= 2
    from tetra_tpu.voice import channel as vch
    for t, type4 in recovered_halves:
        rec = by_time[(t.mn, t.fn, t.tn)]
        dec, bfi = vch.decode_half_slot(type4[None])
        assert not bfi[0]
        assert (dec[0] == rec.type1["frames"][1]).all()

    # audio clock: every decoded slot contributed 480 samples
    audio = vp.take_audio()
    assert len(audio) % 480 == 0 and vp.slots_decoded > 2


def test_device_acquire_scan_matches_host_path():
    """Batched device SYNC acquisition (ops/train_corr via
    device_acquire_scan) must reproduce the host scan's lock behavior
    exactly: same bursts, same state trajectory, across chunked feeds with
    a noisy prefix and a mid-stream dropout."""
    from tetra_tpu.rx.burst_sync import BurstSync, device_acquire_scan

    rng = np.random.default_rng(11)
    bits, _ = cell.downlink_bits(CFG, 60, start=START.copy())
    bits2, _ = cell.downlink_bits(CFG, 40, start=START.copy())
    stream = np.concatenate([
        rng.integers(0, 2, 2977).astype(np.uint8),   # noise prefix
        bits,
        rng.integers(0, 2, 4000).astype(np.uint8),   # dropout garbage
        bits2])

    host, dev = BurstSync(), BurstSync()
    bursts_h, bursts_d = [], []
    for i in range(0, len(stream), 2048):
        chunk = stream[i:i + 2048]
        bursts_h += host.feed(chunk.copy())
        if dev.state == 0:  # RX_UNLOCKED: stage the device scan result
            device_acquire_scan([dev], [chunk], pad_channels=4)
        bursts_d += dev.feed(chunk.copy())

    assert host.state == dev.state
    assert host.bitbuf_start_bitnum == dev.bitbuf_start_bitnum
    assert len(bursts_h) == len(bursts_d) and len(bursts_h) > 50
    for bh, bd in zip(bursts_h, bursts_d):
        assert bh.train_seq == bd.train_seq
        assert (bh.bits == bd.bits).all()


def test_receiver_device_acquire_end_to_end():
    """TetraReceiver with device_acquire=True locks and decodes the cell
    through the RF chain just like the host-acquisition path."""
    # 240 slots: the FLL pull-in (~0.8 s) eats the first BSCH; the next
    # two arrive at slots ~77 and ~149
    bits, _ = cell.downlink_bits(CFG, 240, start=START.copy())
    iq = np.asarray(channel(modulate(jnp.asarray(bits[None, :])),
                            jax.random.key(2), snr_db=28.0, cfo_hz=150.0,
                            sample_rate=P.SAMPLE_RATE))
    rx = TetraReceiver(1, device_acquire=True)
    T = 4096
    for i in range(iq.shape[1] // T):
        rx.process(iq[:, i * T:(i + 1) * T])
    assert rx.locked()
    d = rx.display()
    assert (d.mcc, d.mnc, d.cc) == (CFG.mcc, CFG.mnc, CFG.cc)
