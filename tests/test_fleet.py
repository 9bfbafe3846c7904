"""Native fleet engine parity: the C++ per-channel bit pipeline
(rx/native/fleet.cpp via rx/fleet.FleetEngine) must be EXACTLY equivalent to
the Python pipeline (BurstSync + LowerMac + native macparse dispatch) in the
production no-event/no-crypto configuration -- lock states, TDMA time,
display state, CRC tallies, scrambling adoption, and voice callbacks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tetra_tpu import params as P
from tetra_tpu.rx.receiver import TetraReceiver
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.tx import cell
from tetra_tpu.tx.channel import channel
from tetra_tpu.tx.modulator import modulate

pytestmark = pytest.mark.skipif(
    __import__("tetra_tpu.rx.fleet", fromlist=["load"]).load() is None,
    reason="native fleet engine unavailable")

START = TdmaTime(mn=1, fn=17, tn=4)


def _assert_parity(rx_f: TetraReceiver, rx_p: TetraReceiver):
    C = rx_p.channels
    for c in range(C):
        sync, mac = rx_p.sync[c], rx_p.mac[c]
        ch = rx_f.fleet.chan(c)
        assert ch.state == sync.state, (c, ch.state, sync.state)
        assert ch.lock_losses == sync.lock_losses, c
        assert ch.start_bitnum == sync.bitbuf_start_bitnum, c
        assert ch.buf_len == len(sync.bitbuf), c
        assert bytes(ch.buf[:ch.buf_len]) == sync.bitbuf.tobytes(), c
        t, tp = ch.time, sync.phy.time
        assert (t.hn, t.mn, t.fn, t.tn, t.sn) == (
            tp.hn, tp.mn, tp.fn, tp.tn, tp.sn), c
        assert ch.slot_count == sync.phy.slot_count, c
        assert rx_f.fleet.crc_counts(c) == (mac.crc_oks, mac.crc_fails), c
        assert int(rx_f.fleet.scramb[c]) == mac.cell.scramb_init, c
        assert (ch.cell_mcc, ch.cell_mnc, ch.cell_cc) == (
            mac.cell.mcc, mac.cell.mnc, mac.cell.colour_code), c
        assert rx_f.display(c).as_dict() == rx_p.display(c).as_dict(), c
        # MAC flag state
        up = mac.upper
        m = ch.mac
        assert (m.is_traffic, bool(m.blk1_stolen), bool(m.blk2_stolen)) == (
            up.is_traffic, up.blk1_stolen, up.blk2_stolen), c
        assert (m.ssi, m.addr_type, m.usage_marker) == (
            up.ssi, up.addr_type, up.usage_marker), c


def _run_pair(iq: np.ndarray, block: int = 4096, voice: bool = False):
    C = iq.shape[0]
    voice_f, voice_p = [], []
    vcb_f = (lambda t, b: voice_f.append((str(t), b.tobytes()))) if voice \
        else None
    vcb_p = (lambda t, b: voice_p.append((str(t), b.tobytes()))) if voice \
        else None
    rx_f = TetraReceiver(C, fleet=True, voice_cb=vcb_f)
    rx_p = TetraReceiver(C, events=False, voice_cb=vcb_p,
                         device_acquire=False)
    for i in range(iq.shape[1] // block):
        blk = iq[:, i * block:(i + 1) * block]
        rx_f.process(blk)
        rx_p.process(blk)
    _assert_parity(rx_f, rx_p)
    assert voice_f == voice_p
    return rx_f, rx_p, voice_f


def test_fleet_parity_basic_multicell():
    """Three channels, three different cells (distinct scrambling codes),
    CFO + noise: every piece of per-channel state must match the Python
    pipeline bit for bit."""
    cfgs = [cell.CellConfig(mcc=262, mnc=1234, cc=7),
            cell.CellConfig(mcc=901, mnc=42, cc=11),
            cell.CellConfig(mcc=310, mnc=9999, cc=63)]
    streams = []
    for i, cfg in enumerate(cfgs):
        bits, _ = cell.downlink_bits(cfg, 150, start=START.copy())
        streams.append(np.asarray(modulate(jnp.asarray(bits[None, :])))[0])
    L = min(len(s) for s in streams)
    iq = np.stack([s[:L] for s in streams])
    iq = np.asarray(channel(jnp.asarray(iq), jax.random.key(3), snr_db=22.0,
                            cfo_hz=180.0, sample_rate=P.SAMPLE_RATE))
    rx_f, rx_p, _ = _run_pair(iq)
    for c, cfg in enumerate(cfgs):
        assert rx_f.locked(c)
        d = rx_f.display(c)
        assert (d.mcc, d.mnc, d.cc) == (cfg.mcc, cfg.mnc, cfg.cc)
        oks, fails = rx_f.crc_counts(c)
        assert oks > 100


def test_fleet_parity_dropout_handover_voice_stealing():
    """The soak configuration: voice traffic, slot stealing, a dropout with
    re-acquisition onto a DIFFERENT cell (scrambling change mid-stream) --
    the hard paths of the sync machine and the dispatch restamp logic."""
    rng = np.random.default_rng(19)
    framegen = lambda: rng.integers(0, 2, (2, 137)).astype(np.uint8)
    cfg_a = cell.CellConfig(mcc=262, mnc=1234, cc=7)
    cfg_b = cell.CellConfig(mcc=901, mnc=42, cc=11)
    bits_a, _ = cell.downlink_bits(cfg_a, 170, start=START.copy(),
                                   voice_slots={2: framegen},
                                   stolen_slots={(6, 2)})
    bits_b, _ = cell.downlink_bits(cfg_b, 120,
                                   start=TdmaTime(mn=9, fn=17, tn=4))
    iq_a = np.asarray(modulate(jnp.asarray(bits_a[None, :])))
    iq_b = np.asarray(modulate(jnp.asarray(bits_b[None, :])))
    gap = np.zeros((1, 18000), np.complex64)
    iq = np.concatenate([iq_a, gap, iq_b], axis=1)
    iq = np.asarray(channel(jnp.asarray(iq), jax.random.key(5), snr_db=25.0,
                            cfo_hz=-250.0, sample_rate=P.SAMPLE_RATE))
    rx_f, rx_p, voice_seen = _run_pair(iq, voice=True)
    assert rx_f.fleet.lock_losses(0) >= 1
    assert rx_f.locked(0)
    d = rx_f.display(0)
    assert (d.mcc, d.mnc, d.cc) == (cfg_b.mcc, cfg_b.mnc, cfg_b.cc)
    assert len(voice_seen) > 10


def test_fleet_parity_low_snr_fuzz():
    """8 channels at marginal SNR with independent CFOs: CRC failures,
    trainseq misses, unlock/relock churn -- the state machines must still
    track each other exactly."""
    cfg = cell.CellConfig(mcc=262, mnc=1234, cc=7)
    bits, _ = cell.downlink_bits(cfg, 130, start=START.copy())
    one = np.asarray(modulate(jnp.asarray(bits[None, :])))[0]
    C = 8
    iq = np.stack([one] * C)
    key = jax.random.key(11)
    cfos = np.linspace(-400.0, 400.0, C)
    rows = []
    for c in range(C):
        key, k = jax.random.split(key)
        rows.append(np.asarray(channel(jnp.asarray(iq[c][None]), k,
                                       snr_db=7.5 + 0.5 * c, cfo_hz=cfos[c],
                                       sample_rate=P.SAMPLE_RATE))[0])
    iq = np.stack(rows)
    rx_f, rx_p, _ = _run_pair(iq)
    # at least the high-SNR channels decode
    assert any(rx_f.locked(c) for c in range(C))


def test_decode_rows_mixed_equals_decode_blocks_mixed():
    """The array-form FEC entry point (full-432 keystream rows) must be
    bit-exact vs the list-form decode_blocks_mixed."""
    from tetra_tpu.rx import fec as rx_fec
    from tetra_tpu.tx import fec_enc
    rng = np.random.default_rng(4)
    scr = P.scramb_get_init(262, 1234, 7)
    rows, t5m, types, scrs = [], [], [], []
    for bt, t345 in ((P.TPSAP_T_SB1, 120), (P.TPSAP_T_BBK, 30),
                     (P.TPSAP_T_SB2, 216), (P.TPSAP_T_NDB, 216),
                     (P.TPSAP_T_SCH_F, 432)) * 3:
        bits = rng.integers(0, 2, t345).astype(np.uint8)
        rows.append((bt, bits, scr))
        pad = np.zeros(432, np.uint8)
        pad[:t345] = bits
        t5m.append(pad)
        types.append(bt)
        scrs.append(scr)
    want = rx_fec.decode_blocks_mixed(rows)
    got_t1, got_ok = rx_fec.decode_rows_mixed(
        np.stack(t5m), np.asarray(types), np.asarray(scrs))
    for j, (w_t1, w_ok) in enumerate(want):
        assert bool(got_ok[j]) == w_ok, j
        assert (got_t1[j, :len(w_t1)] == w_t1).all(), j


def test_demod_valid_is_per_chunk_prefix():
    """The pack_cycle_tc layout replaces per-symbol valid flags with
    per-chunk counts, which is lossless ONLY if validity within each demod
    chunk is a prefix.  Both chains guarantee it by construction (XLA:
    valid = ipos < T with nondecreasing ipos; Pallas: additionally ANDed
    with a per-chunk constant); assert it on live demod output, including
    the lock transient."""
    from tetra_tpu.rx import demod_fast

    cfg = cell.CellConfig(mcc=262, mnc=55, cc=2)
    bits, _ = cell.downlink_bits(cfg, 40, start=START)
    iq = np.asarray(modulate(jnp.asarray(bits[None, :])))
    iq = np.asarray(channel(jnp.asarray(iq), jax.random.key(2), snr_db=18.0,
                            cfo_hz=300.0, sample_rate=P.SAMPLE_RATE))
    state = demod_fast.demod_init(1)
    T = 2048
    for i in range(iq.shape[1] // T):
        state, outs = demod_fast.demod_block(state, iq[:, i * T:(i + 1) * T])
        v = np.asarray(outs["valid"]).reshape(1, -1, demod_fast.K_SYM)
        counts = v.sum(axis=2)
        want = np.arange(demod_fast.K_SYM)[None, None, :] < counts[:, :, None]
        assert (v == want).all(), i


def test_native_rm_syndrome_matches_device_ml():
    """The fleet engine's local BBK decode (syndrome-table RM(30,14) in
    C++) must equal the device ML decode (rx/fec.rm3014_decode) bit for
    bit at every error weight: identical info bits and accept/reject for
    0..3 errors, identical rejection at 4+ (bounded-distance = ML inside
    the unique radius, d_min = 8)."""
    from tetra_tpu.rx import fec as rx_fec
    from tetra_tpu.rx.fleet import FleetEngine
    from tetra_tpu.tx import fec_enc

    eng = FleetEngine(1)
    rng = np.random.default_rng(5)
    scr = P.scramb_get_init(262, 99, 9)
    ks = fec_enc.scramb_keystream(scr, 30)
    rows, clean = [], []
    for trial in range(64):
        info = rng.integers(0, 2, 14).astype(np.uint8)
        cw = np.concatenate([info, (info @ P.RM3014_PARITY) % 2])
        nerr = trial % 6
        bad = cw.copy()
        for pos in rng.choice(30, nerr, replace=False):
            bad[pos] ^= 1
        clean.append(bad.copy())
        scrambled = bad ^ ks
        pad = np.zeros(432, np.uint8)
        pad[:30] = scrambled
        rows.append(np.packbits(pad))
    t5p = np.ascontiguousarray(np.stack(rows))
    scrambs = np.full(len(rows), scr, np.int64)
    out64 = np.empty(len(rows), np.int64)
    eng.lib.fleet_rm_redecode(eng.h, t5p.ctypes.data, scrambs.ctypes.data,
                              len(rows), out64.ctypes.data)
    info_ml, ok_ml = rx_fec.rm3014_decode(jnp.asarray(np.stack(clean)))
    info_ml, ok_ml = np.asarray(info_ml), np.asarray(ok_ml)
    for r in range(len(rows)):
        ok_n = bool((out64[r] >> 14) & 1)
        assert ok_n == bool(ok_ml[r]), r
        if ok_n:
            info_n = np.array([(out64[r] >> (13 - k)) & 1
                               for k in range(14)], np.uint8)
            assert (info_n == info_ml[r]).all(), r
    assert sum((out64 >> 14) & 1) > 0 and (((out64 >> 14) & 1) == 0).any()


def test_decode_rows_split_packed_matches_mixed():
    """The split per-kind FEC programs (CCH Viterbi+CRC, BBK RM3014) must
    be bit-exact vs the single mixed program -- including when the batch
    overflows a bucket and chunks over repeated calls."""
    from tetra_tpu.rx import fec as rx_fec

    rng = np.random.default_rng(9)
    scr = P.scramb_get_init(262, 1234, 7)
    ks_host = np.zeros((16, 432), np.uint8)
    ks_host[0] = rx_fec.keystream(P.SCRAMB_INIT, 432)
    ks_host[1] = rx_fec.keystream(scr, 432)
    ks_dev = jnp.asarray(ks_host)
    t5m, types, idx = [], [], []
    for bt, t345 in ((P.TPSAP_T_SB1, 120), (P.TPSAP_T_BBK, 30),
                     (P.TPSAP_T_SB2, 216), (P.TPSAP_T_NDB, 216),
                     (P.TPSAP_T_SCH_F, 432)) * 5:
        bits = rng.integers(0, 2, t345).astype(np.uint8)
        pad = np.zeros(432, np.uint8)
        pad[:t345] = bits
        t5m.append(np.packbits(pad))
        types.append(bt)
        idx.append(0 if bt == P.TPSAP_T_SB1 else 1)
    t5p = np.stack(t5m)
    types = np.asarray(types)
    idx = np.asarray(idx, np.int32)
    want_t1, want_ok = rx_fec.decode_rows_mixed_packed(
        t5p, types, idx, ks_dev)
    for cchb, bbkb in ((0, 0), (8, 4)):     # dynamic + forced chunking
        got_t1, got_ok = rx_fec.decode_rows_split_packed(
            t5p, types, idx, ks_dev, cch_bucket=cchb, bbk_bucket=bbkb)
        assert (got_ok == want_ok).all(), (cchb, bbkb)
        assert (got_t1 == want_t1).all(), (cchb, bbkb)


def test_superblock_wideband_matches_per_cycle():
    """wb_k>1 (K cycles per device dispatch) must equal the per-cycle path
    in steady state: same locks, same display state, and CRC tallies equal
    up to the cold-start batching effect (a bigger batch re-decodes a
    channel's pre-SB1 rows under the adopted scrambling, exactly as feeding
    the per-cycle path bigger chunks would)."""
    from tetra_tpu.tx.wideband import synthesize_wideband

    N = 8
    streams = []
    for i in range(2):
        bits, _ = cell.downlink_bits(
            cell.CellConfig(mcc=262, mnc=100 + i, cc=1 + i), 120,
            start=TdmaTime(mn=2, fn=14, tn=1))
        streams.append(bits)
    L = min(len(s) for s in streams)
    bitmat = np.stack([streams[c % 2][:L] for c in range(N)])
    wide = synthesize_wideband(bitmat, N, cfo_hz=120.0, snr_db=25.0, seed=3)

    def run(wb_k):
        rx = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=wb_k)
        # trim to a whole number of 4-cycle superblocks so every wb_k
        # processes the same span (a K-superblock holds the last < K
        # cycles until more data arrives -- stream latency, not loss)
        adv, wl = rx._wb["advance"], rx._wb["wide_len"]
        M = ((len(wide) - (wl - adv)) // adv) // 4 * 4
        data = wide[:(M - 1) * adv + wl]
        CH = 120000
        for i in range(0, len(data), CH):
            rx.process_wideband(data[i:i + CH])
        return rx

    base = run(1)
    for k in (2, 4):
        rx = run(k)
        for c in range(N):
            assert rx.locked(c) == base.locked(c), (k, c)
            assert rx.display(c).as_dict() == base.display(c).as_dict(), (
                k, c)
            ok_b, fail_b = base.crc_counts(c)
            ok_k, fail_k = rx.crc_counts(c)
            # cold-start batching can only ADD successes (earlier rows
            # decoded under the adopted scrambling)
            assert ok_k >= ok_b and fail_k <= fail_b, (k, c)
            assert (ok_k - ok_b) + (fail_b - fail_k) <= 40, (k, c)


def test_fleet_feed_giant_call_segmentation():
    """One fleet_feed call larger than the per-channel bit ring
    (FLEET_BUFCAP = 1<<16 bits) must equal feeding the same bytes in small
    chunks: the C++ entry slices internally (a worst-case giant superblock
    used to overrun the ring; segfault regression test)."""
    from tetra_tpu.rx.fleet import FleetEngine

    C = 2
    bits, _ = cell.downlink_bits(cell.CellConfig(mcc=262, mnc=101, cc=3),
                                 180, start=START)
    dib = ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)
    T = 40_000                       # symbols; 80k bits > FLEET_BUFCAP
    assert len(dib) >= T, len(dib)
    packed = np.broadcast_to(0x80 | dib[:T], (C, T)).copy()

    f_one = FleetEngine(C)
    f_chunk = FleetEngine(C)
    f_one.process_packed(packed)
    for i in range(0, T, 2048):
        f_chunk.process_packed(packed[:, i:i + 2048])

    for c in range(C):
        a, b = f_one.chan(c), f_chunk.chan(c)
        assert a.state == b.state == 2, c
        assert (a.start_bitnum, a.buf_len) == (b.start_bitnum, b.buf_len), c
        assert bytes(a.buf[:a.buf_len]) == bytes(b.buf[:b.buf_len]), c
        assert f_one.crc_counts(c) == f_chunk.crc_counts(c), c
        assert f_one.crc_counts(c)[0] > 0, c
        assert f_one.display(c).as_dict() == f_chunk.display(c).as_dict(), c


def _pack2_host(dibm, valid, K, n_chunks):
    """Host-side reference packer for the pack_cycle_tc layout: dibm/valid
    (C, K*T) with T = n_chunks*32 and PREFIX-per-chunk valid patterns ->
    (K*(2*n_chunks + ceil(n_chunks/4)), C) int32 words."""
    C, total = dibm.shape
    T = n_chunks * 32
    assert total == K * T
    cnt_words = -(-n_chunks // 4)
    rows = []
    for j in range(K):
        d = dibm[:, j * T:(j + 1) * T].T.astype(np.int64)      # (T, C)
        v = valid[:, j * T:(j + 1) * T].T.astype(np.int64)
        sym = (d & 3).reshape(T // 16, 16, C)
        rows.append((sym << (2 * np.arange(16))[None, :, None]).sum(1))
        counts = v.reshape(n_chunks, 32, C).sum(1)             # (nc, C)
        pad = cnt_words * 4 - n_chunks
        if pad:
            counts = np.concatenate(
                [counts, np.zeros((pad, C), np.int64)])
        wc = counts.reshape(cnt_words, 4, C)
        rows.append((wc << (8 * np.arange(4))[None, :, None]).sum(1))
    return np.concatenate(rows).astype(np.int32)


def test_packed2_feed_matches_byte_feed():
    """The time-major 2-bit+counts entry (fleet_feed_sb, the superblock
    device layout) must be exactly equivalent to K channel-major byte
    feeds of the same dibit/valid stream -- including invalid slots
    (always a per-chunk prefix, as the demod emits them) and ring/backlog
    behavior."""
    from tetra_tpu.rx.fleet import FleetEngine

    C, K, n_chunks = 3, 4, 75
    T = n_chunks * 32                      # 2400
    rng = np.random.default_rng(21)
    bits, _ = cell.downlink_bits(cell.CellConfig(mcc=262, mnc=77, cc=5),
                                 140, start=START)
    dib = ((bits[0::2] << 1) | bits[1::2]).astype(np.uint8)
    need = K * T
    assert len(dib) >= need + 64
    dibm = np.stack([dib[c * 17:c * 17 + need] for c in range(C)])
    # prefix-per-chunk validity: mostly full chunks, some short/empty
    counts = np.where(rng.random((C, K * n_chunks)) < 0.9, 32,
                      rng.integers(0, 33, (C, K * n_chunks)))
    valid = (np.arange(32)[None, None, :]
             < counts[:, :, None]).reshape(C, need)
    packed = ((dibm & 3) | (valid.astype(np.uint8) << 7))

    # identical warmup on both engines (byte path) so scrambling is
    # adopted before the compared span: in steady state the batched
    # decode+dispatch of packed2 is exactly K per-cycle dispatches
    f_byte, f_tc = FleetEngine(C), FleetEngine(C)
    warm = packed[:, :2 * T]
    for f in (f_byte, f_tc):
        f.process_packed(warm[:, :T])
        f.process_packed(warm[:, T:])
    rest_p = packed[:, 2 * T:]
    Kr = K - 2
    for j in range(Kr):
        f_byte.process_packed(rest_p[:, j * T:(j + 1) * T])

    words = _pack2_host(dibm[:, 2 * T:], valid[:, 2 * T:], Kr, n_chunks)
    f_tc.process_packed2(words, Kr, n_chunks)

    for c in range(C):
        a, b = f_byte.chan(c), f_tc.chan(c)
        assert a.state == b.state, c
        assert (a.start_bitnum, a.buf_len) == (b.start_bitnum, b.buf_len), c
        assert bytes(a.buf[:a.buf_len]) == bytes(b.buf[:b.buf_len]), c
        assert f_byte.crc_counts(c) == f_tc.crc_counts(c), c
        assert f_byte.display(c).as_dict() == f_tc.display(c).as_dict(), c
        t, u = a.time, b.time
        assert (t.hn, t.mn, t.fn, t.tn, t.sn) == (
            u.hn, u.mn, u.fn, u.tn, u.sn), c
    assert sum(f_byte.crc_counts(c)[0] for c in range(C)) > 0


def test_pipelined_superblock_matches_sync_after_flush():
    """wb_pipeline=True defers each superblock's host consumption by one
    dispatch (device compute overlaps the bit->MAC stack); after
    flush_wideband() every observable (lock, CRC tallies, display dict)
    must equal the synchronous superblock path exactly."""
    from tetra_tpu.tx.wideband import synthesize_wideband

    N = 8
    streams = []
    for i in range(2):
        bits, _ = cell.downlink_bits(
            cell.CellConfig(mcc=262, mnc=100 + i, cc=1 + i), 120,
            start=TdmaTime(mn=2, fn=14, tn=1))
        streams.append(bits)
    L = min(len(s) for s in streams)
    bitmat = np.stack([streams[c % 2][:L] for c in range(N)])
    wide = synthesize_wideband(bitmat, N, cfo_hz=120.0, snr_db=25.0, seed=3)

    def run(pipelined):
        rx = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=2,
                           wb_pipeline=pipelined)
        adv, wl = rx._wb["advance"], rx._wb["wide_len"]
        M = ((len(wide) - (wl - adv)) // adv) // 2 * 2
        data = wide[:(M - 1) * adv + wl]
        CH = 120000
        for i in range(0, len(data), CH):
            rx.process_wideband(data[i:i + CH])
        rx.flush_wideband()
        return rx

    base, piped = run(False), run(True)
    for c in range(N):
        assert piped.locked(c) == base.locked(c), c
        assert piped.crc_counts(c) == base.crc_counts(c), c
        assert piped.display(c).as_dict() == base.display(c).as_dict(), c


def test_decode_rows_mixed_packed_chunking_matches_unchunked():
    """min_bucket smaller than the batch must CHUNK over the same program
    with identical results (the overflow path production relies on to
    never recompile)."""
    from tetra_tpu.rx import fec as rx_fec

    rng = np.random.default_rng(13)
    ks_host = np.zeros((16, 432), np.uint8)
    ks_host[0] = rx_fec.keystream(P.SCRAMB_INIT, 432)
    ks_dev = jnp.asarray(ks_host)
    N = 21
    t5p = rng.integers(0, 256, (N, 54)).astype(np.uint8)
    types = rng.integers(0, 4, N).astype(np.int64)
    idx = np.zeros(N, np.int32)
    a_t1, a_ok = rx_fec.decode_rows_mixed_packed(t5p, types, idx, ks_dev)
    b_t1, b_ok = rx_fec.decode_rows_mixed_packed(t5p, types, idx, ks_dev,
                                                 min_bucket=8)
    assert (a_ok == b_ok).all() and (a_t1 == b_t1).all()


def test_decode_rows_typed_packed_matches_mixed():
    """The round-4 per-length FEC programs (SB1/NDB 144-step trellis with
    17-byte result rows, SCH-F full width, BBK RM3014) must be bit-exact
    vs the single mixed program on every row's type-1 bits and ok flag --
    including forced chunking over undersized buckets.  Short rows'
    17-byte form must reproduce the mixed rows' 16-byte HEAD exactly
    (consumers only read each type's t1 bits)."""
    from tetra_tpu.rx import fec as rx_fec

    rng = np.random.default_rng(10)
    scr = P.scramb_get_init(262, 4321, 3)
    ks_host = np.zeros((16, 432), np.uint8)
    ks_host[0] = rx_fec.keystream(P.SCRAMB_INIT, 432)
    ks_host[1] = rx_fec.keystream(scr, 432)
    ks_dev = jnp.asarray(ks_host)
    t5m, types, idx = [], [], []
    for bt, t345 in ((P.TPSAP_T_SB1, 120), (P.TPSAP_T_BBK, 30),
                     (P.TPSAP_T_SB2, 216), (P.TPSAP_T_NDB, 216),
                     (P.TPSAP_T_SCH_F, 432)) * 6:
        bits = rng.integers(0, 2, t345).astype(np.uint8)
        pad = np.zeros(432, np.uint8)
        pad[:t345] = bits
        t5m.append(np.packbits(pad))
        types.append(bt)
        idx.append(0 if bt == P.TPSAP_T_SB1 else 1)
    t5p = np.stack(t5m)
    types = np.asarray(types)
    idx = np.asarray(idx, np.int32)
    want_t1, want_ok = rx_fec.decode_rows_mixed_packed(
        t5p, types, idx, ks_dev)
    # per-type meaningful byte spans (ceil(t1/8)): SB1 60 -> 8, BBK 14 -> 2,
    # NDB/SB2 124 -> 16, SCH-F 268 -> 34
    nbytes = {P.TPSAP_T_SB1: 8, P.TPSAP_T_BBK: 2, P.TPSAP_T_SB2: 16,
              P.TPSAP_T_NDB: 16, P.TPSAP_T_SCH_F: 34}
    for sb, fb, bb in ((0, 0, 0), (8, 4, 4)):   # defaults + forced chunking
        got_t1, got_ok = rx_fec.decode_rows_typed_packed(
            t5p, types, idx, ks_dev, short_bucket=sb, schf_bucket=fb,
            bbk_bucket=bb)
        assert (got_ok == want_ok).all(), (sb, fb, bb)
        for r in range(len(types)):
            nb = nbytes[int(types[r])]
            assert (got_t1[r, :nb] == want_t1[r, :nb]).all(), \
                (sb, r, int(types[r]))
        # short rows: the full 16-byte head is byte-exact (CRC bits
        # included), bytes beyond are zero by construction
        short = np.isin(types, (P.TPSAP_T_SB1, P.TPSAP_T_SB2,
                                P.TPSAP_T_NDB))
        assert (got_t1[short, :16] == want_t1[short, :16]).all()
        assert (got_t1[short, 16:] == 0).all()


def test_fleet_engine_typed_fec_matches_split():
    """Engine-level A/B: the typed-FEC default must produce identical
    decode state (locks, CRC tallies, display, MAC) to a split-FEC engine
    on a multi-cell stream with SYNC + NDB + traffic(SCH-F) slots."""
    from tetra_tpu.rx.fleet import FleetEngine

    C, T = 3, 30 * 255
    streams = []
    for c in range(C):
        vslots = {2: (lambda f=c: np.full(274, f % 2, np.uint8))}
        bits, _ = cell.downlink_bits(
            cell.CellConfig(mcc=262, mnc=50 + c, cc=2 + c), 2 * T // 255 + 2,
            start=START, voice_slots=vslots)
        streams.append(bits)
    packed = np.stack([
        ((s[0::2] << 1) | s[1::2]).astype(np.uint8)[:T] | 0x80
        for s in streams])
    f_typed = FleetEngine(C)                      # typed default
    f_split = FleetEngine(C, split_fec=True)
    assert f_typed.typed_fec and not f_split.typed_fec
    for i in range(0, T, 2400):
        f_typed.process_packed(packed[:, i:i + 2400])
        f_split.process_packed(packed[:, i:i + 2400])
    for c in range(C):
        a, b = f_typed.chan(c), f_split.chan(c)
        assert a.state == b.state == 2, c
        assert f_typed.crc_counts(c) == f_split.crc_counts(c), c
        assert f_typed.crc_counts(c)[0] > 0, c
        assert f_typed.display(c).as_dict() == f_split.display(c).as_dict()
        assert bytes(a.mac) == bytes(b.mac), c


def test_fleet_threads_bitexact():
    """The native worker pool (fleet_set_threads) must produce IDENTICAL
    per-channel state and decode results to the sequential engine on both
    feed entries (channel-major bytes and the time-major superblock
    layout) -- channels are independent, and the partitioned row regions
    compact into a layout whose stable channel sort equals the
    sequential path's."""
    from tetra_tpu.rx.fleet import FleetEngine

    C, K, n_chunks = 5, 4, 75
    T = n_chunks * 32
    streams = []
    for c in range(C):
        bits, _ = cell.downlink_bits(
            cell.CellConfig(mcc=262, mnc=60 + c, cc=1 + c),
            2 * (K * T) // 255 + 4, start=START)
        streams.append(((bits[0::2] << 1) | bits[1::2]).astype(np.uint8))
    need = K * T
    dibm = np.stack([s[:need] for s in streams])
    valid = np.ones_like(dibm, bool)
    packed = (dibm & 3) | 0x80

    f_seq = FleetEngine(C, threads=1)
    f_par = FleetEngine(C, threads=3)      # uneven split over 5 channels
    for f in (f_seq, f_par):
        f.process_packed(packed[:, :T])    # warm scrambling via byte path
    words = _pack2_host(dibm[:, T:], valid[:, T:], K - 1, n_chunks)
    n_seq = f_seq.process_packed2(words, K - 1, n_chunks)
    n_par = f_par.process_packed2(words, K - 1, n_chunks)
    assert n_seq == n_par and n_seq > 0
    for c in range(C):
        a, b = f_seq.chan(c), f_par.chan(c)
        assert a.state == b.state, c
        assert (a.start_bitnum, a.buf_len) == (b.start_bitnum, b.buf_len), c
        assert bytes(a.buf[:a.buf_len]) == bytes(b.buf[:b.buf_len]), c
        assert f_seq.crc_counts(c) == f_par.crc_counts(c), c
        assert f_seq.crc_counts(c)[0] > 0, c
        assert f_seq.display(c).as_dict() == f_par.display(c).as_dict(), c
        assert bytes(a.mac) == bytes(b.mac), c


def test_pipelined_lag_contract_mid_stream():
    """VERDICT r3 weak #6: the wb_pipeline state-visibility CONTRACT,
    stressed mid-stream -- without flush, every observable lags the sync
    path by EXACTLY the rows of one deferred superblock (never more, never
    stale-forever); flush_wideband() at ANY point reconciles exactly and
    is idempotent; resuming after a mid-stream flush keeps the lag
    contract.  Uses matched superblock feeds into a sync twin as the
    ground truth at every step."""
    from tetra_tpu.tx.wideband import synthesize_wideband

    N = 8
    bits, _ = cell.downlink_bits(
        cell.CellConfig(mcc=262, mnc=77, cc=3), 220,
        start=TdmaTime(mn=2, fn=14, tn=1))
    bitmat = np.stack([bits] * N)
    wide = synthesize_wideband(bitmat, N, cfo_hz=90.0, snr_db=25.0, seed=5)

    piped = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=2,
                          wb_pipeline=True)
    sync = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=2)
    adv, wl = piped._wb["advance"], piped._wb["wide_len"]
    sb = 2 * adv                       # samples per superblock feed
    n_super = (len(wide) - (wl - adv)) // sb
    assert n_super >= 6

    def counts(rx):
        return [rx.crc_counts(c) for c in range(N)]

    flushed_at = {2, 4}                # mid-stream reconciliation points
    prev_sync = counts(sync)
    for s in range(n_super):
        chunk = wide[s * sb: (s + 1) * sb + (wl - adv)][:sb]
        piped.process_wideband(chunk)
        sync.process_wideband(chunk)
        cur_sync = counts(sync)
        if s in flushed_at:
            piped.flush_wideband()
            piped.flush_wideband()     # idempotent
            assert counts(piped) == cur_sync, s
        else:
            # unflushed state == the sync path one superblock AGO (the
            # deferred superblock's rows are the exact difference) -- and
            # after a mid-stream flush the same one-superblock lag resumes
            # immediately on the next feed
            assert counts(piped) == prev_sync, s
        prev_sync = cur_sync
    piped.flush_wideband()
    assert counts(piped) == counts(sync)
    for c in range(N):
        assert piped.locked(c) == sync.locked(c)
        assert piped.display(c).as_dict() == sync.display(c).as_dict()
        assert sync.crc_counts(c)[0] > 0


def test_fleet_threads_timing_smoke():
    """The worker pool must not REGRESS wall time under real concurrent
    load, even oversubscribed (VERDICT r4 weak #5: the perf claim needs a
    measurement, and a refactor that serializes the pool behind a lock or
    adds per-call thread churn should fail here).  Bit-exactness under
    uneven channel splits is pinned by test_fleet_threads_bitexact; this
    smoke asserts the wall-time contract and identical aggregate decode.
    Full scaling numbers: scripts/bench_pool.py (2-core host, r5: 1.7x at
    threads=2, 256 ch; ratio saturates when the shared device FEC call
    dominates)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import bench_pool

    C, K, n_chunks = 96, 3, 74
    warm, words = bench_pool.make_feed(C, K, n_chunks)
    times = {}
    decode = {}
    for t in (1, 3):
        dt, blocks, ok, fail = bench_pool.run_config(
            C, K, n_chunks, warm, words, t, iters=3)
        times[t] = dt
        decode[t] = (blocks, ok, fail)
    assert decode[1] == decode[3], decode
    assert decode[1][1] > 0
    # generous bound: oversubscribed on a tiny host the pool must roughly
    # break even; 2.5x covers scheduler/CI contention (this host's timing
    # swings documented in CLAUDE.md) while still catching a serialized
    # or per-call-churning pool (which reads 3-10x here).  Precise
    # scaling numbers live in scripts/bench_pool.py, not CI.
    assert times[3] < times[1] * 2.5 + 0.05, times


def test_link_profile_pcie_full_configuration_e2e():
    """VERDICT r4 item 7: the ONE-SWITCH pcie profile.  A wideband fleet
    receiver built with link_profile="pcie" must run the full PCIe
    configuration (wb_pipeline double-buffering ON, halved typed-FEC
    buckets so steady batches chunk in two with dispatch-before-fetch
    overlap, all-cores worker pool) and, after flush, decode IDENTICALLY
    to the tunnel-profile twin on the same stream -- first deployment on
    real PCIe is a flag, not a code-reading session."""
    from tetra_tpu.tx.wideband import synthesize_wideband

    N = 8
    bits, _ = cell.downlink_bits(
        cell.CellConfig(mcc=262, mnc=88, cc=4), 200,
        start=TdmaTime(mn=2, fn=14, tn=1))
    bitmat = np.stack([bits] * N)
    wide = synthesize_wideband(bitmat, N, cfo_hz=120.0, snr_db=25.0, seed=9)

    pcie = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=2,
                         link_profile="pcie")
    tun = TetraReceiver(wideband=N, fleet=True, events=False, wb_k=2,
                        link_profile="tunnel")
    # the switch engaged every mechanism
    assert pcie.wb_pipeline and not tun.wb_pipeline
    assert pcie.fleet.link_profile == "pcie"
    assert pcie.fleet.short_bucket <= tun.fleet.short_bucket // 2 or \
        pcie.fleet.short_bucket < tun.fleet.short_bucket, \
        (pcie.fleet.short_bucket, tun.fleet.short_bucket)
    assert pcie.fleet.schf_bucket < tun.fleet.schf_bucket

    adv, wl = pcie._wb["advance"], pcie._wb["wide_len"]
    sb = 2 * adv
    n_super = (len(wide) - (wl - adv)) // sb
    assert n_super >= 5
    for s in range(n_super):
        chunk = wide[s * sb: (s + 1) * sb + (wl - adv)][:sb]
        pcie.process_wideband(chunk)
        tun.process_wideband(chunk)
    pcie.flush_wideband()
    tun.flush_wideband()
    for c in range(N):
        assert pcie.locked(c) and tun.locked(c), c
        assert pcie.crc_counts(c) == tun.crc_counts(c), c
        assert pcie.crc_counts(c)[0] > 0, c
        assert pcie.display(c).as_dict() == tun.display(c).as_dict(), c


def test_dual_resident_receivers_decode():
    """bench_e2e.measure_dual (two resident wideband receivers
    round-robined -- the >= 1024-channel capacity path on real hardware)
    must run correctly at CPU scale: both instances lock and decode
    CRC-clean, and the aggregate accounting covers both spectra."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import bench_e2e

    r = bench_e2e.measure_dual(channels_per=8, t50=6400, k=2, seconds=2.5)
    assert r["dual"] and r["channels"] == 16
    assert r["locked"] == 16
    assert r["crc_ok"] > 0 and r["crc_ok"] > 3 * r["crc_fail"]
    assert r["wideband_msps"] > 0 and r["rt_channels"] > 0
