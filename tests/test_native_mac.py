"""Native upper-MAC core parity: rx/native/macparse.cpp vs rx/upper_mac.py.

The native path engages when events are disabled and no crypto is attached;
the Python implementation (events enabled) is the oracle.  Parity must hold
for every observable: MAC state flags, ssi/usage/addr, the display bus, and
fragment-slot bookkeeping -- on a structured full downlink stream AND on
random fuzz blocks (which exercise the branchy PDU edge cases).
"""

import numpy as np
import pytest

from tetra_tpu import params as P
from tetra_tpu.rx import native_mac
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.rx.upper_mac import LC_AACH, LC_BNCH, LC_SCH_F, UpperMac

RNG = np.random.default_rng(77)

pytestmark = pytest.mark.skipif(native_mac.load() is None,
                                reason="native macparse unavailable")


def _state_tuple(u: UpperMac):
    return (u.is_traffic, u.blk1_stolen, u.blk2_stolen, u.ssi,
            u.usage_marker, u.addr_type)


def _frag_tuple(u: UpperMac):
    """Fragment bookkeeping, from whichever side owns it."""
    h = u.__dict__.get("_native")
    if h not in (None, False) and not u.events_enabled:
        return tuple((int(f.active), int(f.age), int(f.num_frags),
                      int(f.length)) for f in h.st.frags)
    return tuple((int(f.active), f.age, f.num_frags, f.length)
                 for f in u.fragslots)


def _compare(py: UpperMac, nat: UpperMac, ctx):
    assert _state_tuple(py) == _state_tuple(nat), ctx
    assert py.display.as_dict() == nat.display.as_dict(), ctx
    assert _frag_tuple(py) == _frag_tuple(nat), ctx


def _run_pair(blocks):
    """blocks: [(bits, lchan, crc_ok, time)] fed to both paths."""
    py = UpperMac()                      # events on -> Python path
    nat = UpperMac(events_enabled=False)  # -> native path
    for i, (bits, lchan, crc_ok, time) in enumerate(blocks):
        py.receive(bits, lchan, crc_ok, time)
        nat.receive(bits, lchan, crc_ok, time)
        _compare(py, nat, (i, lchan, time))
    assert nat.__dict__.get("_native") not in (None, False), \
        "native path never engaged"
    return py, nat


def test_parity_full_downlink_stream():
    """Every decoded block of a rich downlink (voice, stealing,
    fragmentation, frame-18 slots) through both paths, compared at every
    step."""
    from tetra_tpu.rx.burst_sync import BurstSync
    from tetra_tpu.rx.lower_mac import LowerMac, process_bursts_multi
    from tetra_tpu.tx import cell

    cfg = cell.CellConfig()
    framegen = lambda: RNG.integers(0, 2, (2, 137)).astype(np.uint8)
    bits, _ = cell.downlink_bits(
        cfg, 290, voice_slots={2: framegen},
        stolen_slots={(3, 2), (7, 2)},
        frag_message=((5, 1), RNG.integers(0, 2, 280).astype(np.uint8)))
    mac_py = LowerMac()
    mac_nat = LowerMac()
    mac_nat.upper.events_enabled = False
    sync_py, sync_nat = BurstSync(phy=mac_py.phy), BurstSync(phy=mac_nat.phy)
    blk = 4608
    for b in range(len(bits) // blk):
        chunk = bits[b * blk:(b + 1) * blk]
        process_bursts_multi([mac_py, mac_nat],
                             [sync_py.feed(chunk), sync_nat.feed(chunk)])
        _compare(mac_py.upper, mac_nat.upper, b)
    assert mac_py.crc_oks == mac_nat.crc_oks > 100
    assert mac_nat.upper.__dict__.get("_native") not in (None, False)
    # sysinfo made it through the native path
    assert mac_nat.upper.display.dl_freq == mac_py.upper.display.dl_freq != 0
    si_py, si_nat = mac_py.upper.last_sysinfo, mac_nat.upper.last_sysinfo
    assert si_py is not None and si_nat is not None
    for f in native_mac.SYSINFO_FIELDS:
        assert getattr(si_py, f) == getattr(si_nat, f), f


def test_batched_dispatch_parity_with_voice():
    """The one-ctypes-call batched dispatch (macparse_dispatch) must match
    the per-block Python loop on every observable INCLUDING the deferred
    voice callbacks (full slots and surviving stolen halves) and the
    SYNC-PDU cell/PHY-time resync."""
    from tetra_tpu.rx.burst_sync import BurstSync
    from tetra_tpu.rx.lower_mac import LowerMac, process_bursts_multi
    from tetra_tpu.tx import cell

    cfg = cell.CellConfig()
    framegen = lambda: RNG.integers(0, 2, (2, 137)).astype(np.uint8)
    bits, _ = cell.downlink_bits(
        cfg, 290, voice_slots={2: framegen, 3: framegen},
        stolen_slots={(3, 2): "both", (7, 2): "first", (11, 3): "first"},
        frag_message=((5, 1), RNG.integers(0, 2, 280).astype(np.uint8)))

    calls = {"py": [], "nat": []}

    def make_cb(key):
        def cb(time, type4):
            calls[key].append(("full", str(time), np.asarray(type4).copy()))
        def half(time, type4):
            calls[key].append(("half", str(time), np.asarray(type4).copy()))
        cb.half = half
        return cb

    mac_py = LowerMac()
    mac_py.voice_cb = make_cb("py")
    mac_nat = LowerMac()
    mac_nat.upper.events_enabled = False
    mac_nat.voice_cb = make_cb("nat")
    sync_py, sync_nat = BurstSync(phy=mac_py.phy), BurstSync(phy=mac_nat.phy)
    dispatched = {"n": 0}
    orig = LowerMac._dispatch_native
    LowerMac._dispatch_native = (
        lambda self, *a: (dispatched.__setitem__("n", dispatched["n"] + 1),
                          orig(self, *a))[1])
    try:
        blk = 4608
        for b in range(len(bits) // blk):
            chunk = bits[b * blk:(b + 1) * blk]
            process_bursts_multi([mac_py, mac_nat],
                                 [sync_py.feed(chunk), sync_nat.feed(chunk)])
            _compare(mac_py.upper, mac_nat.upper, b)
            assert (mac_py.crc_oks, mac_py.crc_fails) == (
                mac_nat.crc_oks, mac_nat.crc_fails), b
            tp, tn = mac_py.phy.time, mac_nat.phy.time
            assert (tp.hn, tp.mn, tp.fn, tp.tn) == (tn.hn, tn.mn, tn.fn,
                                                    tn.tn), b
            assert mac_py.cell.scramb_init == mac_nat.cell.scramb_init, b
    finally:
        LowerMac._dispatch_native = orig
    assert dispatched["n"] > 10, "batched native dispatch never engaged"
    assert len(calls["py"]) == len(calls["nat"]) > 50
    kinds = {k for k, _, _ in calls["py"]}
    assert kinds == {"full", "half"}, kinds
    for (kp, tp, bp), (kn, tn, bn) in zip(calls["py"], calls["nat"]):
        assert kp == kn and tp == tn
        assert np.array_equal(bp, bn)


def test_parity_fuzz_blocks():
    """Random bit blocks (all lchans, lengths, times) must produce identical
    state on both paths -- exercises NULL addresses, length sentinels,
    chan-alloc branches, fill-bit stripping, truncated reads."""
    blocks = []
    t = TdmaTime(tn=1, fn=1, mn=1)
    for i in range(600):
        n = int(RNG.integers(14, 269))
        bits = RNG.integers(0, 2, n).astype(np.uint8)
        lchan = int(RNG.choice([LC_AACH, LC_BNCH, LC_SCH_F, 0]))
        if lchan == LC_AACH:
            bits = bits[:14]
        blocks.append((bits, lchan, bool(RNG.integers(0, 4)), t.copy()))
        t.add_tn(1)
    _run_pair(blocks)


def test_parity_fragmentation_sequences():
    """Hand-built START/FRAG/END chains incl. fill bits and aging across
    fn=18, mirrored on both paths."""
    from tests.test_upper_mac import _frag_cont, _frag_end, _frag_start, _u

    sdu_a = RNG.integers(0, 2, 120).astype(np.uint8)
    sdu_b = RNG.integers(0, 2, 64).astype(np.uint8)
    sdu_c = RNG.integers(0, 2, 48).astype(np.uint8)
    total = len(sdu_a) + len(sdu_b) + len(sdu_c)
    t = TdmaTime(tn=2, fn=4, mn=1)
    blocks = [
        (np.concatenate([_frag_start(sdu_a), _u(0, 40)]), LC_SCH_F, True, t.copy()),
        (np.concatenate([_frag_cont(sdu_b), _u(0, 40)]), LC_SCH_F, True, t.copy()),
        (np.concatenate([_frag_end(sdu_c, total), _u(0, 40)]), LC_SCH_F, True, t.copy()),
    ]
    # a second chain left dangling, then aged out over fn=18 slots
    blocks.append((np.concatenate([_frag_start(sdu_b), _u(0, 40)]),
                   LC_SCH_F, True, t.copy()))
    t18 = TdmaTime(tn=2, fn=18, mn=2)
    for k in range(8):
        blocks.append((RNG.integers(0, 2, 40).astype(np.uint8) * 0,
                       LC_BNCH, True, t18.copy()))
        t18.add_tn(4)
    _run_pair(blocks)
