"""Upper MAC unit tests: fragment reassembly, fill bits, aging, suppl."""

import numpy as np

from tetra_tpu.rx import mac_pdu as mp
from tetra_tpu.rx.tdma import TdmaTime
from tetra_tpu.rx.upper_mac import LC_SCH_F, N203, UpperMac

RNG = np.random.default_rng(9)


def _u(val, n):
    return np.array([(val >> (n - 1 - i)) & 1 for i in range(n)], np.uint8)


def _frag_start(sdu):
    """MAC-RESOURCE with length=START_FRAG (0x3f) and SSI address."""
    return np.concatenate([
        _u(0, 2),          # MAC-RESOURCE
        _u(0, 1),          # fill
        _u(0, 1),          # grant position
        _u(0, 2),          # encryption
        _u(0, 1),          # raf
        _u(0x3F, 6),       # length: start of fragmentation
        _u(1, 3),          # addr type SSI
        _u(0x24680, 24),   # ssi
        _u(0, 1), _u(0, 1), _u(0, 1),  # power/slotgrant/chanalloc absent
        sdu])


def _frag_cont(sdu):
    return np.concatenate([
        _u(1, 2),          # MAC-FRAG/END
        _u(0, 1),          # MAC-FRAG
        _u(0, 1),          # no fill
        sdu])


def _frag_end(sdu, total_bits):
    body = np.concatenate([
        _u(1, 2),          # MAC-FRAG/END
        _u(1, 1),          # MAC-END
        _u(0, 1),          # no fill
        _u(0, 1),          # position of grant
        _u((total_bits + 7) // 8, 6),  # length indicator (octets)
        _u(0, 1),          # no slot granting
        _u(0, 1),          # no chan alloc
        sdu])
    return body


def test_fragment_reassembly():
    um = UpperMac()
    t = TdmaTime(mn=2, fn=3, tn=2, sn=1)
    part1 = RNG.integers(0, 2, 60).astype(np.uint8)
    part2 = RNG.integers(0, 2, 70).astype(np.uint8)
    part3 = RNG.integers(0, 2, 40).astype(np.uint8)

    um.receive(np.concatenate([_frag_start(part1),
                               np.zeros(20, np.uint8)]), LC_SCH_F, True, t)
    assert um.fragslots[t.tn].active
    assert um.fragslots[t.tn].length == len(part1) + 20  # start fills slot

    t2 = TdmaTime(mn=2, fn=4, tn=2, sn=1)
    um.receive(_frag_cont(part2), LC_SCH_F, True, t2)
    assert um.fragslots[t2.tn].num_frags == 2

    t3 = TdmaTime(mn=2, fn=5, tn=2, sn=1)
    end = _frag_end(part3, len(_frag_end(part3, 0)))
    um.receive(end, LC_SCH_F, True, t3)
    assert not um.fragslots[t3.tn].active  # cleaned up
    reassembled = [e for e in um.events if e[0] == "tm_sdu_reassembled"]
    assert len(reassembled) == 1
    bits = reassembled[0][2]
    # contains start(+slot fill), cont, end parts in order
    assert (bits[:60] == part1).all()
    assert len(bits) > 130


def test_fragment_aging():
    um = UpperMac()
    t = TdmaTime(mn=1, fn=3, tn=3, sn=1)
    um.receive(np.concatenate([_frag_start(RNG.integers(0, 2, 50).astype(np.uint8))]),
               LC_SCH_F, True, t)
    assert um.fragslots[3].active
    # N203 frame-18 passes age it out
    for mn in range(2, 2 + N203 + 1):
        t18 = TdmaTime(mn=mn, fn=18, tn=1, sn=1)
        um.receive(np.zeros(30, np.uint8), LC_SCH_F, False, t18)  # crc fail
    # crc-failed blocks return before aging; feed a crc-ok AACH instead
    for mn in range(2, 2 + N203 + 1):
        t18 = TdmaTime(mn=mn, fn=18, tn=1, sn=1)
        um.receive(_u(0x3FFF, 14), 8, True, t18)  # LC_AACH
    assert not um.fragslots[3].active


def test_fill_bit_stripping():
    um = UpperMac()
    t = TdmaTime(mn=1, fn=2, tn=1, sn=1)
    sdu = np.concatenate([_u(2, 4), _u(2, 3), _u(0x0F, 5),
                          RNG.integers(0, 2, 30).astype(np.uint8)])
    # resource PDU with fill bits: total padded to octects, fill flag set
    hdr = np.concatenate([
        _u(0, 2), _u(1, 1), _u(0, 1), _u(0, 2), _u(0, 1),
        _u(12, 6),           # 12 octets = 96 bits
        _u(1, 3), _u(1, 24),
        _u(0, 1), _u(0, 1), _u(0, 1)])
    body = np.concatenate([hdr, sdu])
    pad = 96 - len(body)
    pdu = np.concatenate([body, _u(1, 1), np.zeros(pad - 1, np.uint8)])
    um.receive(pdu, LC_SCH_F, True, t)
    sdus = [e for e in um.events if e[0] == "tm_sdu"]
    assert len(sdus) == 1
    assert (sdus[0][2] == sdu).all()  # fill marker + zeros stripped
    llcs = [e for e in um.events if e[0] == "llc"]
    assert llcs and llcs[0][3].pdu_name == "D-SDS DATA"
