"""Crypto tests: TEA keystreams, TB5/IV, keystore, MAC-element decrypt.

When the reference tree is present (developer machines), the TEA generators
and TB5 are additionally cross-validated bit-exactly against the compiled
reference C implementations.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from tetra_tpu.crypto import tea
from tetra_tpu.crypto.state import (CryptoState, Key, KeyStore, NetInfo,
                                    build_iv, tb5, KEYTYPE_CCK_SCK)
from tetra_tpu.rx.tdma import TdmaTime

REF = "/root/reference/src/decoder/src/crypto"


def test_iv_packing():
    t = TdmaTime(mn=17, fn=5, tn=3, sn=1)
    iv = build_iv(t, hn=0x1234, direction=1)
    assert iv & 0x3 == 2              # tn-1
    assert (iv >> 2) & 0x1F == 5      # fn
    assert (iv >> 7) & 0x3F == 17     # mn
    assert (iv >> 13) & 0x7FFF == 0x1234
    assert (iv >> 28) & 1 == 1


def test_tea_keystreams_differ_and_are_deterministic():
    key = bytes(range(10))
    for f in (tea.tea1, tea.tea2, tea.tea3):
        a = f(0x01020304, key, 16)
        b = f(0x01020304, key, 16)
        c = f(0x01020305, key, 16)
        assert a == b and a != c and len(a) == 16


def test_keystore_roundtrip(tmp_path):
    p = tmp_path / "keys.txt"
    p.write_text(
        "# test keystore\n"
        "network mcc 262 mnc 1234 ksg_type 1 security_class 2\n"
        "key mcc 262 mnc 1234 addr 0 key_type 1 key_num 3 "
        "key 0102030405060708090A\n")
    ks = KeyStore.load(str(p))
    assert len(ks.nets) == 1 and len(ks.keys) == 1
    assert ks.keys[0].key == bytes.fromhex("0102030405060708090A")
    assert ks.keys[0].network is ks.nets[0]


def _make_state():
    ks = KeyStore()
    ks.nets.append(NetInfo(262, 1234, ksg_type=1, security_class=2))
    k = Key(262, 1234, addr=0, key_type=KEYTYPE_CCK_SCK, key_num=3,
            key=bytes(range(10)), network=ks.nets[0])
    ks.keys.append(k)
    cs = CryptoState(store=ks)
    cs.cc = 7
    cs.la = 21
    cs.cn = 3600
    cs.cck_id = 3
    cs.update_network(262, 1234)
    return cs


def test_mac_element_decrypt_roundtrip():
    cs = _make_state()
    assert cs.cck is not None
    t = TdmaTime(mn=9, fn=3, tn=2, sn=1)
    rng = np.random.default_rng(5)
    plain = rng.integers(0, 2, 100).astype(np.uint8)
    offset = 30
    ks = cs.keystream_bits(cs.cck, t, 100 - offset)
    encrypted = plain.copy()
    encrypted[offset:] ^= ks
    decrypted = cs.try_decrypt_mac_element(encrypted, t, offset)
    assert decrypted is not None
    assert (decrypted == plain).all()
    # wrong slot -> wrong keystream
    t2 = TdmaTime(mn=9, fn=3, tn=3, sn=1)
    wrong = cs.try_decrypt_mac_element(encrypted, t2, offset)
    assert not (wrong == plain).all()


def test_voice_decrypt_sign_flip():
    cs = _make_state()
    t = TdmaTime(mn=9, fn=3, tn=2, sn=1)
    block = np.full(690, 127, np.int16)
    orig = block.copy()
    assert cs.decrypt_voice(t, block)
    ks = cs.keystream_bits(cs.cck, t, 274)
    flipped = (block != orig)
    assert flipped[1:138].sum() == ks[:137].sum()
    assert flipped[139:276].sum() == ks[137:274].sum()


# ---------------------------------------------------------------------------
# Reference-oracle cross validation (only on machines with the reference)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    so = "/tmp/tetra_tea_oracle.so"
    if not os.path.exists(so):
        subprocess.run(
            ["gcc", "-shared", "-fPIC", "-O2", "-o", so,
             f"{REF}/tea1.c", f"{REF}/tea2.c", f"{REF}/tea3.c",
             f"{REF}/hurdle.c", f"{REF}/taa1.c",
             "-I", os.path.dirname(REF)], check=True)
    return ctypes.CDLL(so)


def test_tea_matches_reference(oracle):
    rng = np.random.default_rng(0)
    for trial in range(3):
        key = bytes(rng.integers(0, 256, 10, dtype=np.uint8))
        iv = int(rng.integers(0, 1 << 29))
        for name in ("tea1", "tea2", "tea3"):
            buf = ctypes.create_string_buffer(64)
            getattr(oracle, name)(ctypes.c_uint32(iv), ctypes.c_char_p(key),
                                  ctypes.c_uint32(64), buf)
            assert buf.raw == getattr(tea, name)(iv, key, 64), (name, trial)


def test_tb5_matches_reference(oracle):
    rng = np.random.default_rng(1)
    for _ in range(5):
        cn = int(rng.integers(0, 1 << 12))
        la = int(rng.integers(0, 1 << 14))
        cc = int(rng.integers(0, 1 << 6))
        ck = bytes(rng.integers(0, 256, 10, dtype=np.uint8))
        cn_b = bytes([(cn >> 8) & 0xFF, cn & 0xFF])
        la_b = bytes([(la >> 8) & 0xFF, la & 0xFF])
        out = ctypes.create_string_buffer(10)
        oracle.tb5(ctypes.c_char_p(cn_b), ctypes.c_char_p(la_b),
                   ctypes.c_char_p(bytes([cc])), ctypes.c_char_p(ck), out)
        assert out.raw == tb5(cn, la, cc, ck)
