"""Bit-exact cross-validation of the FEC/burst stack against the compiled
reference C implementations (built from the read-only reference tree at test
time; skipped where it is absent).  Complements the crypto oracle tests:
every table-driven stage is checked against the original, not just our own
encode/decode loopback."""

import ctypes
import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import params as P
from tetra_tpu.rx import fec as rx_fec
from tetra_tpu.rx.viterbi import viterbi_decode
from tetra_tpu.tx import burst as tx_burst
from tetra_tpu.tx import fec_enc

REF = "/root/reference/src/decoder/src"
RNG = np.random.default_rng(77)


@pytest.fixture(scope="module")
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    so = "/tmp/tetra_fec_oracle2.so"
    if not os.path.exists(so):
        # tetra_burst.c references the global PHY state that normally lives in
        # tetra_burst_sync.c (which drags in the whole decoder); stub it.
        stub = "/tmp/tetra_fec_oracle_stub.c"
        with open(stub, "w") as f:
            f.write('#include "tetra_common.h"\n'
                    "struct tetra_phy_state t_phy_state;\n"
                    "void tp_sap_udata_ind(int type, int blk_num,\n"
                    "    const unsigned char *bits, unsigned int len,\n"
                    "    void *priv) {}\n")
        srcs = [f"{REF}/lower_mac/{f}" for f in (
            "tetra_scramb.c", "tetra_interleave.c", "tetra_conv_enc.c",
            "crc_simple.c", "tetra_rm3014.c", "viterbi.c", "viterbi_cch.c",
            "viterbi_tch.c", "osmo_conv.c")] + [f"{REF}/phy/tetra_burst.c",
                                                stub]
        subprocess.run(["gcc", "-shared", "-fPIC", "-O2", "-o", so,
                        *srcs, "-I", REF], check=True)
    lib = ctypes.CDLL(so)
    return lib


def _u8(arr):
    return np.ascontiguousarray(arr, np.uint8)


def test_scrambler_matches_reference(oracle):
    for init in (P.SCRAMB_INIT, P.scramb_get_init(262, 1234, 7),
                 P.scramb_get_init(901, 16383, 63)):
        buf = np.zeros(432, np.uint8)
        oracle.tetra_scramb_bits(ctypes.c_uint32(init),
                                 buf.ctypes.data_as(ctypes.c_void_p), 432)
        ours = fec_enc.scramb_keystream(init, 432)
        assert (buf == ours).all()


def test_interleaver_matches_reference(oracle):
    for K, a in ((120, 11), (216, 101), (168, 13), (432, 103)):
        src = _u8(RNG.integers(0, 2, K))
        out = np.zeros(K, np.uint8)
        oracle.block_interleave(K, a, src.ctypes.data_as(ctypes.c_void_p),
                                out.ctypes.data_as(ctypes.c_void_p))
        assert (out == fec_enc.block_interleave(src, a)).all()


def test_conv_encoder_matches_reference(oracle):
    class CES(ctypes.Structure):
        _fields_ = [("delayed", ctypes.c_uint8 * 4)]

    for n in (80, 144, 288):
        bits = _u8(RNG.integers(0, 2, n))
        out = np.zeros(4 * n, np.uint8)
        st = CES()
        oracle.conv_enc_init(ctypes.byref(st))
        oracle.conv_enc_input(ctypes.byref(st),
                              bits.ctypes.data_as(ctypes.c_void_p), n,
                              out.ctypes.data_as(ctypes.c_void_p))
        assert (out == fec_enc.conv_encode(bits)).all()


def test_puncture_matches_reference(oracle):
    cases = [(P.PUNCT_2_3, 480, 120), (P.PUNCT_2_3, 1152, 432),
             (P.PUNCT_292_432, 1168, 432), (P.PUNCT_148_432, 592, 432),
             (P.PUNCT_112_168, 336, 168), (P.PUNCT_72_162, 324, 162)]
    for pu, mother_len, out_len in cases:
        mother = _u8(RNG.integers(0, 2, mother_len))
        out = np.zeros(out_len, np.uint8)
        oracle.get_punctured_rate(pu, mother.ctypes.data_as(ctypes.c_void_p),
                                  out_len, out.ctypes.data_as(ctypes.c_void_p))
        assert (out == fec_enc.puncture(mother, pu, out_len)).all(), pu


def test_crc16_matches_reference(oracle):
    oracle.crc16_ccitt_bits.restype = ctypes.c_uint16
    for n in (76, 140, 284):
        bits = _u8(RNG.integers(0, 2, n))
        want = oracle.crc16_ccitt_bits(bits.ctypes.data_as(ctypes.c_void_p), n)
        assert fec_enc.crc16_bits(bits) == want


def test_rm3014_matches_reference(oracle):
    oracle.tetra_rm3014_compute.restype = ctypes.c_uint32
    oracle.tetra_rm3014_init()
    for _ in range(10):
        v = int(RNG.integers(0, 1 << 14))
        word = oracle.tetra_rm3014_compute(ctypes.c_uint16(v))
        bits14 = np.array([(v >> (13 - i)) & 1 for i in range(14)], np.uint8)
        ours = fec_enc.rm3014_encode(bits14)
        want = np.array([(word >> (29 - i)) & 1 for i in range(30)], np.uint8)
        assert (ours == want).all()


def test_viterbi_matches_reference_cch(oracle):
    """Depunctured soft blocks decode to the same bits as osmo_conv (including
    corrected random errors)."""
    for blk in (P.TPSAP_T_SB1, P.TPSAP_T_SB2, P.TPSAP_T_SCH_F):
        name, t345, t2, t1, ia, _ = P.BLK_PARAMS[blk]
        msg = _u8(RNG.integers(0, 2, t2 - 4))
        type2 = np.concatenate([msg, np.zeros(4, np.uint8)])
        mother = fec_enc.conv_encode(type2)
        type3 = fec_enc.puncture(mother, P.PUNCT_2_3, t345)
        # inject 4 errors
        bad = type3.copy()
        for pos in RNG.choice(t345, 4, replace=False):
            bad[pos] ^= 1
        # reference path: depunct + viterbi wrapper
        type3dp = np.full(512 * 4, 0xFF, np.uint8)
        oracle.tetra_rcpc_depunct(P.PUNCT_2_3,
                                  _u8(bad).ctypes.data_as(ctypes.c_void_p),
                                  t345,
                                  type3dp.ctypes.data_as(ctypes.c_void_p))
        ref_out = np.zeros(512, np.uint8)
        oracle.viterbi_dec_sb1_wrapper(
            type3dp.ctypes.data_as(ctypes.c_void_p),
            ref_out.ctypes.data_as(ctypes.c_void_p), t2)
        # our path
        soft = rx_fec.depuncture_soft(jnp.asarray(bad[None]), P.PUNCT_2_3,
                                      t2 * 4, 4)
        ours = np.asarray(viterbi_decode(soft))[0]
        assert (ours == ref_out[:t2]).all(), name


_ADJ_BITS = np.array([12, 13, 498, 499])  # hc/hd (sync) == ha/hb (norm) slots


def _nonadj(b):
    return np.delete(b, _ADJ_BITS)


def test_burst_builders_match_reference(oracle):
    """All burst fields bit-exact; the 4 phase-adjustment bits are excluded.

    The reference's put_phase_adj_bits indexes phase2bits[adj_phase] without
    the PHASE() (+3) offset (tetra_burst.c:165), so its builders always emit
    (0,0) regardless of the computed adjustment (indices 1/3 land on
    zero-initialized gaps in the designated-initializer array; -3/-1 read out
    of bounds).  Ours follows clause 9.4.4.3.6 and actually neutralizes the
    burst phase, so those 4 bits legitimately differ."""
    sb = _u8(RNG.integers(0, 2, 120))
    bb = _u8(RNG.integers(0, 2, 30))
    bkn = _u8(RNG.integers(0, 2, 216))
    buf = np.zeros(510, np.uint8)
    n = oracle.build_sync_c_d_burst(buf.ctypes.data_as(ctypes.c_void_p),
                                    sb.ctypes.data_as(ctypes.c_void_p),
                                    bb.ctypes.data_as(ctypes.c_void_p),
                                    bkn.ctypes.data_as(ctypes.c_void_p))
    assert n == 510
    ours = tx_burst.build_sync_burst(sb, bb, bkn)
    assert (_nonadj(ours) == _nonadj(buf)).all()
    assert (buf[_ADJ_BITS] == 0).all()  # pin the documented reference bug

    bkn1 = _u8(RNG.integers(0, 2, 216))
    bkn2 = _u8(RNG.integers(0, 2, 216))
    for two_log in (0, 1):
        buf = np.zeros(510, np.uint8)
        oracle.build_norm_c_d_burst(buf.ctypes.data_as(ctypes.c_void_p),
                                    bkn1.ctypes.data_as(ctypes.c_void_p),
                                    bb.ctypes.data_as(ctypes.c_void_p),
                                    bkn2.ctypes.data_as(ctypes.c_void_p),
                                    two_log)
        ours = tx_burst.build_norm_burst(bkn1, bb, bkn2, bool(two_log))
        assert (_nonadj(ours) == _nonadj(buf)).all(), two_log
        assert (buf[_ADJ_BITS] == 0).all()


def test_phase_adjustment_neutralizes_burst():
    """Our adjustment bits make sum(range) + adjustment == 0 (mod 2*pi) —
    the property clause 9.4.4.3.6 requires, which the reference's builders
    fail to deliver (see test above)."""
    sb = _u8(RNG.integers(0, 2, 120))
    bb = _u8(RNG.integers(0, 2, 30))
    bkn = _u8(RNG.integers(0, 2, 216))
    burst = tx_burst.build_sync_burst(sb, bb, bkn)
    for name, adj_sl in (("HC", slice(12, 14)), ("HD", slice(498, 500))):
        n1, n2 = tx_burst.PHASE_ADJ_RANGES[name]
        seg = burst[2 * (n1 - 1): 2 * n2]
        total = tx_burst.sum_phase(seg) + tx_burst.sum_phase(burst[adj_sl])
        assert total % 8 == 0, name


def test_train_seq_finder_matches_reference(oracle):
    oracle.tetra_find_train_seq.restype = ctypes.c_int
    from tetra_tpu.rx.burst_sync import find_train_seq
    for _ in range(5):
        bits = _u8(RNG.integers(0, 2, 1200))
        pos = int(RNG.integers(0, 1000))
        bits[pos:pos + 38] = P.TRAIN_Y
        offs = ctypes.c_uint(0)
        rc = oracle.tetra_find_train_seq(
            bits.ctypes.data_as(ctypes.c_void_p), len(bits),
            1 << P.TRAIN_SEQ_SYNC, ctypes.byref(offs))
        ours = find_train_seq(bits, (P.TRAIN_SEQ_SYNC,))
        if rc < 0:
            assert ours is None
        else:
            assert ours is not None and ours[1] == offs.value
