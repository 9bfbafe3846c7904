"""FEC stack tests: encode/decode roundtrips and stage-level golden checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import params as P
from tetra_tpu.tx import fec_enc
from tetra_tpu.rx import fec as rx_fec
from tetra_tpu.rx.viterbi import viterbi_decode

RNG = np.random.default_rng(1234)


def test_crc_good_residue():
    """Appending the complemented CRC yields the X.25 good residue 0x1d0f."""
    for n in (60, 124, 92, 268):
        bits = RNG.integers(0, 2, n).astype(np.uint8)
        coded = fec_enc.append_crc16(bits)
        assert fec_enc.crc16_bits(coded) == P.CRC16_GOOD


def test_crc_matrix_matches_bitwise():
    for n in (76, 140):
        bits = RNG.integers(0, 2, (8, n)).astype(np.uint8)
        got = np.asarray(rx_fec.crc16_check(jnp.asarray(bits)))
        want = np.array([fec_enc.crc16_bits(b) == P.CRC16_GOOD for b in bits])
        assert (got == want).all()
        # and a known-good batch
        good = np.stack([fec_enc.append_crc16(b[:-16]) for b in bits])
        assert np.asarray(rx_fec.crc16_check(jnp.asarray(good))).all()


def test_interleave_roundtrip():
    for K, a in ((120, 11), (216, 101), (168, 13), (432, 103)):
        bits = RNG.integers(0, 2, K).astype(np.uint8)
        inter = fec_enc.block_interleave(bits, a)
        deinter = np.asarray(rx_fec.deinterleave(jnp.asarray(inter), a))
        assert (deinter == bits).all()
        assert not (inter == bits).all()  # permutation actually permutes


def test_puncture_depuncture_roundtrip():
    """Every transmitted mother symbol must be restored by depuncturing.

    Mirrors the reference's only in-tree self-test (tetra_conv_enc.c:253-352).
    """
    cases = [  # (type2_len, type3_len, mother_rate, punct)
        (80, 120, 4, P.PUNCT_2_3),       # BSCH
        (144, 216, 4, P.PUNCT_2_3),      # SB2/NDB
        (112, 168, 4, P.PUNCT_2_3),      # SCH/HU
        (288, 432, 4, P.PUNCT_2_3),      # SCH/F
        (292, 432, 4, P.PUNCT_292_432),  # TCH/4.8
        (148, 432, 4, P.PUNCT_148_432),  # TCH/2.4
        (112, 168, 3, P.PUNCT_112_168),  # speech class 1
        (72, 162, 3, P.PUNCT_72_162),    # speech class 2
        (38, 80, 3, P.PUNCT_38_80),      # speech class 2 STCH
    ]
    for t2, t3, rate, punct in cases:
        mother = RNG.integers(0, 2, t2 * rate).astype(np.uint8)
        type3 = fec_enc.puncture(mother, punct, t3)
        soft = np.asarray(rx_fec.depuncture_soft(
            jnp.asarray(type3), punct, t2 * rate, rate)).reshape(-1)
        sent = soft != 0.0
        assert sent.sum() == len(np.unique(P.puncture_indices(punct, t3)))
        restored = (1.0 - soft[sent]) / 2.0
        assert (restored == mother[sent]).all()


def test_conv_encoder_known_state_machine():
    """Encoder output must match the published 16-state trellis tables
    (viterbi_cch.c:36-50): spot-check transitions from a few states."""
    # encode single bit streams and compare against direct polynomial math
    bits = RNG.integers(0, 2, 40).astype(np.uint8)
    out = fec_enc.conv_encode(bits, P.CONV_CCH_POLYS)
    # brute force shift register
    delayed = [0, 0, 0, 0]
    ref = []
    for b in bits:
        g1 = (b + delayed[0] + delayed[3]) % 2
        g2 = (b + delayed[1] + delayed[2] + delayed[3]) % 2
        g3 = (b + delayed[0] + delayed[1] + delayed[3]) % 2
        g4 = (b + delayed[0] + delayed[2] + delayed[3]) % 2
        ref += [g1, g2, g3, g4]
        delayed = [int(b)] + delayed[:3]
    assert (out == np.array(ref, np.uint8)).all()


def test_viterbi_noiseless_roundtrip():
    B, n_info = 16, 76
    msgs = RNG.integers(0, 2, (B, n_info)).astype(np.uint8)
    type2 = np.concatenate([msgs, np.zeros((B, 4), np.uint8)], axis=1)
    mother = np.stack([fec_enc.conv_encode(m) for m in type2])
    soft = (1.0 - 2.0 * mother.astype(np.float32)).reshape(B, -1, 4)
    decoded = np.asarray(viterbi_decode(jnp.asarray(soft)))
    assert (decoded == type2).all()


def test_viterbi_corrects_errors():
    B, n_info = 8, 76
    msgs = RNG.integers(0, 2, (B, n_info)).astype(np.uint8)
    type2 = np.concatenate([msgs, np.zeros((B, 4), np.uint8)], axis=1)
    mother = np.stack([fec_enc.conv_encode(m) for m in type2])
    soft = (1.0 - 2.0 * mother.astype(np.float32))
    # flip 8 random positions per block (rate-1/4 K=5 corrects this easily)
    for i in range(B):
        pos = RNG.choice(soft.shape[1], 8, replace=False)
        soft[i, pos] *= -1.0
    decoded = np.asarray(viterbi_decode(jnp.asarray(soft.reshape(B, -1, 4))))
    assert (decoded == type2).all()


def test_viterbi_with_puncturing():
    """Full punctured path: encode -> puncture -> depuncture -> decode."""
    for blk in (P.TPSAP_T_SB1, P.TPSAP_T_SB2, P.TPSAP_T_SCH_F):
        name, t345, t2, t1, ia, _ = P.BLK_PARAMS[blk]
        msgs = RNG.integers(0, 2, (4, t2 - 4)).astype(np.uint8)
        type2 = np.concatenate([msgs, np.zeros((4, 4), np.uint8)], axis=1)
        mother = np.stack([fec_enc.conv_encode(m) for m in type2])
        type3 = np.stack([fec_enc.puncture(m, P.PUNCT_2_3, t345) for m in mother])
        soft = rx_fec.depuncture_soft(jnp.asarray(type3), P.PUNCT_2_3, t2 * 4, 4)
        decoded = np.asarray(viterbi_decode(soft))
        assert (decoded == type2).all(), name


def test_scrambler_self_inverse_and_init():
    ks = fec_enc.scramb_keystream(P.SCRAMB_INIT, 432)
    assert set(np.unique(ks)) <= {0, 1}
    bits = RNG.integers(0, 2, 432).astype(np.uint8)
    scr = fec_enc.scramble(bits, P.SCRAMB_INIT)
    assert (fec_enc.scramble(scr, P.SCRAMB_INIT) == bits).all()
    # cell init packing (tetra_scramb.c:87-99)
    init = P.scramb_get_init(mcc=262, mnc=1234, colour=7)
    assert init & 0x3 == P.SCRAMB_INIT
    assert (init >> 2) & 0x3F == 7
    assert (init >> 8) & 0x3FFF == 1234
    assert (init >> 22) & 0x3FF == 262


def test_rm3014_roundtrip_corrects_3_rejects_4():
    # pin the design assumption of rx_fec.rm3014_decode: d_min = 8
    cb = rx_fec._rm_codebook_pm1()          # (30, 16384) ±1
    agree = (cb[:, :1] * cb[:, 1:]).sum(axis=0)   # vs the all-zero word
    assert (30 - agree.max()) / 2 == 8      # linear code: weights = distances
    bits = RNG.integers(0, 2, 14).astype(np.uint8)
    coded = fec_enc.rm3014_encode(bits)
    # 0..3 errors: corrected to the exact info word and accepted
    for nerr in range(4):
        bad = coded.copy()
        pos = RNG.choice(30, nerr, replace=False)
        bad[pos] ^= 1
        info, ok = rx_fec.rm3014_decode(jnp.asarray(bad[None]))
        assert (np.asarray(info)[0] == bits).all() and np.asarray(ok)[0], nerr
    # 4 errors: always rejected (nearest codeword is at distance >= 4)
    bad = coded.copy()
    bad[RNG.choice(30, 4, replace=False)] ^= 1
    _, ok = rx_fec.rm3014_decode(jnp.asarray(bad[None]))
    assert not np.asarray(ok)[0]


@pytest.mark.parametrize("blk_type", list(P.BLK_PARAMS))
def test_block_encode_decode_roundtrip(blk_type):
    name, t345, t2, t1, ia, has_crc = P.BLK_PARAMS[blk_type]
    scramb_init = P.scramb_get_init(262, 1234, 7)
    B = 5
    type1 = RNG.integers(0, 2, (B, t1)).astype(np.uint8)
    type5 = np.stack([fec_enc.encode_block(m, blk_type, scramb_init)
                      for m in type1])
    out, ok = rx_fec.decode_block(jnp.asarray(type5), blk_type, scramb_init)
    assert (np.asarray(out) == type1).all(), name
    assert np.asarray(ok).all(), name


def test_mixed_decode_matches_per_type():
    """decode_blocks_mixed == decode_block for every downlink type in one
    heterogeneous batch, bit-exact -- including corrupted rows (the strong
    zero-padding forces the padded traceback through the true-end state;
    see rx/fec._MIX_PAD_AMP)."""
    scramb = P.scramb_get_init(262, 1234, 7)
    types = [P.TPSAP_T_SB1, P.TPSAP_T_BBK, P.TPSAP_T_SB2,
             P.TPSAP_T_NDB, P.TPSAP_T_SCH_F]
    rows = []
    expect = []
    for rep in range(3):
        for blk_type in types:
            name, t345, t2, t1, ia, has_crc = P.BLK_PARAMS[blk_type]
            type1 = RNG.integers(0, 2, t1).astype(np.uint8)
            init = P.SCRAMB_INIT if blk_type == P.TPSAP_T_SB1 else scramb
            type5 = fec_enc.encode_block(type1, blk_type, init)
            if rep == 1:   # a few correctable channel errors
                for pos in RNG.choice(t345, 3, replace=False):
                    type5 = type5.copy()
                    type5[pos] ^= 1
            if rep == 2:   # garbage row: CRC must fail identically
                type5 = RNG.integers(0, 2, t345).astype(np.uint8)
            rows.append((blk_type, type5, scramb))
            ref_t1, ref_ok = rx_fec.decode_block(
                jnp.asarray(type5[None]), blk_type, scramb)
            expect.append((np.asarray(ref_t1)[0], bool(np.asarray(ref_ok)[0])))
    got = rx_fec.decode_blocks_mixed(rows)
    for (g_t1, g_ok), (e_t1, e_ok), (blk_type, _, _) in zip(got, expect, rows):
        assert g_ok == e_ok, P.BLK_PARAMS[blk_type][0]
        assert (g_t1 == e_t1).all(), P.BLK_PARAMS[blk_type][0]


def test_mixed_decode_schhu_fallback():
    """SCH/HU is outside the fused variant table (uplink-only): the mixed
    API must fall back to the per-type path, not crash."""
    scramb = P.scramb_get_init(262, 1234, 7)
    type1 = RNG.integers(0, 2, 92).astype(np.uint8)
    type5 = fec_enc.encode_block(type1, P.TPSAP_T_SCH_HU, scramb)
    got = rx_fec.decode_blocks_mixed([(P.TPSAP_T_SCH_HU, type5, scramb)])
    assert len(got) == 1
    g_t1, g_ok = got[0]
    assert g_ok and (g_t1 == type1).all()
