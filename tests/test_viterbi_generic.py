"""Generic Viterbi engine (rx/viterbi.viterbi_decode_generic) vs the
compiled reference osmo_conv decoder (lower_mac/osmo_conv.c): every (n, K)
geometry and termination mode the reference supports must decode corrupted
codewords to the same (correct) bits."""

import ctypes
import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

from tetra_tpu import params as P
from tetra_tpu.rx.viterbi import viterbi_decode_generic
from tetra_tpu.tx import fec_enc

REF = "/root/reference/src/decoder/src"
RNG = np.random.default_rng(123)

CONV_TERM_FLUSH, CONV_TERM_TRUNCATION, CONV_TERM_TAIL_BITING = 0, 1, 2

# generator sets: TETRA K=5 rows + industry-standard K=7 generators
_G5 = [[1, 1, 0, 0, 1],          # G1 = 1+D+D4        (viterbi_cch.c:28-33)
       [1, 0, 1, 1, 1],          # G2 = 1+D2+D3+D4
       [1, 1, 1, 0, 1],          # G3 = 1+D+D2+D4
       [1, 1, 0, 1, 1]]          # G4 = 1+D+D3+D4
_G7 = [[1, 0, 1, 1, 0, 1, 1],    # 133o
       [1, 1, 1, 1, 0, 0, 1],    # 171o
       [1, 1, 1, 0, 1, 0, 1],    # 165o
       [1, 0, 0, 1, 1, 1, 1]]    # 117o

GEOMETRIES = [(n, K) for K in (5, 7) for n in (2, 3, 4)]


class ConvCode(ctypes.Structure):
    _fields_ = [("N", ctypes.c_int), ("K", ctypes.c_int),
                ("len", ctypes.c_int), ("term", ctypes.c_int),
                ("next_output", ctypes.c_void_p),
                ("next_state", ctypes.c_void_p),
                ("next_term_output", ctypes.c_void_p),
                ("next_term_state", ctypes.c_void_p),
                ("puncture", ctypes.c_void_p)]


@pytest.fixture(scope="module")
def conv_oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    so = "/tmp/tetra_osmoconv_oracle.so"
    if not os.path.exists(so):
        subprocess.run(["gcc", "-shared", "-fPIC", "-O2", "-w", "-o", so,
                        f"{REF}/lower_mac/osmo_conv.c", "-I", REF],
                       check=True)
    lib = ctypes.CDLL(so)
    lib.osmo_conv_decode.restype = ctypes.c_int
    lib.osmo_conv_decode.argtypes = [ctypes.POINTER(ConvCode),
                                     ctypes.c_void_p, ctypes.c_void_p]
    return lib


def _polys(n, K):
    return np.asarray((_G5 if K == 5 else _G7)[:n], np.uint8)


def _tables(polys):
    """next_output/next_state in the reference convention
    (viterbi_cch.c:36-60): ns = ((s<<1)|b) & (S-1), output packed MSB-first
    G1..Gn."""
    n, K = polys.shape
    S = 1 << (K - 1)
    no = np.zeros((S, 2), np.uint8)
    nst = np.zeros((S, 2), np.uint8)
    for s in range(S):
        delayed = [(s >> i) & 1 for i in range(K - 1)]
        for b in range(2):
            window = np.array([b] + delayed, np.int64)
            g = (polys.astype(np.int64) @ window) % 2
            no[s, b] = sum(int(g[i]) << (n - 1 - i) for i in range(n))
            nst[s, b] = ((s << 1) | b) & (S - 1)
    return no, nst


def _ref_decode(lib, polys, sbits, L, term):
    no, nst = _tables(polys)
    code = ConvCode(N=polys.shape[0], K=polys.shape[1], len=L, term=term,
                    next_output=no.ctypes.data, next_state=nst.ctypes.data,
                    next_term_output=None, next_term_state=None,
                    puncture=None)
    out = np.zeros(L, np.uint8)
    sb = np.ascontiguousarray(sbits, np.int8)
    rc = lib.osmo_conv_decode(ctypes.byref(code), sb.ctypes.data,
                              out.ctypes.data)
    assert rc == 0, rc
    return out


def _encode(polys, bits, tailbite=False):
    n, K = polys.shape
    if tailbite:
        # tail-biting: initial encoder state = last K-1 bits (circular)
        ext = np.concatenate([bits[-(K - 1):], bits])
        full = fec_enc.conv_encode(ext, polys)
        return full[(K - 1) * n:]
    return fec_enc.conv_encode(bits, polys)


def _corrupt(mother, n_flips, rng):
    """Flip n_flips well-separated mother symbols (within correction
    capability, so both decoders must return the true bits)."""
    m = mother.copy()
    L = len(m)
    pos = (np.arange(n_flips) * (L // n_flips)
           + rng.integers(0, max(1, L // n_flips - 10), n_flips))
    m[pos] ^= 1
    return m


@pytest.mark.parametrize("n,K", GEOMETRIES)
def test_flush_matches_reference(conv_oracle, n, K):
    polys = _polys(n, K)
    L = 96
    for trial in range(3):
        bits = RNG.integers(0, 2, L).astype(np.uint8)
        full = np.concatenate([bits, np.zeros(K - 1, np.uint8)])
        mother = _corrupt(_encode(polys, full), 4, RNG)
        sb = (127 * (1 - 2 * mother.astype(np.int32))).astype(np.int8)
        ref = _ref_decode(conv_oracle, polys, sb, L, CONV_TERM_FLUSH)
        soft = (1.0 - 2.0 * mother.astype(np.float32)).reshape(1, -1, n)
        ours = np.asarray(viterbi_decode_generic(
            jnp.asarray(soft), polys, term="zero"))[0, :L]
        assert (ref == bits).all(), (n, K, trial)
        assert (ours == bits).all(), (n, K, trial)


@pytest.mark.parametrize("n,K", GEOMETRIES)
def test_truncation_matches_reference(conv_oracle, n, K):
    polys = _polys(n, K)
    L = 96
    for trial in range(3):
        bits = RNG.integers(0, 2, L).astype(np.uint8)
        mother = _corrupt(_encode(polys, bits), 3, RNG)
        sb = (127 * (1 - 2 * mother.astype(np.int32))).astype(np.int8)
        ref = _ref_decode(conv_oracle, polys, sb, L, CONV_TERM_TRUNCATION)
        soft = (1.0 - 2.0 * mother.astype(np.float32)).reshape(1, -1, n)
        ours = np.asarray(viterbi_decode_generic(
            jnp.asarray(soft), polys, term="truncate"))[0]
        # truncation leaves the last K-1 bits weakly protected; the
        # reference itself can err there -- compare on the strongly
        # decided prefix and require full agreement with each other
        assert (ref[:L - K + 1] == bits[:L - K + 1]).all(), (n, K, trial)
        assert (ours[:L - K + 1] == bits[:L - K + 1]).all(), (n, K, trial)


@pytest.mark.parametrize("n,K", GEOMETRIES)
def test_tailbiting_matches_reference(conv_oracle, n, K):
    polys = _polys(n, K)
    L = 96
    for trial in range(3):
        bits = RNG.integers(0, 2, L).astype(np.uint8)
        mother = _corrupt(_encode(polys, bits, tailbite=True), 3, RNG)
        sb = (127 * (1 - 2 * mother.astype(np.int32))).astype(np.int8)
        ref = _ref_decode(conv_oracle, polys, sb, L, CONV_TERM_TAIL_BITING)
        soft = (1.0 - 2.0 * mother.astype(np.float32)).reshape(1, -1, n)
        ours = np.asarray(viterbi_decode_generic(
            jnp.asarray(soft), polys, term="tailbite"))[0]
        assert (ref == bits).all(), (n, K, trial)
        assert (ours == bits).all(), (n, K, trial)


def test_generic_engine_matches_specialized_tetra_codes():
    """On the TETRA K=5 codes the generic engine must agree with the
    production specialized decoder bit for bit (same trellis layout)."""
    from tetra_tpu.rx.viterbi import viterbi_decode
    soft = RNG.normal(size=(8, 144, 4)).astype(np.float32)
    a = np.asarray(viterbi_decode(jnp.asarray(soft), "cch"))
    b = np.asarray(viterbi_decode_generic(jnp.asarray(soft),
                                          P.CONV_CCH_POLYS, term="zero"))
    assert (a == b).all()
    soft3 = RNG.normal(size=(8, 112, 3)).astype(np.float32)
    a = np.asarray(viterbi_decode(jnp.asarray(soft3), "tch",
                                  term="truncate"))
    b = np.asarray(viterbi_decode_generic(jnp.asarray(soft3),
                                          P.CONV_TCH_POLYS, term="truncate"))
    assert (a == b).all()


def test_generic_beyond_reference_geometry():
    """K=8 / n=5: outside osmo_conv's envelope entirely -- round-trip with
    corrections still works."""
    polys = np.array([[1, 0, 1, 1, 0, 1, 1, 1],
                      [1, 1, 1, 1, 0, 0, 1, 1],
                      [1, 1, 0, 1, 1, 0, 0, 1],
                      [1, 0, 0, 1, 1, 1, 0, 1],
                      [1, 1, 1, 0, 0, 1, 0, 1]], np.uint8)
    bits = RNG.integers(0, 2, 80).astype(np.uint8)
    full = np.concatenate([bits, np.zeros(7, np.uint8)])
    mother = _corrupt(_encode(polys, full), 6, RNG)
    soft = (1.0 - 2.0 * mother.astype(np.float32)).reshape(1, -1, 5)
    ours = np.asarray(viterbi_decode_generic(jnp.asarray(soft), polys,
                                             term="zero"))[0, :80]
    assert (ours == bits).all()
