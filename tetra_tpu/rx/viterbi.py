"""Batched soft-decision Viterbi decoder for the TETRA K=5 mother codes (JAX).

TPU-first re-design of the reference's generic trellis decoder
(lower_mac/osmo_conv.c, viterbi_cch.c, viterbi_tch.c): instead of a scalar
ACS loop per block, the 16-state trellis is laid out on the vector unit and
the decoder is batched over an arbitrary leading block axis, with
`lax.scan` carrying the path metrics through trellis time.  Throughput comes
from the batch (bursts x channels), exactly as SURVEY.md section 7 plans.

Soft-bit convention (matches viterbi.c:6-25): +1 ~ transmitted bit 0,
-1 ~ transmitted bit 1, 0 ~ punctured/unknown.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P

N_STATES = 16  # K=5 -> 2^(K-1)


def _trellis_tables(polys: np.ndarray):
    """Expected-sign table E[s, b, n] = 1-2*g_n and predecessor tables.

    State bit i holds the input bit delayed by i+1 (bit0 = most recent);
    transition s --b--> ((s<<1)|b) & 15.
    """
    n_out = polys.shape[0]
    E = np.empty((N_STATES, 2, n_out), np.float32)
    for s in range(N_STATES):
        delayed = [(s >> i) & 1 for i in range(4)]
        for b in range(2):
            window = np.array([b] + delayed, np.int64)  # [x_n, x_{n-1}..x_{n-4}]
            g = (polys.astype(np.int64) @ window) % 2
            E[s, b] = 1.0 - 2.0 * g
    # predecessors of state ns: prev in {ns>>1, (ns>>1)+8}, input bit = ns & 1
    ns = np.arange(N_STATES)
    prev0 = ns >> 1
    prev1 = (ns >> 1) + 8
    b_of = ns & 1
    return (jnp.asarray(E), jnp.asarray(prev0, jnp.int32),
            jnp.asarray(prev1, jnp.int32), jnp.asarray(b_of, jnp.int32))


_CCH_TABLES = _trellis_tables(P.CONV_CCH_POLYS)
_TCH_TABLES = _trellis_tables(P.CONV_TCH_POLYS)

_NEG = jnp.float32(-1e9)


@partial(jax.jit, static_argnames=("n_out", "use_tch", "truncate"))
def _viterbi(soft: jnp.ndarray, n_out: int, use_tch: bool,
             truncate: bool) -> jnp.ndarray:
    E, prev0, prev1, b_of = _TCH_TABLES if use_tch else _CCH_TABLES
    B, T, _ = soft.shape

    def acs(metrics, y):
        # y: (B, n_out); branch metric bm[B, s, b] = sum_n y_n * E[s,b,n]
        bm = jnp.einsum("bn,sen->bse", y, E,
                        preferred_element_type=jnp.float32)
        cand0 = metrics[:, prev0] + bm[:, prev0, b_of]   # (B, 16)
        cand1 = metrics[:, prev1] + bm[:, prev1, b_of]
        take1 = cand1 > cand0
        new = jnp.where(take1, cand1, cand0)
        new = new - jnp.max(new, axis=1, keepdims=True)  # normalize
        return new, take1

    init = jnp.full((B, N_STATES), _NEG, jnp.float32).at[:, 0].set(0.0)
    final, decisions = jax.lax.scan(acs, init, jnp.swapaxes(soft, 0, 1))
    # decisions: (T, B, 16) bool

    def trace(state, dec_t):
        # state: (B,) current state AFTER transition t; its LSB is bit_t
        bit = (state & 1).astype(jnp.uint8)
        took1 = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0]
        prev = jnp.where(took1, (state >> 1) + 8, state >> 1)
        return prev, bit

    if truncate:
        # unterminated block: best-metric end state (osmo_conv.c:588-599)
        start = jnp.argmax(final, axis=1).astype(jnp.int32)
    else:
        start = jnp.zeros((B,), jnp.int32)  # zero-terminated (4 tail bits)
    _, bits_rev = jax.lax.scan(trace, start, decisions, reverse=True)
    return jnp.swapaxes(bits_rev, 0, 1)  # (B, T) -- scan(reverse) keeps order


def viterbi_decode(soft: jnp.ndarray, code: str = "cch",
                   term: str = "zero") -> jnp.ndarray:
    """Decode batched soft mother-code symbols.

    soft: (B, T, N) float32 in [-1, 1] (0 = punctured), N=4 for the data
    (CCH) code, N=3 for the speech (TCH) code.  Returns (B, T) uint8 decoded
    bits.  term="zero" assumes zero-terminated blocks (the in-band tail bits
    of clause 8.2.3 drive the encoder back to state 0, so traceback starts at
    state 0 - same result as the reference's FLUSH handling of
    osmo_conv.c:567-614); term="truncate" starts traceback from the
    best-metric end state (unterminated speech class-1 blocks).
    """
    use_tch = code == "tch"
    n_out = 3 if use_tch else 4
    assert soft.shape[-1] == n_out
    return _viterbi(soft.astype(jnp.float32), n_out, use_tch,
                    term == "truncate")
