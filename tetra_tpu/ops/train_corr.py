"""Batched training-sequence correlation on device (JAX).

Device-side half of wideband burst sync (SURVEY.md section 7 step 4): the
bit-serial rolling matcher of phy/tetra_burst.c:271-341 becomes one
correlation per training sequence over (channels, bits) blocks - exact-match
positions for every channel in a single device call.  The host lock state
machine (rx/burst_sync.py) consumes the hit masks; per-channel Python
searches disappear from the scale path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import params as P
from ..core.fir import _conv_valid_real


@lru_cache(maxsize=1)
def _seq_kernels():
    """(seq_id, length, ±1 kernel) for the three downlink-relevant
    sequences, kernels reversed for convolution-as-correlation."""
    out = []
    for sid in (P.TRAIN_SEQ_SYNC, P.TRAIN_SEQ_NORM_1, P.TRAIN_SEQ_NORM_2):
        seq = P.TRAIN_SEQS[sid].astype(np.float32)
        k = (1.0 - 2.0 * seq)[::-1].copy()
        out.append((sid, len(seq), k))
    return tuple(out)


@partial(jax.jit, static_argnames=())
def train_seq_hits(bits: jnp.ndarray) -> dict:
    """bits: (C, L) uint8 -> {seq_id: (C, L-len+1) bool exact-match mask}.

    A window matches iff the ±1 correlation equals the sequence length.
    """
    x = 1.0 - 2.0 * bits.astype(jnp.float32)
    hits = {}
    for sid, n, k in _seq_kernels():
        corr = _conv_valid_real(x, jnp.asarray(k))
        hits[sid] = corr >= (n - 0.5)
    return hits


def first_hits(bits: np.ndarray) -> dict:
    """Host-facing: {seq_id: (C,) first match offset or -1}."""
    bits = np.atleast_2d(np.asarray(bits, np.uint8))
    masks = jax.device_get(train_seq_hits(jnp.asarray(bits)))
    out = {}
    for sid, m in masks.items():
        any_hit = m.any(axis=1)
        first = m.argmax(axis=1)
        out[sid] = np.where(any_hit, first, -1)
    return out
