"""Fused Pallas TPU kernel: polyphase fold + DFT (the channelizer core).

One `pallas_call` replaces the channelizer's XLA composition
(parallel/channelizer._channelize_block): the 96-slice polyphase fold, the
four DFT matmuls, and the hop-phase sign flip, producing frame-major
(n_out, n_ch) channel streams in one pass.  The XLA version materializes
the fold accumulators and DFT operands in HBM between ops; here the z
window stays VMEM-resident across the whole fused chain (the wideband
front-end is ~70% of the cascade's marginal cost, scripts/ablate_wideband
attribution).

Layout mirrors ops/demod_pallas: time on sublanes, branches/channels on
lanes.  Grid steps tile the output frames; the full (n_z, hop) z block is
VMEM-resident (3.3 MB per component at n_ch=256, t50=6400) with a constant
block index so Mosaic fetches it once.

Semantics are the reference channelizer's exactly (same fold order, same
DFT basis, same sign flip); tests/test_pallas.py checks interpret-mode
equality against the XLA twin.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_weights(prototype: np.ndarray, n_ch: int) -> np.ndarray:
    """(2*TPB, hop) F with F[s, c] = h[s*hop + c]: the fold weight of input
    row m+s, branch column c (s = 2j + d encodes tap j, half d)."""
    hop = n_ch // 2
    return prototype.reshape(-1, hop).astype(np.float32)


def _kernel(n_s: int, q_tile: int,
            zr_ref, zi_ref, f_ref, wr_ref, wi_ref, yr_ref, yi_ref):
    q0 = pl.program_id(0) * q_tile
    hop = zr_ref.shape[1]
    # polyphase fold: acc[d][c] = sum_j z[m + 2j + d, c] * F[2j+d, c]
    accs = []
    for comp, z_ref in ((0, zr_ref), (1, zi_ref)):
        acc = [jnp.zeros((q_tile, hop), jnp.float32) for _ in range(2)]
        for s in range(n_s):
            w = f_ref[s, :][None, :]
            zs = z_ref[pl.ds(q0 + s, q_tile), :]
            acc[s % 2] = acc[s % 2] + zs * w
        accs.append(jnp.concatenate(acc, axis=1))   # (Q, 2*hop), b = d*hop+c
    fr, fi = accs
    # DFT across branches (wr_ref/wi_ref hold W.T) + hop-phase sign flip
    yr = jnp.dot(fr, wr_ref[...], preferred_element_type=jnp.float32) \
        - jnp.dot(fi, wi_ref[...], preferred_element_type=jnp.float32)
    yi = jnp.dot(fr, wi_ref[...], preferred_element_type=jnp.float32) \
        + jnp.dot(fi, wr_ref[...], preferred_element_type=jnp.float32)
    n_ch = yr.shape[1]
    m_par = ((jax.lax.broadcasted_iota(jnp.int32, (q_tile, 1), 0) + q0) % 2)
    k_par = jax.lax.broadcasted_iota(jnp.int32, (1, n_ch), 1) % 2
    flip = (1 - 2 * (m_par * k_par)).astype(jnp.float32)
    yr_ref[...] = yr * flip
    yi_ref[...] = yi * flip


@partial(jax.jit, static_argnames=("n_ch", "q_tile", "interpret"))
def fold_dft(zr: jnp.ndarray, zi: jnp.ndarray, F, wr_t, wi_t,
             n_ch: int, q_tile: int = 640, interpret: bool = False):
    """zr/zi: (n_out + 2*TPB - 1, hop) float32 hop-reshaped wideband rows;
    F: (2*TPB, hop) fold weights (_fold_weights); wr_t/wi_t: the DFT basis
    transposed.  Returns frame-major (n_out, n_ch) yr, yi with the sign
    flip applied."""
    n_s = F.shape[0]                 # 2 * TAPS_PER_BRANCH
    n_out = zr.shape[0] - (n_s - 1)
    while n_out % q_tile:
        q_tile //= 2
    grid = (n_out // q_tile,)
    whole = pl.BlockSpec(zr.shape, lambda q: (0, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec(F.shape, lambda q: (0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((n_ch, n_ch), lambda q: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.BlockSpec((q_tile, n_ch), lambda q: (q, 0),
                       memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        partial(_kernel, n_s, q_tile),
        grid=grid,
        in_specs=[whole, whole, fspec, wspec, wspec],
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((n_out, n_ch), jnp.float32)] * 2,
        interpret=interpret,
    )(zr, zi, F, wr_t, wi_t)
    return yr, yi
