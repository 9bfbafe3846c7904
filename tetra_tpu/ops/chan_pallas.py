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

Compiled-TPU numerics note: this backend runs every f32 dot (XLA and
Mosaic alike) at bf16-class precision, so compiled outputs of any
dot-containing stage sit ~4e-3 relative from float64 truth and two
lowerings of the same math can differ ~2e-3 from each other (the
elementwise fold is exact f32).  Cross-path comparisons on TPU must be
decode-level, not elementwise (CLAUDE.md); interpret mode remains the
exact-semantics oracle.
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
            zr_ref, zi_ref, f_ref, wr_ref, wi_ref, yr_ref, yi_ref,
            zbuf_r, zbuf_i):
    q0 = pl.program_id(0) * q_tile
    hop = zr_ref.shape[1]
    # polyphase fold: acc[d][c] = sum_j z[m + 2j + d, c] * F[2j+d, c].
    # The step window copies to scratch at the ALIGNED q0 first (q_tile is
    # a multiple of 8), then the n_s fold slices use STATIC offsets --
    # Mosaic rejects dynamic q0+s starts it cannot prove 8-aligned once
    # hop > 128 (the C=512 wideband geometry, r5), while static unaligned
    # slices lower fine.
    zbuf_r[...] = zr_ref[pl.ds(q0, q_tile + n_s - 1), :]
    zbuf_i[...] = zi_ref[pl.ds(q0, q_tile + n_s - 1), :]
    accs = []
    for comp, z_ref in ((0, zbuf_r), (1, zbuf_i)):
        acc = [jnp.zeros((q_tile, hop), jnp.float32) for _ in range(2)]
        for s in range(n_s):
            w = f_ref[s, :][None, :]
            zs = z_ref[s:s + q_tile, :]
            acc[s % 2] = acc[s % 2] + zs * w
        accs.append(acc)                 # [(Q, hop) even, (Q, hop) odd]
    (fr0, fr1), (fi0, fi1) = accs
    # DFT across branches (wr_ref/wi_ref hold W.T) + hop-phase sign flip.
    # The (Q, 2*hop) operand is formed by SPLITTING the dot instead of
    # concatenating the two fold halves ([f0 f1] @ W = f0 @ W[:hop] +
    # f1 @ W[hop:]): the odd-offset fold slices leave acc[1] with a
    # sublane-offset layout that tpu.concatenate rejects at hop > 128
    # (the C=512 wideband geometry, r5), while dots accept it.
    wr0, wr1 = wr_ref[:hop, :], wr_ref[hop:, :]
    wi0, wi1 = wi_ref[:hop, :], wi_ref[hop:, :]
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    yr = mm(fr0, wr0) + mm(fr1, wr1) - mm(fi0, wi0) - mm(fi1, wi1)
    yi = mm(fr0, wi0) + mm(fr1, wi1) + mm(fi0, wr0) + mm(fi1, wr1)
    n_ch = yr.shape[1]
    m_par = ((jax.lax.broadcasted_iota(jnp.int32, (q_tile, 1), 0) + q0) % 2)
    k_par = jax.lax.broadcasted_iota(jnp.int32, (1, n_ch), 1) % 2
    flip = (1 - 2 * (m_par * k_par)).astype(jnp.float32)
    yr_ref[...] = yr * flip
    yi_ref[...] = yi * flip


def _kernel_rs(n_s: int, q_tile: int, s_l: int, s_m: int,
               zr_ref, zi_ref, f_ref, wr_ref, wi_ref, ws_ref,
               hd_r_ref, hd_i_ref, yr_ref, yi_ref, tr_ref, ti_ref,
               cr_ref, ci_ref, zbuf_r, zbuf_i):
    """fold + DFT + sign flip + fused 18/25 polyphase resample.

    Per sequential grid step: produce one q_tile-frame 50 kHz tile, prepend
    the carried 25-row halo (cr/ci scratch; seeded from the hd head refs =
    [ZF zeros | stream history] on step 0), left-multiply by the banded
    superblock matrix ws (s_l, q_tile + s_m) to emit the s_l-row 36 kHz
    tile, and carry the tile's last s_m rows.  tr/ti accumulate the final
    halo (the next block's stream history) -- rewritten every step with a
    constant output index, so the last step's value lands."""
    q0 = pl.program_id(0) * q_tile
    hop = zr_ref.shape[1]
    # aligned scratch copy + static fold slices (see _kernel's note)
    zbuf_r[...] = zr_ref[pl.ds(q0, q_tile + n_s - 1), :]
    zbuf_i[...] = zi_ref[pl.ds(q0, q_tile + n_s - 1), :]
    accs = []
    for z_ref in (zbuf_r, zbuf_i):
        acc = [jnp.zeros((q_tile, hop), jnp.float32) for _ in range(2)]
        for s in range(n_s):
            w = f_ref[s, :][None, :]
            zs = z_ref[s:s + q_tile, :]
            acc[s % 2] = acc[s % 2] + zs * w
        accs.append(acc)
    (fr0, fr1), (fi0, fi1) = accs
    # split dot instead of axis-1 concat (see _kernel's note)
    wr0, wr1 = wr_ref[:hop, :], wr_ref[hop:, :]
    wi0, wi1 = wi_ref[:hop, :], wi_ref[hop:, :]
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    yr = mm(fr0, wr0) + mm(fr1, wr1) - mm(fi0, wi0) - mm(fi1, wi1)
    yi = mm(fr0, wi0) + mm(fr1, wi1) + mm(fi0, wr0) + mm(fi1, wr1)
    n_ch = yr.shape[1]
    m_par = ((jax.lax.broadcasted_iota(jnp.int32, (q_tile, 1), 0) + q0) % 2)
    k_par = jax.lax.broadcasted_iota(jnp.int32, (1, n_ch), 1) % 2
    flip = (1 - 2 * (m_par * k_par)).astype(jnp.float32)
    yr = yr * flip
    yi = yi * flip

    @pl.when(pl.program_id(0) == 0)
    def _seed():
        cr_ref[...] = hd_r_ref[...]
        ci_ref[...] = hd_i_ref[...]

    for y, c_ref, out_ref, t_ref in ((yr, cr_ref, yr_ref, tr_ref),
                                     (yi, ci_ref, yi_ref, ti_ref)):
        win = jnp.concatenate([c_ref[...], y], axis=0)  # (s_m + Q, n_ch)
        out_ref[...] = jnp.dot(ws_ref[...], win,
                               preferred_element_type=jnp.float32)
        c_ref[...] = y[q_tile - s_m:, :]
        t_ref[...] = y[q_tile - s_m:, :]


@partial(jax.jit, static_argnames=("n_ch", "t36", "q_tile", "interpret"))
def fold_dft_resample(zr, zi, F, wr_t, wi_t, ws, hd_r, hd_i,
                      n_ch: int, t36: int, q_tile: int = 800,
                      interpret: bool = False):
    """Whole wideband front-end in ONE kernel: polyphase fold, DFT, sign
    flip, and the streaming 18/25 superblock resample.

    zr/zi as fold_dft; ws: the (18*q_tile/25, q_tile + 25) superblock
    resampling matrix; hd_r/hd_i: (25, n_ch) resampler window head
    ([ZF zeros | 23-row stream history]).  Returns frame-major
    (t36, n_ch) yr, yi and the (25, n_ch) tails whose rows [ZF:] are the
    next block's stream history.  Requires t50 % q_tile == 0 and
    q_tile % 25 == 0."""
    n_s = F.shape[0]
    n_out = zr.shape[0] - (n_s - 1)          # t50
    assert n_out % q_tile == 0 and q_tile % 25 == 0, (n_out, q_tile)
    assert q_tile % 8 == 0, q_tile   # aligned scratch copy start (Mosaic)
    s_m = 25
    s_l = q_tile * 18 // 25
    assert s_l * (n_out // q_tile) == t36
    grid = (n_out // q_tile,)
    whole = pl.BlockSpec(zr.shape, lambda q: (0, 0), memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec(F.shape, lambda q: (0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((n_ch, n_ch), lambda q: (0, 0),
                         memory_space=pltpu.VMEM)
    wsspec = pl.BlockSpec(ws.shape, lambda q: (0, 0),
                          memory_space=pltpu.VMEM)
    hdspec = pl.BlockSpec((s_m, n_ch), lambda q: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.BlockSpec((s_l, n_ch), lambda q: (q, 0),
                       memory_space=pltpu.VMEM)
    tail = pl.BlockSpec((s_m, n_ch), lambda q: (0, 0),
                        memory_space=pltpu.VMEM)
    yr, yi, tr, ti = pl.pallas_call(
        partial(_kernel_rs, n_s, q_tile, s_l, s_m),
        grid=grid,
        in_specs=[whole, whole, fspec, wspec, wspec, wsspec, hdspec, hdspec],
        out_specs=[out, out, tail, tail],
        out_shape=[jax.ShapeDtypeStruct((t36, n_ch), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((s_m, n_ch), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((s_m, n_ch), jnp.float32),
                        pltpu.VMEM((s_m, n_ch), jnp.float32),
                        pltpu.VMEM((q_tile + n_s - 1, n_ch // 2),
                                   jnp.float32),
                        pltpu.VMEM((q_tile + n_s - 1, n_ch // 2),
                                   jnp.float32)],
        interpret=interpret,
    )(zr, zi, F, wr_t, wi_t, ws, hd_r, hd_i)
    return yr, yi, tr, ti


@partial(jax.jit, static_argnames=("n_ch", "q_tile", "interpret"))
def fold_dft(zr: jnp.ndarray, zi: jnp.ndarray, F, wr_t, wi_t,
             n_ch: int, q_tile: int = 640, interpret: bool = False):
    """zr/zi: (n_out + 2*TPB - 1, hop) float32 hop-reshaped wideband rows;
    F: (2*TPB, hop) fold weights (_fold_weights); wr_t/wi_t: the DFT basis
    transposed.  Returns frame-major (n_out, n_ch) yr, yi with the sign
    flip applied."""
    n_s = F.shape[0]                 # 2 * TAPS_PER_BRANCH
    n_out = zr.shape[0] - (n_s - 1)
    # q_tile must divide n_out AND be a multiple of 8 (the scratch copy
    # starts at q0 = step * q_tile, which Mosaic must prove 8-aligned);
    # a single-step grid (q0 = 0) covers sizes with no such divisor
    while q_tile > 8 and (n_out % q_tile or q_tile % 8):
        q_tile //= 2
    if n_out % q_tile or q_tile % 8:
        q_tile = n_out
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
        scratch_shapes=[pltpu.VMEM((q_tile + n_s - 1, n_ch // 2),
                                   jnp.float32),
                        pltpu.VMEM((q_tile + n_s - 1, n_ch // 2),
                                   jnp.float32)],
        interpret=interpret,
    )(zr, zi, F, wr_t, wi_t)
    return yr, yi
