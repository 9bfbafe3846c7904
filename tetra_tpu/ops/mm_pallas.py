"""Fused Pallas TPU kernel: chunked ML timing recovery + Costas + slicer.

Stage 2 of the production demod as ONE kernel (the XLA scan version in
rx/demod_fast.py spends ~0.7 ms/chunk on per-op dispatch; the fused kernel
does the same math in a single program per chunk).  Mosaic has no vector
gather, so the data-dependent window extraction is restructured gather-free:

  1. a chunk-global window of the matched-filter stream is cut with ONE
     dynamic-scalar slice at base = min over channels of the first symbol
     position;
  2. each channel's column is aligned to its own integer offset with a
     log2(SHIFT_RANGE) barrel shifter (static row shifts + per-lane selects);
  3. within the chunk, symbol k of channel c sits at row 2k + d (d bounded
     by |omega - 2| <= 2% drift over the group), handled by static stride-2
     slices + selects;
  4. interpolation/derivative coefficients come from the degree-5 Horner
     polynomials in mu (rx/demod_fast._bank_polys) - no table, no lookup.

PAIR MODE (round 4, VERDICT r3 item 4): with even n_chunks the kernel
processes TWO K_SYM chunks per group -- one window cut / barrel / selection
matmul / interpolation over 2*K_SYM symbols extrapolated from the frozen
group-start state (cross-chunk position prediction), with ONE loop update
per group at the pair-scaled gains (rx/demod_fast._PAIR_*: timing at the
1/K law, Costas at the sqrt compromise -- the measured-optimal scaling,
see the table at their definition).  This HALVES the sequential chain
length, the demod throughput bound since round 1.

Loop updates are identical to rx/demod_fast._mm_costas_chunked (pair=
n_chunks even); equivalence is checked in interpret mode by
tests/test_pallas.py.

Layout: time on sublanes, channels on lanes: mf inputs are (T + 7, C).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import params as P
from ..rx.demod_fast import (_COSTAS_ALPHA, _COSTAS_BETA,
                             _COSTAS_FREQ_LIM_CHUNKED, _MM_MU_GAIN,
                             _MM_OMEGA_GAIN, _OMEGA_MAX, _OMEGA_MIN,
                             _PAIR_CA, _PAIR_CB, _PAIR_CLIM, _PAIR_MU,
                             _PAIR_OM, K_SYM, _bank_polys, rot_ramp)

NTAPS = P.INTERP_TAP_COUNT            # 8
SHIFT_RANGE = 512                      # max per-channel offset from base

# --- round-5 stage-2 structure knobs (trace-time constants; A/B via
# scripts/ab_stage2.py, which clears the jit caches around mutation) ---
#
# ALIGN8: 8-align the window-cut base (the r1-r4 formulation).  The
# alignment puts the base's sublane residue INTO r, so even a perfectly
# locked tile fires the 8/4/2/1 barrel passes on most groups --
# in-context attribution (attr_stage2, r4) charged 25.6 ms/dispatch to
# the barrel at k=32 with one channel's bits firing a pass for the whole
# tile.  False (default since r5) cuts the window at base = min(ipos)
# directly (Mosaic lowers the unaligned dynamic slice itself, cheaper
# than our masked passes); r then carries only the true cross-channel
# spread (<= 2-3 samples once locked: timing phases mod 2 plus ppm
# walk), so the predicated passes above the spread skip.  MEASURED
# (scripts/ab_stage2.py, same process, settled locked fleet, k=32,
# (2048, 4608)): 80.3 -> 73.5 ms/dispatch (3,760 -> 4,109 Msps, +9.3%),
# checksum-identical.
ALIGN8 = False
# NARROW_INTERP: predicated dual interp path -- run the slip-select
# chain at |d| <= NARROW_D when the group's ACTUAL max |dsel| allows
# (locked channels drift <= 2*100ppm*(G-1) ~ 0.013 samples/group, so
# dsel in {-1, 0, +1} and 3 selects/tap suffice), keeping the full
# +-margin chain for acquisition.  Bit-identical either way (a where
# against an all-false mask is the identity).  MEASURED A LOSS
# (ab_stage2, r5): 80.3 -> 84.4 ms/dispatch aligned, 73.5 -> 74.1
# unaligned -- the (G, C) abs+max reduce, the scalar predicate
# evaluation, and the 4x(G, C) scratch round trip the pl.when branches
# need to communicate results cost ~12 ms/dispatch, swamping the ~8 ms
# the shorter chain saves (the selects are only 8 of ~22 VPU
# ops/tap: Horner dominates the loop).  Kept gated for geometries with
# larger margins (G > 64 groups) where the select share grows.
NARROW_INTERP = False
NARROW_D = 1                           # |dsel| bound of the narrow path
# FOLD: stop the barrel at shift FOLD+1 and fold the residual per-channel
# offset (r & FOLD) into the slip-select offsets instead -- the selection
# matrix gains FOLD extra offsets (o = t + (r&FOLD) + dsel + margin) and
# the per-tap select chain grows by FOLD cases, but the low barrel passes
# (masked ~150-row copies that fire on nearly every locked group: 17.7 ms
# of the k=32 dispatch even with ALIGN8=False -- attr_stage2 r5) never
# run: once locked, rmax <= 2-3 means NO pass fires at all.  Selected
# stream rows are IDENTICAL (o + 2k + barrel(r - r&FOLD) = ipos + 2k +
# d), so results are bit-exact vs FOLD=0.  Must be 2^m - 1 (0 = legacy
# full barrel).
FOLD = 3

def _check_fold(fold: int) -> int:
    """FOLD must be 2^m - 1 (a contiguous low-bit mask): the barrel stops
    at shift FOLD+1 and the select offsets absorb r & FOLD -- any other
    value leaves residual bits neither shifted nor folded (silently wrong
    symbols).  Validated at trace time (raise, not assert: -O safe)."""
    if fold < 0 or (fold & (fold + 1)) != 0:
        raise ValueError(f"FOLD={fold}: must be 2^m - 1 (0, 1, 3, 7, ...)")
    return fold

# SEL_DEINT: extract the stride-2 offset rows via ONE (NEED, NEED)
# even/odd de-interleave matmul + static slices of its output, instead of
# the (N_OFF*G, NEED) stacked selection matmul: ex[o][k] = w[o + 2k] =
# (o even ? even-plane : odd-plane)[o//2 + k], and each plane offset is a
# contiguous G-row STATIC slice -- ~7.6x fewer MXU FLOPs.  An equivalent
# variant measured a WASH in round 1 (122.7 vs 122.5 ms: the matmul
# overlapped other kernel work); re-measured in round 5 at the 65 ms
# operating point where the selection is ablation-charged 14.1 ms
# (attr_stage2).  Bit-exact: same elements, 0/1-exact f32 matmul.
# MEASURED (ab_stage2, r5): 65.1 -> 59.4 ms/dispatch (4,641 -> 5,085
# Msps), checksum-identical.  (Same session: stage-1 CT=1024 with U=2/4
# unroll measured a WASH, 65.1 -> 64.7 -- stage 1 is compute-bound, not
# grid-step-overhead bound; its knobs stay at CT=2048/U=1.)
SEL_DEINT = True
# PACK_RI: keep the window's re/im halves side by side in ONE
# (WIN, 2*CT) scratch so the whole alignment/selection pipeline runs
# double-width: one window copy target, one where per barrel pass, and
# ONE de-interleave matmul (NEED, NEED) @ (NEED, 2*CT) instead of a
# re/im dot pair -- half the small-matmul launches at double the lane
# utilization (the select term measured 9.2 ms vs a ~2 ms MXU floor;
# small (144,144,128) dots are pipeline-fill bound).  Bit-exact: dot
# output columns are independent.  MEASURED (ab_stage2, r5): 59.3 ->
# 57.7 ms/dispatch same-session (+2.7%), checksum-identical -- the
# launch-count halving pays less than the MXU-floor math suggested (the
# dot overlaps other work), but it is a clean win and fewer ops.
PACK_RI = True
# COPY_HEAD: copy only the NEED+8 head rows of the window into the
# barrel scratch unconditionally, and the remaining SHIFT_RANGE tail
# only when a pass >= 8 could fire (rmax >= 8 -- never once locked,
# where rmax <= 2-3).  Pass 4 reads at most NEED+7 rows, so the head
# covers every pass the tail condition does not.  Cuts the per-group
# VMEM copy from WIN (~657) rows to ~152.  Bit-exact by construction
# (uncopied rows are never read).
COPY_HEAD = True


def _geom(pair: bool):
    """Group geometry: (H halves, G symbols/group, slip margin, N_OFF
    distinct window offsets, NEED aligned-window rows, WIN window rows).

    margin bounds the intra-group integer slip vs the nominal 2k grid:
    |omega - 2| <= 0.02 * 2 -> drift <= 0.04 * (G - 1), so 2 covers G = 32
    and 3 covers G = 64."""
    H = 2 if pair else 1
    G = H * K_SYM
    margin = int(np.ceil(0.0401 * (G - 1)))
    n_off = NTAPS + 2 * margin + FOLD    # FOLD extra offsets absorb r&FOLD
    need = ((n_off - 1 + 2 * (G - 1) + 1 + 7) // 8) * 8
    win = 2 * G + NTAPS + 2 * margin + FOLD + SHIFT_RANGE
    return H, G, margin, n_off, need, win


_SEL_CACHE = {}


def _selection_mats(pair: bool) -> np.ndarray:
    """(N_OFF * G, NEED) stacked 0/1 matrix: row o*G + k has its 1 at
    column o + 2k (Mosaic supports neither gathers nor stride-2 slices; ONE
    matmul against a constant selection matrix extracts every offset's
    stride-2 row set at once on the MXU).  Operating on the NEED-row head
    of the aligned window instead of all WIN rows cuts the selection FLOPs
    -- the barrel shifter guarantees nothing beyond row NEED-1 is
    selectable."""
    key = (pair, FOLD, SEL_DEINT)
    if key not in _SEL_CACHE:
        _, G, _, n_off, need, _ = _geom(pair)
        if SEL_DEINT:
            # (NEED, NEED) even/odd de-interleave: output rows [0, h) are
            # the even input rows, [h, 2h) the odd -- every stride-2
            # offset set then reads as a static slice (see SEL_DEINT)
            h = need // 2
            S = np.zeros((need, need), np.float32)
            for j in range(h):
                S[j, 2 * j] = 1.0
                S[h + j, 2 * j + 1] = 1.0
        else:
            S = np.zeros((n_off * G, need), np.float32)
            for o in range(n_off):
                for k in range(G):
                    S[o * G + k, o + 2 * k] = 1.0
        _SEL_CACHE[key] = S
    return _SEL_CACHE[key]


def _chunk_body(T, pair, ablate, mfr_ref, mfi_ref, polys_ref, sel_ref,
                wbuf_r, wbuf_i, acc_refs,
                pos, omega, cphase, cfreq, ph2, prev_sym):
    """One group (K_SYM or 2*K_SYM symbols) of the timing/Costas/slicer
    loop.

    Pure function of the carried loop state plus the VMEM-resident stream
    refs; returns (new_state..., per-group outputs).  Factored out so the
    grid kernel can unroll U groups per grid step: TPU grid steps run
    sequentially and carry a fixed per-step overhead, which dominated the
    chain at 1 chunk/step (BENCH_DETAIL.md roofline).

    ablate: profiling-only stage skips ('barrel', 'select', 'interp') used
    by scripts/ablate_mm.py to attribute kernel time; () in production
    (wrong results when non-empty, same shapes/structure).
    """
    C = mfr_ref.shape[1]          # channels in this tile
    _check_fold(FOLD)
    H, G, margin, n_off, need_rows, win = _geom(pair)

    kk = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).astype(jnp.float32)
    p = pos[None, :] + omega[None, :] * kk                 # (G, C)
    ipos = jnp.floor(p)
    mu = p - ipos
    ipos = ipos.astype(jnp.int32)
    valid = ipos < T

    # ---- window cut + per-channel alignment (gather-free) ----
    # (the input's WIN-row tail padding guarantees base + WIN stays in range
    # without clamping, so r is bounded by the cross-channel spread alone)
    base = jnp.clip(jnp.min(ipos[0, :]), 0, T - 1)
    if ALIGN8:
        # original formulation: aligned slice, residue folded into r (the
        # barrel then fires the 8/4/2/1 passes on most locked groups)
        base = (base // 8) * 8
        base = pl.multiple_of(base, 8)
    r = ipos[0, :] - base                                   # (C,) >= 0
    reachable = r < SHIFT_RANGE
    valid = jnp.logical_and(valid, reachable[None, :])
    r = jnp.where(reachable, r, 0)

    # dynamic-slice the window out of the VMEM-resident stream (an HBM DMA
    # variant faulted this backend; VMEM residency caps T*C per call at
    # ~1.8M samples - tile channels for larger blocks)
    rmax0 = jnp.max(r)
    if PACK_RI:
        # single double-width buffer: columns [0, C) = re, [C, 2C) = im
        if COPY_HEAD:
            head = need_rows + 8
            wbuf_r[:head, :C] = mfr_ref[pl.ds(base, head), :]
            wbuf_r[:head, C:] = mfi_ref[pl.ds(base, head), :]

            @pl.when(rmax0 >= 8)
            def _tail():
                wbuf_r[head:, :C] = mfr_ref[pl.ds(base + head,
                                                  win - head), :]
                wbuf_r[head:, C:] = mfi_ref[pl.ds(base + head,
                                                  win - head), :]
        else:
            wbuf_r[:, :C] = mfr_ref[pl.ds(base, win), :]
            wbuf_r[:, C:] = mfi_ref[pl.ds(base, win), :]
    elif COPY_HEAD:
        head = need_rows + 8
        wbuf_r[:head, :] = mfr_ref[pl.ds(base, head), :]
        wbuf_i[:head, :] = mfi_ref[pl.ds(base, head), :]

        @pl.when(rmax0 >= 8)
        def _tail():
            wbuf_r[head:, :] = mfr_ref[pl.ds(base + head, win - head), :]
            wbuf_i[head:, :] = mfi_ref[pl.ds(base + head, win - head), :]
    else:
        wbuf_r[:, :] = mfr_ref[pl.ds(base, win), :]
        wbuf_i[:, :] = mfi_ref[pl.ds(base, win), :]
    # Barrel shifter, in scratch so every pass can be PREDICATED on the
    # actual cross-channel spread: pass s is an exact identity when
    # max(r) < s (power-of-2 s means no channel has that bit set), and the
    # spread is small whenever the channel clocks are near lock -- locked
    # channels skip ~all passes, and even free-running omega walks keep the
    # early (largest) passes off.  The barrel was 62% of stage-2 kernel
    # time when run unconditionally (scripts/ablate_mm.py).  Each pass also
    # shrinks its window: after applying shift s, later stages only read
    # the first NEED + (s - 1) rows (remaining shifts sum to s - 1).
    rmax = rmax0
    shift = 0 if "barrel" in ablate else SHIFT_RANGE // 2
    while shift > FOLD:
        need_in = min(win, need_rows + 2 * shift - 1)  # valid rows pre-pass

        @pl.when(rmax >= shift)
        def _pass(shift=shift, need_in=need_in):
            if PACK_RI:
                b1 = ((r & shift) > 0)[None, :]     # (1, C) bool
                bit2 = jnp.concatenate([b1, b1], axis=1)   # (1, 2C)
                wbuf_r[:need_in - shift, :] = jnp.where(
                    bit2, wbuf_r[shift:need_in, :],
                    wbuf_r[:need_in - shift, :])
            else:
                bit = (r & shift) > 0               # (C,) bool
                src_r = wbuf_r[shift:need_in, :]
                src_i = wbuf_i[shift:need_in, :]
                wbuf_r[:need_in - shift, :] = jnp.where(
                    bit[None, :], src_r, wbuf_r[:need_in - shift, :])
                wbuf_i[:need_in - shift, :] = jnp.where(
                    bit[None, :], src_i, wbuf_i[:need_in - shift, :])

        shift //= 2
    if PACK_RI:
        wri = wbuf_r[:need_rows, :]                 # (NEED, 2C)
        wr = wri[:, :C]
        wi = wri[:, C:]
    else:
        wr = wbuf_r[:need_rows, :]
        wi = wbuf_i[:need_rows, :]
    # now row j (< NEED) of channel c = mf[ipos[0, c] + j]

    # intra-group integer slip vs the nominal 2k grid
    dsel = ipos - ipos[0:1, :] - (2 * kk).astype(jnp.int32)  # in [-m, m]
    if FOLD:
        # the barrel stopped at shift FOLD+1: the residual per-channel
        # offset folds into the select offsets (same stream rows, see the
        # FOLD note) -- dsel becomes e = (r & FOLD) + slip
        dsel = dsel + (r & FOLD)[None, :]

    # ---- interpolation + ML derivative via Horner polynomials ----
    # every offset's stride-2 row set in ONE stacked selection matmul pair
    if "select" in ablate:
        ex_r = [jnp.broadcast_to(wr[:1, :], (G, C))] * n_off
        ex_i = [jnp.broadcast_to(wi[:1, :], (G, C))] * n_off
    else:
        # (A 3-pass bf16 Dekker split of this product measured no win in
        # r1 -- the f32 Mosaic matmul path is efficient and the split
        # adds VPU conversions.  The de-interleave form below, a wash in
        # r1 when the matmul fully overlapped, became a +9% win at the
        # r5 operating point -- see SEL_DEINT.)
        S = sel_ref[:, :]          # (NEED, NEED) deint or (n_off*G, NEED)
        if PACK_RI:
            # one double-width dot; re/im split off the output columns
            exs = jnp.dot(S, wri, preferred_element_type=jnp.float32)
            exs_r = exs[:, :C]
            exs_i = exs[:, C:]
        else:
            exs_r = jnp.dot(S, wr, preferred_element_type=jnp.float32)
            exs_i = jnp.dot(S, wi, preferred_element_type=jnp.float32)
        if SEL_DEINT:
            # rows [0, h) = even plane, [h, 2h) = odd: offset o's stride-2
            # set is the static G-row slice at o//2 within its plane
            h2 = need_rows // 2
            starts = [(o >> 1) + (h2 if o & 1 else 0) for o in range(n_off)]
            ex_r = [exs_r[s0:s0 + G, :] for s0 in starts]
            ex_i = [exs_i[s0:s0 + G, :] for s0 in starts]
        else:
            ex_r = [exs_r[o * G:(o + 1) * G, :] for o in range(n_off)]
            ex_i = [exs_i[o * G:(o + 1) * G, :] for o in range(n_off)]
    # the residual-offset masks are TAP-INDEPENDENT: hoisted out of the
    # tap loop (bit-identical; Mosaic CSE'd the repeated compares anyway).
    dmask = [dsel == d for d in range(-margin, margin + FOLD + 1)]

    def interp_accum(mrange: int):
        """Horner interpolation + ML derivative with the slip selects
        limited to |d| <= mrange.  EXACT whenever max|dsel| <= mrange (a
        where against an all-false mask is the identity), so the narrow
        call below is bit-identical to the wide one on locked groups."""
        f0r = jnp.zeros((G, C), jnp.float32)
        f0i = jnp.zeros((G, C), jnp.float32)
        d_r = jnp.zeros((G, C), jnp.float32)
        d_i = jnp.zeros((G, C), jnp.float32)
        for t in range(NTAPS if "interp" not in ablate else 1):
            cb = polys_ref[0, 0, t]
            cd = polys_ref[1, 0, t]
            for j in range(1, 6):
                cb = cb * mu + polys_ref[0, j, t]
                cd = cd * mu + polys_ref[1, j, t]
            # window value at row 2k + t + d for d in [-mrange..mrange]
            if "selects" in ablate:   # profiling only: Horner w/o selects
                xr = ex_r[t + margin]
                xi_ = ex_i[t + margin]
            else:
                xr = jnp.zeros((G, C), jnp.float32)
                xi_ = jnp.zeros((G, C), jnp.float32)
                for d in range(-mrange, mrange + FOLD + 1):
                    off = t + d + margin
                    xr = jnp.where(dmask[d + margin], ex_r[off], xr)
                    xi_ = jnp.where(dmask[d + margin], ex_i[off], xi_)
            f0r += cb * xr
            f0i += cb * xi_
            d_r += cd * xr
            d_i += cd * xi_
        return f0r, f0i, d_r, d_i

    if NARROW_INTERP and not FOLD and margin > NARROW_D \
            and "interp" not in ablate:
        # dual predicated path: the NTAPS x (2*margin+1) select chain was
        # 22.6 ms of the k=32 dispatch in context (attr_stage2, r4) while
        # locked groups only ever need |d| <= 1 -- branch on the group's
        # ACTUAL slip so tracking runs the short chain and acquisition
        # keeps the full margin, with bit-identical results either way.
        f0r_ref, f0i_ref, dr_ref, di_ref = acc_refs
        dmax = jnp.max(jnp.abs(dsel))

        @pl.when(dmax <= NARROW_D)
        def _narrow():
            a, b, c2, d2 = interp_accum(NARROW_D)
            f0r_ref[:, :] = a
            f0i_ref[:, :] = b
            dr_ref[:, :] = c2
            di_ref[:, :] = d2

        @pl.when(dmax > NARROW_D)
        def _wide():
            a, b, c2, d2 = interp_accum(margin)
            f0r_ref[:, :] = a
            f0i_ref[:, :] = b
            dr_ref[:, :] = c2
            di_ref[:, :] = d2

        f0r = f0r_ref[:, :]
        f0i = f0i_ref[:, :]
        d_r = dr_ref[:, :]
        d_i = di_ref[:, :]
    else:
        f0r, f0i, d_r, d_i = interp_accum(margin)

    sgn = lambda v: jnp.where(v > 0, 1.0, -1.0)
    err = jnp.clip(sgn(f0r) * d_r + sgn(f0i) * d_i, -4.0, 4.0)
    err = jnp.where(valid, err, 0.0)
    # ONE loop update per group at the K-scaled gains (mu ~ 1/H,
    # omega ~ 1/H^2): the loops run as tuned-for-K=G chunked loops --
    # identical equations to rx/demod_fast._mm_costas_chunked pair mode
    pair_on = H > 1
    err_sum = jnp.sum(err, axis=0)
    n_valid_g = jnp.sum(valid.astype(jnp.float32), axis=0)
    om_g = np.float32(_MM_OMEGA_GAIN * (_PAIR_OM if pair_on else 1.0))
    mu_g = np.float32(_MM_MU_GAIN * (_PAIR_MU if pair_on else 1.0))
    omega_n = jnp.clip(omega + om_g * err_sum, _OMEGA_MIN, _OMEGA_MAX)
    pos = pos + omega * n_valid_g + mu_g * err_sum
    omega = omega_n

    # ---- Costas (freq frozen across the group) ----
    # ang = (ph2 - pi/4 - cphase) + k * (-pi/4 - cfreq): linear ramp via
    # the rotator recurrence (no per-symbol transcendentals)
    if "costas" in ablate:    # profiling only: no derotation ramp
        sr, si = f0r, f0i
    else:
        ca, sa = rot_ramp(ph2 - np.float32(np.pi / 4.0) - cphase,
                          -np.float32(np.pi / 4.0) - cfreq, G,
                          time_first=True)
        sr = f0r * ca - f0i * sa
        si = f0i * ca + f0r * sa
    cerr = jnp.clip(sgn(sr) * si - sgn(si) * sr, -1.0, 1.0)
    cerr = jnp.where(valid, cerr, 0.0)
    # rail-gated leak: mirrors rx/demod_fast (leak only near the rail, else
    # a sustained FLL residual becomes a standing constellation offset)
    clim = np.float32(_COSTAS_FREQ_LIM_CHUNKED
                      * (_PAIR_CLIM if pair_on else 1.0))
    cerr_sum = jnp.sum(cerr, axis=0)
    leak = jnp.where(jnp.abs(cfreq) > np.float32(0.3) * clim, 0.05, 0.0)
    cfreq = jnp.clip((1.0 - leak) * cfreq
                     + np.float32(_COSTAS_BETA
                                  * (_PAIR_CB if pair_on else 1.0))
                     * cerr_sum,
                     -clim, clim)
    cphase_n = cphase + cfreq * n_valid_g \
        + np.float32(_COSTAS_ALPHA
                     * (_PAIR_CA if pair_on else 1.0)) * cerr_sum
    cphase = cphase_n - 2 * np.float32(np.pi) * jnp.floor(
        (cphase_n + np.float32(np.pi)) / np.float32(2 * np.pi))
    dph2 = jnp.sum(jnp.where(valid, np.float32(np.pi / 4.0), 0.0), axis=0)
    ph2 = jnp.mod(ph2 - dph2, np.float32(2 * np.pi))

    # ---- differential extraction ----
    a = (si < 0).astype(jnp.int32)
    b = (sr < 0).astype(jnp.int32)
    if "extract" in ablate:   # profiling only: minimal slicer
        return (pos, omega, cphase, cfreq, ph2, prev_sym,
                sr, si, a, valid.astype(jnp.int32), sr)
    quad = (a << 1) | (a ^ b)
    prev = jnp.concatenate([prev_sym[None, :], quad[:-1, :]], axis=0)
    diff = (quad - prev) & 3
    # remap {0,1,2,3} -> {0,1,3,2} without a table: swap the two MSB cases
    dibit = jnp.where(diff == 2, 3, jnp.where(diff == 3, 2, diff))
    # carry last valid quadrant
    n_valid = jnp.sum(valid.astype(jnp.float32), axis=0)
    any_valid = n_valid > 0
    # positions after the last valid one keep prev via masking: since invalid
    # slots are a suffix, the last valid quadrant is quad[n_valid-1]; select
    # it with a mask-sum
    kidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
    is_last = (kidx + 1).astype(jnp.float32) == n_valid[None, :]
    last_valid_q = jnp.sum(jnp.where(is_last, quad.astype(jnp.float32), 0.0),
                           axis=0).astype(jnp.int32)
    prev_sym = jnp.where(any_valid, last_valid_q, prev_sym)

    ideal_r = jnp.where(b.astype(bool), np.float32(-0.7071), np.float32(0.7071))
    ideal_i = jnp.where(a.astype(bool), np.float32(-0.7071), np.float32(0.7071))
    # |sin(angle error)| proxy (atan2 is unavailable in Mosaic): equals the
    # angle for small errors, saturating at 1 - the 0.35 rad quality gate
    # (dqpsk_sym_extr.cpp:25) discriminates identically in that regime
    amp = jax.lax.rsqrt(sr * sr + si * si + np.float32(1e-12))
    dist = jnp.abs(ideal_r * si - ideal_i * sr) * amp

    return (pos, omega, cphase, cfreq, ph2, prev_sym,
            sr, si, dibit, valid.astype(jnp.int32), dist)


def _kernel(T, U, pair, ablate, emit_syms, mfr_ref, mfi_ref, st0_ref,
            polys_ref, sel_ref, *refs):
    """Grid: (n_tiles, n_groups // U); U groups unrolled per grid step.

    mfr/mfi:  (margin + T + NTAPS - 1, C) zero-pad + history + stream
    st0:      (8, C) initial state rows [pos, omega, cphase, cfreq, ph2,
              prev_sym, 0, 0]
    polys:    (2, 6, NTAPS) Horner coefficients (bank, dbank)
    outputs:  per-step (U*G, C) blocks + final state (8, C)
    scratch:  state (8, C)
    """
    _, G, *_ = _geom(pair)
    if emit_syms:
        (symr_ref, symi_ref, dib_ref, val_ref, dist_ref, st_out_ref,
         state, wbuf_r, wbuf_i, acc_f0r, acc_f0i, acc_dr, acc_di,
         sem) = refs
    else:
        # lean mode (see mm_costas emit_syms): no sym_re/sym_im arrays
        (dib_ref, val_ref, dist_ref, st_out_ref,
         state, wbuf_r, wbuf_i, acc_f0r, acc_f0i, acc_dr, acc_di,
         sem) = refs
    i = pl.program_id(1)          # grid step (inner, sequential)
    n = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        state[:, :] = st0_ref[:, :]

    pos = state[0, :]
    omega = state[1, :]
    cphase = state[2, :]
    cfreq = state[3, :]
    ph2 = state[4, :]
    prev_sym = state[5, :].astype(jnp.int32)

    for u in range(U):
        (pos, omega, cphase, cfreq, ph2, prev_sym,
         sr, si, dibit, val, dist) = _chunk_body(
            T, pair, ablate, mfr_ref, mfi_ref, polys_ref, sel_ref,
            wbuf_r, wbuf_i, (acc_f0r, acc_f0i, acc_dr, acc_di),
            pos, omega, cphase, cfreq, ph2, prev_sym)
        r0 = u * G
        if emit_syms:
            symr_ref[r0:r0 + G, :] = sr
            symi_ref[r0:r0 + G, :] = si
        dib_ref[r0:r0 + G, :] = dibit
        val_ref[r0:r0 + G, :] = val
        dist_ref[r0:r0 + G, :] = dist

    state[0, :] = pos
    state[1, :] = omega
    state[2, :] = cphase
    state[3, :] = cfreq
    state[4, :] = ph2
    state[5, :] = prev_sym.astype(jnp.float32)

    @pl.when(i == n - 1)
    def _fin():
        st_out_ref[:, :] = state[:, :]
        st_out_ref[0, :] = state[0, :] - T


CHAN_TILE = 128
# groups unrolled per grid step: must divide n_groups; auto-pick caps here.
# Pair mode halves the cap so the unrolled output block stays U*G = 256
# rows -- U=8 x G=64 overflows the 16 MB scoped-VMEM stack (measured:
# 16.27M request at (2048, 4608, U=8 paired))
UNROLL_MAX = 8
UNROLL_MAX_PAIR = 4


@partial(jax.jit, static_argnames=("n_chunks", "interpret", "ablate",
                                   "emit_syms"))
def mm_costas(mfr_ext, mfi_ext, st0, n_chunks: int, interpret=False,
              ablate: tuple = (), emit_syms: bool = True,
              tail_re=None, tail_im=None):
    """mf_ext: (T + NTAPS - 1, C) float pair (history-extended matched-filter
    stream) -- or, when tail_re/tail_im are given, the RAW (T, C) stage-1
    output plus the (NTAPS-1, C) carried tails, assembled here in ONE
    concat with the pads (r5: the separate tail-then-pad concats each
    materialized a full stream copy in HBM).  st0: (8, C) state rows.
    Returns (sym_re, sym_im, dibits, valid, dist) each (n_chunks*K, C) +
    final state (8, C); emit_syms=False (the production superblock/lean
    form) drops the sym_re/sym_im arrays -- the slicer math is unchanged,
    the kernel just never writes the two f32 arrays to HBM (~40 MB/block
    at (2048, 4608) that no scale consumer reads).

    Pair mode engages automatically when n_chunks is even, mirroring
    rx/demod_fast._mm_costas_chunked (the XLA twin the equivalence tests
    compare against)."""
    pair = (n_chunks % 2 == 0)
    H, G, margin, n_off, need_rows, win = _geom(pair)
    # leading pad: d = -margin slip slices; trailing pad: window cuts near
    # the block end never need a base clamp (keeps the barrel range = the
    # cross-channel spread only)
    C = mfr_ext.shape[1]
    zpad = jnp.zeros((margin, C), jnp.float32)
    tpad = jnp.zeros((win, C), jnp.float32)
    if tail_re is not None:
        T = mfr_ext.shape[0]
        mfr_ext = jnp.concatenate([zpad, tail_re, mfr_ext, tpad], axis=0)
        mfi_ext = jnp.concatenate([zpad, tail_im, mfi_ext, tpad], axis=0)
    else:
        T = mfr_ext.shape[0] - (NTAPS - 1)
        mfr_ext = jnp.concatenate([zpad, mfr_ext, tpad], axis=0)
        mfi_ext = jnp.concatenate([zpad, mfi_ext, tpad], axis=0)
    Text = mfr_ext.shape[0]
    Pb, Pd = _bank_polys()
    polys = jnp.asarray(np.stack([Pb, Pd]))      # (2, 6, NTAPS)
    sel = jnp.asarray(_selection_mats(pair))     # (n_off*G, NEED)
    S = n_chunks * K_SYM
    n_groups = n_chunks // H
    out_shape = ([jax.ShapeDtypeStruct((S, C), jnp.float32)] * 2
                 if emit_syms else []) + [
        jax.ShapeDtypeStruct((S, C), jnp.int32),
        jax.ShapeDtypeStruct((S, C), jnp.int32),
        jax.ShapeDtypeStruct((S, C), jnp.float32),
        jax.ShapeDtypeStruct((8, C), jnp.float32),
    ]
    # channel tiling: tiles on the outer grid dim keep the VMEM-resident
    # stream block bounded while groups iterate sequentially per tile
    CT = CHAN_TILE if C % CHAN_TILE == 0 and C > CHAN_TILE else C
    n_tiles = C // CT
    # unroll U groups per grid step (largest divisor of n_groups within the
    # cap): pure regrouping of the sequential chain -- identical math, U x
    # fewer grid steps, so the fixed per-step overhead amortizes
    u_cap = UNROLL_MAX_PAIR if pair else UNROLL_MAX
    U = max(u for u in range(1, min(u_cap, n_groups) + 1)
            if n_groups % u == 0)
    ctile = lambda c, i: (0, c)
    chunk = lambda c, i: (i, c)
    const = lambda c, i: (0, 0, 0)
    n_big = (5 if emit_syms else 3)
    return pl.pallas_call(
        partial(_kernel, T, U, pair, frozenset(ablate), emit_syms),
        grid=(n_tiles, n_groups // U),
        in_specs=[
            pl.BlockSpec((Text, CT), ctile, memory_space=pltpu.VMEM),
            pl.BlockSpec((Text, CT), ctile, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), ctile, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 6, NTAPS), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((int(sel.shape[0]), int(sel.shape[1])),
                         lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((U * G, CT), chunk,
                                memory_space=pltpu.VMEM)] * n_big
        + [pl.BlockSpec((8, CT), ctile, memory_space=pltpu.VMEM)],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((8, CT), jnp.float32),
            pltpu.VMEM((win, 2 * CT) if PACK_RI else (win, CT),
                       jnp.float32),
            pltpu.VMEM((8, 128) if PACK_RI else (win, CT), jnp.float32),
            # NARROW_INTERP accumulators: pl.when branches communicate
            # through refs (values cannot escape a predicated block);
            # dummies when the knob is off -- no dead VMEM reservation
            pltpu.VMEM((G, CT) if NARROW_INTERP else (8, 128),
                       jnp.float32),
            pltpu.VMEM((G, CT) if NARROW_INTERP else (8, 128),
                       jnp.float32),
            pltpu.VMEM((G, CT) if NARROW_INTERP else (8, 128),
                       jnp.float32),
            pltpu.VMEM((G, CT) if NARROW_INTERP else (8, 128),
                       jnp.float32),
            pltpu.SemaphoreType.REGULAR,
        ],
        interpret=interpret,
    )(mfr_ext, mfi_ext, st0, polys, sel)
