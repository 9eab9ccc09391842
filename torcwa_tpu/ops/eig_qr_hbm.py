"""HBM-resident windowed multishift Schur QR (the large-n eigensolver).

The VMEM-resident kernels cap out near n ~ 1300 on a v5e (six resident
(n, n) float32 arrays plus temporaries exceed VMEM).  This kernel keeps
H and Z^T in HBM and runs LAPACK zlaqr5's structure shaped to this
runtime:

* per sweep: the diagonal band (diag + subdiagonal) is refreshed from
  HBM by 256x256 diagonal-tile DMAs into a (1, T, 128) band layout
  (dynamic lane-dim vector writes are not lowerable; size-1 sublane
  writes are), and the deflation window [lo, hi] is computed from the
  band with the same LAPACK thresholds as the VMEM kernels;
* shifts: an (m+8) x 256 block containing the trailing m x m submatrix
  is DMA'd in (8-/128-aligned corner), the m x m block extracted with
  one-hot selection matmuls, its eigenvalues computed by the in-kernel
  mini QR (shared with eig_qr_pallas_ms) and sorted by distance to
  H[hi, hi];
* chase: m spacing-2 bulges run through a sequence of overlapping
  wb x wb diagonal windows (128-aligned starts).  Inside a window all
  state is VMEM: row-pair rotations on the block B, accumulation into
  the window-local U, next-rotation sources from the deferred invariant
  M|window = B U^T.  Parked bulge bumps (second-subdiagonal entries at
  the window exit rows) survive the Hessenberg junk mask so they resume
  in the next window;
* window epilogue: B <- B U^T in VMEM, then the off-window row segment
  H[a:a+wb, a+wb:] <- conj(U) @ (tiles), the column segment
  H[0:a, a:a+wb] <- (tiles) @ U^T, and Z^T[a:a+wb, :] <- U @ (tiles)
  stream through DMA'd slabs.  There is NO global prefix GEMM: per-sweep
  work is O(n^2) streamed elements + O(wb n^2 / stride) MXU flops,
  amortized over the sweep's m shifts.

Everything in the kernel is unit-batch 3-D — (1, s, l) tiles, axis-1 /
axis-2 keepdims reductions, scalars only by full-reducing a (1, 1, 1) —
because those are the only vector shapes Mosaic reliably lowers on this
runtime (2-D (1, m) reductions fail with "Unsupported output implicit
dimension").  Sublane shifts of the band go through one-hot matmuls for
the same reason.

The matrix is padded to n_pad (multiple of 256) with isolated diagonal
entries (dead subdiagonals -> they deflate instantly) and the ALLOCATION
to n_arr = n_pad + wb + 128 so edge tiles may read/write junk in the
margin without bounds issues.

Reference baseline: cuSOLVER/MAGMA zgeev (torch.linalg.eig) behind
/root/reference/torcwa/rcwa.py:1236; the reference's recorded number at
order-20 scale is 156 s/solve on CPU (SURVEY §6).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .eig_qr_pallas_ms import _mini_eigvals, _givens, _wilkinson

__all__ = ['schur_qr_hbm']

_F32EPS = 1.1920929e-07
_SMLNUM = 1e-31

# AED window: KW window eigenvalues per sweep; the (KW+1)-wide spike
# block is padded in-kernel to KP = kw + 8 (7 sublane-alignment slack)
_AED_KW = 64

# interp-mode debugging: print per-sweep (lo, hi) and the sorted shifts
_DEBUG_PRINT = False

# zlaqr0's NIBBLE: when AED alone deflated more than this percentage of
# the window, skip the sweep's bulge chase entirely and re-AED — the
# chase is the per-sweep cost driver (span x m serial rotations) and
# back-to-back window Schurs often sustain the deflation rate without it
_NIBBLE = 14

# dlaqr5-style local chase block: rotations are chased inside an
# (LS, LS) block D with an (LS, LS) local accumulator G, then merged
# into the window (B, U) by one-hot GEMMs every ~LS-2m steps.  Each
# rotation's row ops then span LS lanes (one vreg) instead of wb — the
# chase is per-rotation width-bound (r5 chip A/B wb 512/384/256), so
# this decouples the per-rotation cost from the window width.
_LS_CHASE = 128


def _cdma(src_r, src_i, dst_r, dst_i, sem):
    cp = pltpu.make_async_copy(src_r, dst_r, sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(src_i, dst_i, sem)
    cp.start()
    cp.wait()


def _dotg(a, b, dims, prec):
    return lax.dot_general(a, b, (dims, ((0,), (0,))), precision=prec,
                           preferred_element_type=jnp.float32)


def _s11(x):
    """(1, s, l) -> (1, 1, 1) sum via staged single-axis reductions."""
    return jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=2, keepdims=True)


def _m11(x):
    """(1, s, l) -> (1, 1, 1) max via staged single-axis reductions."""
    return jnp.max(jnp.max(x, axis=1, keepdims=True), axis=2, keepdims=True)


def _mini_schur(Br, Bi, kw, max_sweeps):
    """Masked single-shift Schur QR of ONE (1, kw, kw) Hessenberg pair,
    accumulating the transform (the AED window factorization).

    Returns (Tr, Ti, Ur, Ui, hi_m) where U = conj(Q) (the same
    accumulation convention as the chase windows: row rotations applied
    as u_k <- c u_k + conj(s) u_{k+1}), so T = Q W Q^H and the AED spike
    is beta * conj(U[:, 0]).  ``hi_m == 0`` iff fully converged; lanes
    >= hi_m of T are converged eigenvalues.

    Structure follows eig_qr_pallas_ms._mini_eigvals but runs a
    data-dependent while loop (early exit on convergence) and carries U.
    """
    rows = lax.broadcasted_iota(jnp.int32, (1, kw, kw), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, kw, kw), 2)
    iota_k = lax.broadcasted_iota(jnp.int32, (1, 1, kw), 2)

    def diag_vec(Xr, Xi, off):
        msk = rows == (cols - off)
        return (jnp.sum(jnp.where(msk, Xr, 0.), axis=1, keepdims=True),
                jnp.sum(jnp.where(msk, Xi, 0.), axis=1, keepdims=True))

    def at_lane(v, j):
        return jnp.sum(jnp.where(iota_k == j, v, 0.), axis=2, keepdims=True)

    def body(state):
        Br, Bi, Ur, Ui, hi, it = state
        dr, di = diag_vec(Br, Bi, 0)
        d = jnp.sqrt(dr * dr + di * di)
        sr_, si_ = diag_vec(Br, Bi, -1)
        sub2 = sr_ * sr_ + si_ * si_
        dshift = jnp.where(iota_k == kw - 1, 0.,
                           pltpu.roll(d, shift=kw - 1, axis=2))
        thresh = jnp.maximum(_F32EPS * (d + dshift), _SMLNUM)
        alive = sub2 > thresh * thresh
        lane = iota_k + 1
        hi = jnp.max(jnp.where((lane <= hi) & alive, lane, 0),
                     axis=2, keepdims=True)
        alive_prev = pltpu.roll(alive.astype(jnp.float32),
                                shift=1, axis=2) > 0.5
        lo = jnp.max(jnp.where((iota_k <= hi) &
                               ((iota_k == 0) | ~alive_prev),
                               iota_k, 0), axis=2, keepdims=True)

        # Wilkinson shift from the trailing 2x2 of [lo, hi]
        him1 = jnp.maximum(hi - 1, 0)
        ar = at_lane(dr, him1)
        ai = at_lane(di, him1)
        dr_ = at_lane(dr, hi)
        di_ = at_lane(di, hi)
        supr, supi = diag_vec(Br, Bi, 1)
        br = at_lane(supr, hi)
        bi = at_lane(supi, hi)
        cr = at_lane(sr_, him1)
        ci = at_lane(si_, him1)
        l1r, l1i, l2r, l2i = _wilkinson(ar, ai, br, bi, cr, ci, dr_, di_)
        pick1 = ((l1r - dr_) ** 2 + (l1i - di_) ** 2 <
                 (l2r - dr_) ** 2 + (l2i - di_) ** 2)
        sgr = jnp.where(pick1, l1r, l2r)
        sgi = jnp.where(pick1, l1i, l2i)
        exc = (it % 13) == 12
        sgr = jnp.where(exc, dr_ + 0.75 * jnp.sqrt(cr * cr + ci * ci), sgr)
        sgi = jnp.where(exc, di_, sgi)

        x0r = at_lane(dr, lo) - sgr
        x0i = at_lane(di, lo) - sgi
        y0r = at_lane(sr_, lo)
        y0i = at_lane(si_, lo)

        def step(k, carry):
            Br, Bi, Ur, Ui, xr, xi, yr, yi = carry
            active = (k >= lo) & (k < hi)
            c, sr, si = _givens(xr, xi, yr, yi, active)
            is0 = rows == k
            is1 = rows == (k + 1)
            up_r = pltpu.roll(Br, shift=kw - 1, axis=1)
            up_i = pltpu.roll(Bi, shift=kw - 1, axis=1)
            dn_r = pltpu.roll(Br, shift=1, axis=1)
            dn_i = pltpu.roll(Bi, shift=1, axis=1)
            nk_r = c * Br + (sr * up_r - si * up_i)
            nk_i = c * Bi + (sr * up_i + si * up_r)
            n1_r = c * Br - (sr * dn_r + si * dn_i)
            n1_i = c * Bi - (sr * dn_i - si * dn_r)
            zap = is1 & (cols == (k - 1)) & active
            Br = jnp.where(is0, nk_r, jnp.where(is1, n1_r, Br))
            Bi = jnp.where(is0, nk_i, jnp.where(is1, n1_i, Bi))
            Br = jnp.where(zap, 0., Br)
            Bi = jnp.where(zap, 0., Bi)

            # U <- conj(G) U (chase convention: U ends as conj(Q))
            uu_r = pltpu.roll(Ur, shift=kw - 1, axis=1)
            uu_i = pltpu.roll(Ui, shift=kw - 1, axis=1)
            ud_r = pltpu.roll(Ur, shift=1, axis=1)
            ud_i = pltpu.roll(Ui, shift=1, axis=1)
            uk_r = c * Ur + (sr * uu_r + si * uu_i)
            uk_i = c * Ui + (sr * uu_i - si * uu_r)
            u1_r = c * Ur - (sr * ud_r - si * ud_i)
            u1_i = c * Ui - (sr * ud_i + si * ud_r)
            Ur = jnp.where(is0, uk_r, jnp.where(is1, u1_r, Ur))
            Ui = jnp.where(is0, uk_i, jnp.where(is1, u1_i, Ui))

            jc0 = cols == k
            jc1 = cols == (k + 1)
            lf_r = pltpu.roll(Br, shift=kw - 1, axis=2)
            lf_i = pltpu.roll(Bi, shift=kw - 1, axis=2)
            rt_r = pltpu.roll(Br, shift=1, axis=2)
            rt_i = pltpu.roll(Bi, shift=1, axis=2)
            mk_r = c * Br + (sr * lf_r + si * lf_i)
            mk_i = c * Bi + (sr * lf_i - si * lf_r)
            m1_r = c * Br - (sr * rt_r - si * rt_i)
            m1_i = c * Bi - (sr * rt_i + si * rt_r)
            Br = jnp.where(jc0, mk_r, jnp.where(jc1, m1_r, Br))
            Bi = jnp.where(jc0, mk_i, jnp.where(jc1, m1_i, Bi))

            colk_r = jnp.sum(jnp.where(jc0, Br, 0.), axis=2, keepdims=True)
            colk_i = jnp.sum(jnp.where(jc0, Bi, 0.), axis=2, keepdims=True)
            ridx = lax.broadcasted_iota(jnp.int32, (1, kw, 1), 1)
            xn_r = jnp.sum(jnp.where(ridx == k + 1, colk_r, 0.),
                           axis=1, keepdims=True)
            xn_i = jnp.sum(jnp.where(ridx == k + 1, colk_i, 0.),
                           axis=1, keepdims=True)
            y2_r = jnp.sum(jnp.where(ridx == k + 2, colk_r, 0.),
                           axis=1, keepdims=True)
            y2_i = jnp.sum(jnp.where(ridx == k + 2, colk_i, 0.),
                           axis=1, keepdims=True)
            nxt_ok = (k + 2) <= hi
            yn_r = jnp.where(nxt_ok, y2_r, 0.)
            yn_i = jnp.where(nxt_ok, y2_i, 0.)
            xr = jnp.where(active, xn_r, xr)
            xi = jnp.where(active, xn_i, xi)
            yr = jnp.where(active, yn_r, yr)
            yi = jnp.where(active, yn_i, yi)
            return (Br, Bi, Ur, Ui, xr, xi, yr, yi)

        # chase only the live span [lo, hi): traced bounds lower to a
        # while loop (same pattern as the acc kernel's step loop) and cut
        # the serial step count ~2-3x across the window's convergence
        Br, Bi, Ur, Ui, _, _, _, _ = lax.fori_loop(
            jnp.max(lo), jnp.minimum(jnp.max(hi), kw - 1), step,
            (Br, Bi, Ur, Ui, x0r, x0i, y0r, y0i))
        return (Br, Bi, Ur, Ui, hi, it + 1)

    def cond(state):
        hi, it = state[4], state[5]
        return (jnp.max(hi) > 0) & (it < max_sweeps)

    hi0 = jnp.full((1, 1, 1), kw - 1, jnp.int32)
    Ur0 = (rows == cols).astype(jnp.float32)
    Ui0 = jnp.zeros((1, kw, kw), jnp.float32)
    Br, Bi, Ur, Ui, hi_f, _ = lax.while_loop(
        cond, body,
        (Br, Bi, Ur0, Ui0, hi0, jnp.int32(0)))
    return Br, Bi, Ur, Ui, hi_f


def _kernel_hbm(hr_in, hi_in, ztr_in, zti_in,
                hr, hi_, ztr, zti, stat_ref,
                B_r, B_i, U_r, U_i, S_r, S_i, T_r, T_i, K_r, K_i,
                P_r, P_i, S2_r, S2_i, T2_r, T2_i,
                dg_r, dg_i, sb_r, sb_i, D_r, D_i, G_r, G_i, sem,
                *, n: int, m: int, wb: int, max_sweeps: int, aed: bool,
                kw: int = _AED_KW, nibble: int = _NIBBLE,
                defl_mult: float = 1.0, local_chase: bool = True):
    nt = n // 128                       # band tiles
    # window advance: the resumed chase (tcur = a + wb - 2) needs its
    # trailing bulge row (tcur - 2(m-1)) inside the next window
    stride = wb - ((2 * m + 127) // 128) * 128
    i2r = lax.broadcasted_iota(jnp.int32, (1, wb, wb), 1)
    i2c = lax.broadcasted_iota(jnp.int32, (1, wb, wb), 2)
    iota_m = lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    bt_r = lax.broadcasted_iota(jnp.int32, (1, nt, 128), 1)
    bt_l = lax.broadcasted_iota(jnp.int32, (1, nt, 128), 2)
    gidx = bt_r * 128 + bt_l            # global index per band slot
    # one-hot "next tile" / "previous tile" sublane shifts of the band
    # (Mosaic cannot roll the sublane axis; a selection matmul can)
    sh_r = lax.broadcasted_iota(jnp.int32, (1, nt, nt), 1)
    sh_c = lax.broadcasted_iota(jnp.int32, (1, nt, nt), 2)
    next_tile = (sh_c == sh_r + 1).astype(jnp.float32)   # row t <- row t+1
    prev_tile = (sh_c == sh_r - 1).astype(jnp.float32)   # row t <- row t-1
    dn_shift = ((2,), (1,))
    prec = lax.Precision.HIGHEST

    def at_lane_m(v, j):
        return jnp.sum(jnp.where(iota_m == j, v, 0.), axis=2, keepdims=True)

    # ---- copy inputs -> outputs (whole-array HBM->HBM DMA) ----------------
    _cdma(hr_in, hi_in, hr, hi_, sem)
    _cdma(ztr_in, zti_in, ztr, zti, sem)

    def refresh_band(t, carry):
        d0 = pl.multiple_of(t * 128, 128)
        _cdma(hr.at[:, pl.ds(d0, 256), pl.ds(d0, 256)],
              hi_.at[:, pl.ds(d0, 256), pl.ds(d0, 256)], K_r, K_i, sem)
        kr = K_r[:]
        ki = K_i[:]
        r256 = lax.broadcasted_iota(jnp.int32, (1, 256, 256), 1)
        c256 = lax.broadcasted_iota(jnp.int32, (1, 256, 256), 2)
        mdiag = (r256 == c256) & (r256 < 128)
        msub = (r256 == c256 + 1) & (c256 < 128)
        dgr = jnp.sum(jnp.where(mdiag, kr, 0.), axis=1, keepdims=True)
        dgi = jnp.sum(jnp.where(mdiag, ki, 0.), axis=1, keepdims=True)
        sbr = jnp.sum(jnp.where(msub, kr, 0.), axis=1, keepdims=True)
        sbi = jnp.sum(jnp.where(msub, ki, 0.), axis=1, keepdims=True)
        dg_r[:, pl.ds(t, 1), :] = dgr[:, :, :128]
        dg_i[:, pl.ds(t, 1), :] = dgi[:, :, :128]
        sb_r[:, pl.ds(t, 1), :] = sbr[:, :, :128]
        sb_i[:, pl.ds(t, 1), :] = sbi[:, :, :128]
        return carry

    # pool size: the m-block mini QR — a 2m pool cuts sweeps ~15% but
    # costs 2x the serial mini budget, a net loss on chip; keep kk = m
    kk = m
    iota_kk = lax.broadcasted_iota(jnp.int32, (1, 1, kk), 2)

    def sweep(state):
        (hi_top, it, stall, aed_tot, skip_tot, multi_tot,
         prev_nib, prev_tb) = state

        # a nibbled sweep (AED only, chase skipped) modifies H only in
        # [c128a, c128a+256) — diag/subdiag outside stay valid from the
        # last refresh, so only the two tiles covering that span need a
        # re-read; chase sweeps rewrite the whole band (full refresh)
        tb = jnp.where(prev_nib > 0, prev_tb, 0)
        te = jnp.where(prev_nib > 0, jnp.minimum(prev_tb + 2, nt), nt)
        lax.fori_loop(tb, te, refresh_band, 0)
        dgr = dg_r[:]
        dgi = dg_i[:]
        sbr = sb_r[:]
        sbi = sb_i[:]
        d = jnp.sqrt(dgr * dgr + dgi * dgi)          # (1, nt, 128)
        sub2 = sbr * sbr + sbi * sbi
        # d[g+1]: lane roll with tile-boundary carry from the next tile
        lr_ = pltpu.roll(d, shift=127, axis=2)
        d_nt = lax.dot_general(next_tile, d, (dn_shift, ((0,), (0,))),
                               precision=prec,
                               preferred_element_type=jnp.float32)
        l2_ = pltpu.roll(d_nt, shift=127, axis=2)
        dnext = jnp.where(bt_l == 127, l2_, lr_)
        thresh = jnp.maximum(defl_mult * _F32EPS * (d + dnext), _SMLNUM)
        alive = (sub2 > thresh * thresh) & (gidx < n - 1)
        g1 = gidx + 1
        hi = jnp.max(_m11(jnp.where((g1 <= hi_top) & alive, g1, 0)))
        # alive[g-1]: lane roll with carry from the previous tile
        af = alive.astype(jnp.float32)
        ll = pltpu.roll(af, shift=1, axis=2)
        a_pt = lax.dot_general(prev_tile, af, (dn_shift, ((0,), (0,))),
                               precision=prec,
                               preferred_element_type=jnp.float32)
        sl = pltpu.roll(a_pt, shift=1, axis=2)
        aprev = jnp.where(bt_l == 0, sl, ll) > 0.5
        lo = jnp.max(_m11(jnp.where((gidx <= hi) & ((gidx == 0) | ~aprev),
                                    gidx, 0)))
        # diagnostic: does a SECOND alive run exist above the active
        # block?  (precondition for a multi-run chase / window split to
        # pay off — the batched kernel's _NRUNS trick)
        second_run = jnp.max(_m11(jnp.where(
            (gidx < lo - 1) & alive, jnp.int32(1), jnp.int32(0))))

        exc = stall >= 13
        hi_band = hi
        if aed:
            # ---- AED: Schur the trailing KW window, deflate the spike,
            # shifts = undeflated window eigenvalues (zlaqr3 structure;
            # numpy prototype scripts/aed_model.py, ~10x fewer sweeps) ----
            KW, KB, KP = kw, kw + 1, kw + 8
            trows = kw + 16
            iota_kw = lax.broadcasted_iota(jnp.int32, (1, 1, KW), 2)
            s = jnp.maximum(hi - KW + 1, lo + 1)
            r8 = pl.multiple_of(((s - 1) // 8) * 8, 8)
            c128a = pl.multiple_of(((s - 1) // 128) * 128, 128)
            o8 = (s - 1) - r8
            oc = (s - 1) - c128a
            _cdma(hr.at[:, pl.ds(r8, trows), pl.ds(c128a, 256)],
                  hi_.at[:, pl.ds(r8, trows), pl.ds(c128a, 256)],
                  T_r, T_i, sem)
            Ablk_r = T_r[:]
            Ablk_i = T_i[:]
            # window W = H[s:s+KW, s:s+KW] via one-hot selection matmuls
            rw_q = lax.broadcasted_iota(jnp.int32, (1, KW, trows), 1)
            rw_r = lax.broadcasted_iota(jnp.int32, (1, KW, trows), 2)
            Rw = (rw_r == (o8 + 1 + rw_q)).astype(jnp.float32)
            cw_r = lax.broadcasted_iota(jnp.int32, (1, 256, KW), 1)
            cw_q = lax.broadcasted_iota(jnp.int32, (1, 256, KW), 2)
            Cw = (cw_r == (oc + 1 + cw_q)).astype(jnp.float32)
            Wr0 = _dotg(_dotg(Rw, Ablk_r, ((2,), (1,)), prec), Cw,
                        ((2,), (1,)), prec)
            Wi0 = _dotg(_dotg(Rw, Ablk_i, ((2,), (1,)), prec), Cw,
                        ((2,), (1,)), prec)
            rA = lax.broadcasted_iota(jnp.int32, (1, trows, 256), 1)
            cA = lax.broadcasted_iota(jnp.int32, (1, trows, 256), 2)
            bsel = (rA == o8 + 1) & (cA == oc)
            beta_r = _s11(jnp.where(bsel, Ablk_r, 0.))
            beta_i = _s11(jnp.where(bsel, Ablk_i, 0.))
            smax = jnp.maximum(_m11(jnp.sqrt(Wr0 * Wr0 + Wi0 * Wi0)),
                               _SMLNUM)

            Tw_r, Tw_i, Uw_r, Uw_i, hi_m = _mini_schur(
                Wr0, Wi0, KW, 3 * KW + 40)

            # spike = beta * conj(U[:, 0])  (sublane orientation)
            roww = lax.broadcasted_iota(jnp.int32, (1, KW, KW), 1)
            colw = lax.broadcasted_iota(jnp.int32, (1, KW, KW), 2)
            u0_r = jnp.sum(jnp.where(colw == 0, Uw_r, 0.),
                           axis=2, keepdims=True)
            u0_i = jnp.sum(jnp.where(colw == 0, Uw_i, 0.),
                           axis=2, keepdims=True)
            sp_r = beta_r * u0_r + beta_i * u0_i
            sp_i = beta_i * u0_r - beta_r * u0_i
            sp_abs = jnp.sqrt(sp_r * sp_r + sp_i * sp_i)       # (1, KW, 1)
            tds_r = jnp.sum(jnp.where(roww == colw, Tw_r, 0.),
                            axis=2, keepdims=True)             # (1, KW, 1)
            tds_i = jnp.sum(jnp.where(roww == colw, Tw_i, 0.),
                            axis=2, keepdims=True)
            td_abs = jnp.sqrt(tds_r * tds_r + tds_i * tds_i)
            rk = lax.broadcasted_iota(jnp.int32, (1, KW, 1), 1)
            # only mini-converged lanes (>= hi_m) are eligible; ku = end of
            # the undeflated part = 1 + last non-deflatable lane
            deflatable = ((sp_abs <= defl_mult * _F32EPS
                           * jnp.maximum(td_abs, smax))
                          & (rk >= hi_m))
            ku = jnp.max(jnp.where(~deflatable, rk + 1, 0))
            hi_new = s + ku - 1

            # ---- shifts: m undeflated window eigenvalues closest to the
            # new corner T[ku-1, ku-1] ----------------------------------
            td_r = jnp.sum(jnp.where(roww == colw, Tw_r, 0.),
                           axis=1, keepdims=True)              # (1, 1, KW)
            td_i = jnp.sum(jnp.where(roww == colw, Tw_i, 0.),
                           axis=1, keepdims=True)
            kum1 = jnp.maximum(ku - 1, 0)
            cn_r = jnp.sum(jnp.where(iota_kw == kum1, td_r, 0.),
                           axis=2, keepdims=True)
            cn_i = jnp.sum(jnp.where(iota_kw == kum1, td_i, 0.),
                           axis=2, keepdims=True)
            dist = (td_r - cn_r) ** 2 + (td_i - cn_i) ** 2
            big = jnp.float32(3.4e38)
            dist = jnp.where(iota_kw < ku, dist, big)
            remaining = jnp.ones((1, 1, KW), bool)
            out_r = jnp.zeros((1, 1, m), jnp.float32)
            out_i = jnp.zeros((1, 1, m), jnp.float32)
            for i_s in range(m):
                dmin = jnp.min(jnp.where(remaining, dist, big),
                               axis=2, keepdims=True)
                hit = remaining & (dist <= dmin)
                lane_idx = jnp.min(jnp.where(hit, iota_kw, KW),
                                   axis=2, keepdims=True)
                onehot = iota_kw == lane_idx
                val_r = jnp.sum(jnp.where(onehot, td_r, 0.),
                                axis=2, keepdims=True)
                val_i = jnp.sum(jnp.where(onehot, td_i, 0.),
                                axis=2, keepdims=True)
                out_r = jnp.where(iota_m == i_s, val_r, out_r)
                out_i = jnp.where(iota_m == i_s, val_i, out_i)
                remaining = remaining & ~onehot
            # exceptional sweep: perturbed trailing undeflated diagonals
            pos_l = jnp.clip(ku - m + iota_m, 0, kum1)         # (1, 1, m)
            l_iota = lax.broadcasted_iota(jnp.int32, (1, KW, m), 1)
            gsel = (l_iota == pos_l).astype(jnp.float32)
            exd_r = _dotg(td_r, gsel, ((2,), (1,)), prec)      # (1, 1, m)
            exd_i = _dotg(td_i, gsel, ((2,), (1,)), prec)
            spa_l = _dotg(sp_abs, gsel, ((1,), (1,)), prec)
            shr = jnp.where(exc, exd_r + 0.75 * spa_l, out_r)
            shi = jnp.where(exc, exd_i, out_i)

            # ---- compose the border transform L = Qb . diag(1, conj(Q))
            # (stored as the actual complex left-multiplier pair) --------
            r72 = lax.broadcasted_iota(jnp.int32, (1, KP, KP), 1)
            c72 = lax.broadcasted_iota(jnp.int32, (1, KP, KP), 2)
            s1_r = lax.broadcasted_iota(jnp.int32, (1, KP, KW), 1)
            s1_l = lax.broadcasted_iota(jnp.int32, (1, KP, KW), 2)
            S1T = (s1_r == s1_l + 1).astype(jnp.float32)

            def emb(X):
                return _dotg(_dotg(S1T, X, ((2,), (1,)), prec), S1T,
                             ((2,), (2,)), prec)

            idpad = ((r72 == c72) & ((r72 == 0) | (r72 >= KB))
                     ).astype(jnp.float32)
            # L1 = diag(1, Q), Q = conj(U)
            Lr_ = emb(Uw_r) + idpad
            Li_ = -emb(Uw_i)
            # A' = [[*, *], [spike_masked, T]]; row 0 never feeds a
            # reflector (v starts at row j+2 >= 2), so it can stay zero
            spm_r = jnp.where(deflatable, 0., sp_r)
            spm_i = jnp.where(deflatable, 0., sp_i)
            spe_r = _dotg(S1T, spm_r, ((2,), (1,)), prec)      # (1, KP, 1)
            spe_i = _dotg(S1T, spm_i, ((2,), (1,)), prec)
            apad = ((r72 == c72) & (r72 >= KB)).astype(jnp.float32)
            Ap_r = emb(Tw_r) + jnp.where(c72 == 0, spe_r, 0.) + apad
            Ap_i = emb(Tw_i) + jnp.where(c72 == 0, spe_i, 0.)

            # masked Householder re-Hessenberg of the (ku+1) active block;
            # reflectors fix e0, so the accumulated L keeps row/col 0 = e0
            r72_1 = lax.broadcasted_iota(jnp.int32, (1, KP, 1), 1)
            eye72 = (r72 == c72).astype(jnp.float32)
            tiny = jnp.float32(1e-30)

            def hh_body(j, carry):
                Ar_, Ai_, Lr_, Li_ = carry
                cj = c72 == j
                colr = jnp.sum(jnp.where(cj, Ar_, 0.),
                               axis=2, keepdims=True)
                coli = jnp.sum(jnp.where(cj, Ai_, 0.),
                               axis=2, keepdims=True)
                maskv = (r72_1 >= j + 2) & (r72_1 <= ku)
                x1r = _s11(jnp.where(r72_1 == j + 1, colr, 0.))
                x1i = _s11(jnp.where(r72_1 == j + 1, coli, 0.))
                sigma = _s11(jnp.where(maskv,
                                       colr * colr + coli * coli, 0.))
                xn1 = jnp.sqrt(x1r * x1r + x1i * x1i)
                safe1 = jnp.where(xn1 > 0, xn1, 1.)
                phr = jnp.where(xn1 > 0, x1r / safe1, 1.)
                phi = jnp.where(xn1 > 0, x1i / safe1, 0.)
                normx = jnp.sqrt(sigma + xn1 * xn1)
                vhr = x1r + phr * normx     # v_head = x1 - alpha
                vhi = x1i + phi * normx     # alpha = -phase * ||x||
                vr = (jnp.where(maskv, colr, 0.)
                      + jnp.where(r72_1 == j + 1, vhr, 0.))
                vi = (jnp.where(maskv, coli, 0.)
                      + jnp.where(r72_1 == j + 1, vhi, 0.))
                vn2 = 2. * (sigma + xn1 * xn1 + normx * xn1)
                tau = jnp.where(sigma > 0,
                                2. / jnp.maximum(vn2, tiny), 0.)
                vTr = _dotg(vr, eye72, ((1,), (1,)), prec)     # (1, 1, KP)
                vTi = _dotg(vi, eye72, ((1,), (1,)), prec)
                # left: X <- X - tau v (v^H X)
                wr_ = jnp.sum(vr * Ar_ + vi * Ai_, axis=1, keepdims=True)
                wi_ = jnp.sum(vr * Ai_ - vi * Ar_, axis=1, keepdims=True)
                Ar_ = Ar_ - tau * (vr * wr_ - vi * wi_)
                Ai_ = Ai_ - tau * (vr * wi_ + vi * wr_)
                # right: X <- X - tau (X v) v^H
                ur_ = jnp.sum(Ar_ * vTr - Ai_ * vTi,
                              axis=2, keepdims=True)
                ui_ = jnp.sum(Ar_ * vTi + Ai_ * vTr,
                              axis=2, keepdims=True)
                Ar_ = Ar_ - tau * (ur_ * vTr + ui_ * vTi)
                Ai_ = Ai_ - tau * (ui_ * vTr - ur_ * vTi)
                # L <- L - tau v (v^H L)
                lwr = jnp.sum(vr * Lr_ + vi * Li_, axis=1, keepdims=True)
                lwi = jnp.sum(vr * Li_ - vi * Lr_, axis=1, keepdims=True)
                Lr_ = Lr_ - tau * (vr * lwr - vi * lwi)
                Li_ = Li_ - tau * (vr * lwi + vi * lwr)
                return (Ar_, Ai_, Lr_, Li_)

            _, _, Lr_, Li_ = lax.fori_loop(0, KW - 1, hh_body,
                                           (Ap_r, Ap_i, Lr_, Li_))

            do_apply = hi_new < hi

            @pl.when(do_apply)
            def _apply():
                # embed L at offset oc into a (256, 256) identity; all
                # streamed updates then run on 128-aligned offsets
                e_r = lax.broadcasted_iota(jnp.int32, (1, 256, KP), 1)
                e_k = lax.broadcasted_iota(jnp.int32, (1, 256, KP), 2)
                Sel = (e_r == (oc + e_k)).astype(jnp.float32)
                r256 = lax.broadcasted_iota(jnp.int32, (1, 256, 256), 1)
                c256 = lax.broadcasted_iota(jnp.int32, (1, 256, 256), 2)
                outside = ((r256 == c256)
                           & ((r256 < oc) | (r256 >= oc + KP))
                           ).astype(jnp.float32)
                Pe_r = _dotg(_dotg(Sel, Lr_, ((2,), (1,)), prec), Sel,
                             ((2,), (2,)), prec) + outside
                Pe_i = _dotg(_dotg(Sel, Li_, ((2,), (1,)), prec), Sel,
                             ((2,), (2,)), prec)
                # diag block: B <- P B P^H + enforce the known structure
                _cdma(hr.at[:, pl.ds(c128a, 256), pl.ds(c128a, 256)],
                      hi_.at[:, pl.ds(c128a, 256), pl.ds(c128a, 256)],
                      K_r, K_i, sem)
                Bd_r = K_r[:]
                Bd_i = K_i[:]
                M1r = (_dotg(Pe_r, Bd_r, ((2,), (1,)), prec)
                       - _dotg(Pe_i, Bd_i, ((2,), (1,)), prec))
                M1i = (_dotg(Pe_r, Bd_i, ((2,), (1,)), prec)
                       + _dotg(Pe_i, Bd_r, ((2,), (1,)), prec))
                Od_r = (_dotg(M1r, Pe_r, ((2,), (2,)), prec)
                        + _dotg(M1i, Pe_i, ((2,), (2,)), prec))
                Od_i = (_dotg(M1i, Pe_r, ((2,), (2,)), prec)
                        - _dotg(M1r, Pe_i, ((2,), (2,)), prec))
                inw_r = (r256 >= oc) & (r256 < oc + KB)
                inw_c = (c256 >= oc) & (c256 < oc + KB)
                below = inw_r & inw_c & (c256 <= r256 - 2)
                subdead = (inw_r & inw_c & (c256 == r256 - 1)
                           & (r256 >= oc + 1 + ku))
                K_r[:] = jnp.where(below | subdead, 0., Od_r)
                K_i[:] = jnp.where(below | subdead, 0., Od_i)
                _cdma(K_r, K_i,
                      hr.at[:, pl.ds(c128a, 256), pl.ds(c128a, 256)],
                      hi_.at[:, pl.ds(c128a, 256), pl.ds(c128a, 256)],
                      sem)

                # right slabs: rows [c128a, +256) x cols [c128a+256, n)
                nr_ab = (n - (c128a + 256) + 511) // 512

                def ra_body(j, _):
                    c0 = pl.multiple_of(c128a + 256 + j * 512, 128)
                    _cdma(hr.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          hi_.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          S2_r, S2_i, sem)
                    Sr = S2_r[:]
                    Si = S2_i[:]
                    S2_r[:] = (_dotg(Pe_r, Sr, ((2,), (1,)), prec)
                               - _dotg(Pe_i, Si, ((2,), (1,)), prec))
                    S2_i[:] = (_dotg(Pe_r, Si, ((2,), (1,)), prec)
                               + _dotg(Pe_i, Sr, ((2,), (1,)), prec))
                    _cdma(S2_r, S2_i,
                          hr.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          hi_.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          sem)
                    return 0

                lax.fori_loop(0, nr_ab, ra_body, 0)

                # top slabs: rows [0, c128a) x cols [c128a, +256)
                def ta_body(j, _):
                    r0 = pl.multiple_of(j * 128, 8)
                    _cdma(hr.at[:, pl.ds(r0, 128), pl.ds(c128a, 256)],
                          hi_.at[:, pl.ds(r0, 128), pl.ds(c128a, 256)],
                          T2_r, T2_i, sem)
                    Sr = T2_r[:]
                    Si = T2_i[:]
                    T2_r[:] = (_dotg(Sr, Pe_r, ((2,), (2,)), prec)
                               + _dotg(Si, Pe_i, ((2,), (2,)), prec))
                    T2_i[:] = (_dotg(Si, Pe_r, ((2,), (2,)), prec)
                               - _dotg(Sr, Pe_i, ((2,), (2,)), prec))
                    _cdma(T2_r, T2_i,
                          hr.at[:, pl.ds(r0, 128), pl.ds(c128a, 256)],
                          hi_.at[:, pl.ds(r0, 128), pl.ds(c128a, 256)],
                          sem)
                    return 0

                lax.fori_loop(0, c128a // 128, ta_body, 0)

                # Z^T rows [c128a, +256): <- conj(P) @ slab
                def za_body(j, _):
                    c0 = pl.multiple_of(j * 512, 128)
                    _cdma(ztr.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          zti.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          S2_r, S2_i, sem)
                    Sr = S2_r[:]
                    Si = S2_i[:]
                    S2_r[:] = (_dotg(Pe_r, Sr, ((2,), (1,)), prec)
                               + _dotg(Pe_i, Si, ((2,), (1,)), prec))
                    S2_i[:] = (_dotg(Pe_r, Si, ((2,), (1,)), prec)
                               - _dotg(Pe_i, Sr, ((2,), (1,)), prec))
                    _cdma(S2_r, S2_i,
                          ztr.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          zti.at[:, pl.ds(c128a, 256), pl.ds(c0, 512)],
                          sem)
                    return 0

                lax.fori_loop(0, (n + 511) // 512, za_body, 0)

            hi = hi_new
        else:
            # ---- shifts: m best eigenvalues of the trailing 2m block ------
            base = jnp.maximum(hi - (kk - 1), lo)
            b8 = pl.multiple_of((base // 8) * 8, 8)
            c128 = pl.multiple_of((base // 128) * 128, 128)
            _cdma(hr.at[:, pl.ds(b8, kk + 8), pl.ds(c128, 256)],
                  hi_.at[:, pl.ds(b8, kk + 8), pl.ds(c128, 256)],
                  T_r, T_i, sem)
            roff = base - b8
            coff = base - c128
            rs_r = lax.broadcasted_iota(jnp.int32, (1, kk, kk + 8), 1)
            rs_c = lax.broadcasted_iota(jnp.int32, (1, kk, kk + 8), 2)
            rsel = (rs_c == (roff + rs_r)).astype(jnp.float32)
            cs_r = lax.broadcasted_iota(jnp.int32, (1, 256, kk), 1)
            cs_c = lax.broadcasted_iota(jnp.int32, (1, 256, kk), 2)
            csel = (cs_r == (coff + cs_c)).astype(jnp.float32)  # (1,256,kk)
            Rr = _dotg(rsel, T_r[:], ((2,), (1,)), prec)        # (1,kk,256)
            Ri = _dotg(rsel, T_i[:], ((2,), (1,)), prec)
            Br = _dotg(Rr, csel, ((2,), (1,)), prec)            # (1,kk,kk)
            Bi = _dotg(Ri, csel, ((2,), (1,)), prec)
            krows = lax.broadcasted_iota(jnp.int32, (1, kk, kk), 1)
            kcols = lax.broadcasted_iota(jnp.int32, (1, kk, kk), 2)
            valid_rc = ((base + krows) <= hi) & ((base + kcols) <= hi)
            Br = jnp.where(valid_rc, Br, 0.)
            Bi = jnp.where(valid_rc, Bi, 0.)
            shr2, shi2 = _mini_eigvals(Br, Bi, kk)              # (1,1,kk)

            # Wilkinson-style shift ordering (closest to H[hi,hi] leads;
            # the m closest of the kk candidates land on lanes 0..m-1)
            hh_r = _s11(jnp.where(gidx == hi, dgr, 0.))         # (1,1,1)
            hh_i = _s11(jnp.where(gidx == hi, dgi, 0.))
            dist = (shr2 - hh_r) ** 2 + (shi2 - hh_i) ** 2
            big = jnp.float32(3.4e38)
            # padding lanes of the trailing block (global index beyond hi)
            # hold eigenvalue 0, NOT a spectrum estimate; when |M[hi, hi]|
            # is small they sort ahead of the true shifts and the live
            # bulges then chase useless zero shifts forever.  Push them
            # behind every valid shift.
            shift_ok = (base + iota_kk) <= hi
            dist = jnp.where(shift_ok, dist, big)
            remaining = jnp.ones((1, 1, kk), bool)
            out_r = jnp.zeros((1, 1, m), jnp.float32)
            out_i = jnp.zeros((1, 1, m), jnp.float32)
            for i_s in range(m):
                dmin = jnp.min(jnp.where(remaining, dist, big),
                               axis=2, keepdims=True)
                hit = remaining & (dist <= dmin)
                lane_idx = jnp.min(jnp.where(hit, iota_kk, kk),
                                   axis=2, keepdims=True)
                onehot = iota_kk == lane_idx
                val_r = jnp.sum(jnp.where(onehot, shr2, 0.),
                                axis=2, keepdims=True)
                val_i = jnp.sum(jnp.where(onehot, shi2, 0.),
                                axis=2, keepdims=True)
                out_r = jnp.where(iota_m == i_s, val_r, out_r)
                out_i = jnp.where(iota_m == i_s, val_i, out_i)
                remaining = remaining & ~onehot
            # exceptional sweep: perturbed trailing-diagonal shifts, fired
            # only after 13 sweeps without deflation progress
            pos = jnp.minimum(jnp.maximum(hi - (m - 1), lo) + iota_m, hi)
            krow1 = lax.broadcasted_iota(jnp.int32, (1, kk, 1), 1)
            gsel = ((base + krow1) == pos).astype(jnp.float32)  # (1,kk,m)
            dg2_r = jnp.sum(jnp.where(krows == kcols, Br, 0.),
                            axis=1, keepdims=True)              # (1,1,kk)
            dg2_i = jnp.sum(jnp.where(krows == kcols, Bi, 0.),
                            axis=1, keepdims=True)
            sb2 = jnp.sqrt(jnp.sum(jnp.where(krows == kcols + 1,
                                             Br * Br + Bi * Bi, 0.),
                                   axis=1, keepdims=True))
            tr_dg_r = _dotg(dg2_r, gsel, ((2,), (1,)), prec)    # (1,1,m)
            tr_dg_i = _dotg(dg2_i, gsel, ((2,), (1,)), prec)
            tr_sb = _dotg(sb2, gsel, ((2,), (1,)), prec)
            shr = jnp.where(exc, tr_dg_r + 0.75 * tr_sb, out_r)
            shi = jnp.where(exc, tr_dg_i, out_i)

        valid_b = (lo + 2 * iota_m + 1) <= hi                  # (1, 1, m)

        if _DEBUG_PRINT:
            jax.debug.print('sweep {} lo={} hi={} shr={} shi={}',
                            it, lo, hi, shr[0, 0], shi[0, 0])

        # ---- windowed chase ------------------------------------------------
        a0 = jnp.maximum(lo - 2 * (m - 1), 0)
        a0 = (a0 // 128) * 128
        # skip the chase when AED emptied (or nearly emptied) the block;
        # nibble rule: also skip it while AED alone deflates > _NIBBLE%
        # of its window per pass (exceptional sweeps always chase).
        # zlaqr0 semantics: 100*LD > NIBBLE*NW with NW the EFFECTIVE
        # window size — in the endgame the active block is smaller than
        # kw and measuring against the nominal kw understates the
        # deflation fraction, forcing chases LAPACK would skip.
        if aed:
            nw_eff = jnp.maximum(hi_band - s + 1, 1)
        else:
            nw_eff = jnp.int32(kw)
        nibbled = ((hi_band - hi) * 100 > nibble * nw_eff) & ~exc
        t_final = jnp.where((hi > lo) & ~nibbled, hi - 1 + 2 * (m - 1),
                            lo - 1)

        def win_cond(wstate):
            a, tcur = wstate[0], wstate[1]
            return tcur <= t_final

        def win_body(wstate):
            a, tcur, xr_v, xi_v, yr_v, yi_v = wstate
            aa = pl.multiple_of(a, 128)
            _cdma(hr.at[:, pl.ds(aa, wb), pl.ds(aa, wb)],
                  hi_.at[:, pl.ds(aa, wb), pl.ds(aa, wb)], B_r, B_i, sem)
            U_r[:] = (i2r == i2c).astype(jnp.float32)
            U_i[:] = jnp.zeros((1, wb, wb), jnp.float32)

            t_end = jnp.minimum(a + wb - 3, t_final)

            def make_step(Xr, Xi, Vr, Vi, base, size):
                """One multishift chase step on the (Xr, Xi) block with
                accumulator (Vr, Vi); rows are block-local at ``base``,
                the block is ``size`` lanes wide.  Invariant: the actual
                matrix restricted to the block is X V^T (V accumulates
                conj of the applied rotations), so next-rotation sources
                come from row-dot products of width ``size``."""

                def step(t, carry):
                    xr_v, xi_v, yr_v, yi_v = carry
                    for i in range(m):
                        k = t - 2 * i
                        # clamp the block-local row index: hardware
                        # dynamic slices do not clamp, and pipeline
                        # fill/drain puts inactive bulges outside
                        kl = jnp.clip(k - base, 0, size - 2)
                        valid_i = at_lane_m(valid_b.astype(jnp.float32),
                                            i) > 0.
                        sg_r = at_lane_m(shr, i)
                        sg_i = at_lane_m(shi, i)
                        intro = (k == lo) & valid_i
                        bk_r = Xr[:, pl.ds(kl, 1), :]
                        bk_i = Xi[:, pl.ds(kl, 1), :]
                        b1_r = Xr[:, pl.ds(kl + 1, 1), :]
                        b1_i = Xi[:, pl.ds(kl + 1, 1), :]
                        uk_r = Vr[:, pl.ds(kl, 1), :]
                        uk_i = Vi[:, pl.ds(kl, 1), :]
                        mk_kr = jnp.sum(bk_r * uk_r - bk_i * uk_i,
                                        axis=2, keepdims=True)
                        mk_ki = jnp.sum(bk_r * uk_i + bk_i * uk_r,
                                        axis=2, keepdims=True)
                        m1_kr = jnp.sum(b1_r * uk_r - b1_i * uk_i,
                                        axis=2, keepdims=True)
                        m1_ki = jnp.sum(b1_r * uk_i + b1_i * uk_r,
                                        axis=2, keepdims=True)
                        xr = at_lane_m(xr_v, i)
                        xi = at_lane_m(xi_v, i)
                        yr = at_lane_m(yr_v, i)
                        yi = at_lane_m(yi_v, i)
                        xr = jnp.where(intro, mk_kr - sg_r, xr)
                        xi = jnp.where(intro, mk_ki - sg_i, xi)
                        yr = jnp.where(intro, m1_kr, yr)
                        yi = jnp.where(intro, m1_ki, yi)

                        active = (k >= lo) & (k < hi) & valid_i
                        c, sr, si = _givens(xr, xi, yr, yi, active)

                        nk_r = c * bk_r + (sr * b1_r - si * b1_i)
                        nk_i = c * bk_i + (sr * b1_i + si * b1_r)
                        n1_r = c * b1_r - (sr * bk_r + si * bk_i)
                        n1_i = c * b1_i - (sr * bk_i - si * bk_r)
                        Xr[:, pl.ds(kl, 1), :] = nk_r
                        Xi[:, pl.ds(kl, 1), :] = nk_i
                        Xr[:, pl.ds(kl + 1, 1), :] = n1_r
                        Xi[:, pl.ds(kl + 1, 1), :] = n1_i

                        u1_r = Vr[:, pl.ds(kl + 1, 1), :]
                        u1_i = Vi[:, pl.ds(kl + 1, 1), :]
                        mw_r = c * uk_r + (sr * u1_r + si * u1_i)
                        mw_i = c * uk_i + (sr * u1_i - si * u1_r)
                        m1w_r = c * u1_r - (sr * uk_r - si * uk_i)
                        m1w_i = c * u1_i - (sr * uk_i + si * uk_r)
                        Vr[:, pl.ds(kl, 1), :] = mw_r
                        Vi[:, pl.ds(kl, 1), :] = mw_i
                        Vr[:, pl.ds(kl + 1, 1), :] = m1w_r
                        Vi[:, pl.ds(kl + 1, 1), :] = m1w_i

                        k2 = jnp.minimum(kl + 2, size - 1)
                        b2_r = Xr[:, pl.ds(k2, 1), :]
                        b2_i = Xi[:, pl.ds(k2, 1), :]
                        xn_r = jnp.sum(n1_r * mw_r - n1_i * mw_i,
                                       axis=2, keepdims=True)
                        xn_i = jnp.sum(n1_r * mw_i + n1_i * mw_r,
                                       axis=2, keepdims=True)
                        y2_r = jnp.sum(b2_r * mw_r - b2_i * mw_i,
                                       axis=2, keepdims=True)
                        y2_i = jnp.sum(b2_r * mw_i + b2_i * mw_r,
                                       axis=2, keepdims=True)
                        nxt_ok = (k + 2) <= hi
                        yn_r = jnp.where(nxt_ok, y2_r, 0.)
                        yn_i = jnp.where(nxt_ok, y2_i, 0.)
                        selm = iota_m == i
                        xr_v = jnp.where(selm, jnp.where(active, xn_r, xr),
                                         xr_v)
                        xi_v = jnp.where(selm, jnp.where(active, xn_i, xi),
                                         xi_v)
                        yr_v = jnp.where(selm, jnp.where(active, yn_r, yr),
                                         yr_v)
                        yi_v = jnp.where(selm, jnp.where(active, yn_i, yi),
                                         yi_v)
                    return (xr_v, xi_v, yr_v, yi_v)

                return step

            if local_chase:
                # dlaqr5-style blocked chase: rotations run inside the
                # (LS, LS) local block D with local accumulator G, then
                # merge into (B, U) via one-hot GEMMs.  Per-rotation row
                # ops span LS lanes instead of wb; the merge GEMMs ride
                # the MXU.  Invariants: window  M = B U^T;  chunk start
                # D = (B U^T)[l0:l0+LS, l0:l0+LS], G = I; after the
                # chunk (D = Q_l D0, G = conj(Q_l)):
                #   B[l0+p, :] <- sum_q conj(G)[p, q] B[l0+q, :]
                #   U[l0+p, :] <- sum_q      G [p, q] U[l0+q, :]
                # which restores M = B U^T exactly (bulge bumps included,
                # no masking mid-window).
                LS = _LS_CHASE
                pr_ls = lax.broadcasted_iota(jnp.int32, (1, LS, wb), 1)
                pc_ls = lax.broadcasted_iota(jnp.int32, (1, LS, wb), 2)
                eye_ls = (lax.broadcasted_iota(jnp.int32, (1, LS, LS), 1)
                          == lax.broadcasted_iota(jnp.int32, (1, LS, LS), 2)
                          ).astype(jnp.float32)

                def chunk_cond(cst):
                    return cst[0] <= t_end

                def chunk_body(cst):
                    t0, xr_v, xi_v, yr_v, yi_v = cst
                    # lowest row any bulge touches this chunk; every row
                    # in [t0 - 2(m-1), tc_end + 2] stays inside the block
                    l0 = jnp.clip(t0 - 2 * (m - 1) - a, 0, wb - LS)
                    Rsel = (pc_ls == l0 + pr_ls).astype(jnp.float32)
                    Bl_r = _dotg(Rsel, B_r[:], ((2,), (1,)), prec)
                    Bl_i = _dotg(Rsel, B_i[:], ((2,), (1,)), prec)
                    Wl_r = _dotg(Rsel, U_r[:], ((2,), (1,)), prec)
                    Wl_i = _dotg(Rsel, U_i[:], ((2,), (1,)), prec)
                    D_r[:] = (_dotg(Bl_r, Wl_r, ((2,), (2,)), prec)
                              - _dotg(Bl_i, Wl_i, ((2,), (2,)), prec))
                    D_i[:] = (_dotg(Bl_r, Wl_i, ((2,), (2,)), prec)
                              + _dotg(Bl_i, Wl_r, ((2,), (2,)), prec))
                    G_r[:] = eye_ls
                    G_i[:] = jnp.zeros((1, LS, LS), jnp.float32)
                    tc_end = jnp.minimum(a + l0 + LS - 3, t_end)
                    carry = lax.fori_loop(
                        t0, tc_end + 1,
                        make_step(D_r, D_i, G_r, G_i, a + l0, LS),
                        (xr_v, xi_v, yr_v, yi_v))
                    Gr_ = G_r[:]
                    Gi_ = G_i[:]
                    # B rows <- conj(G) @ Bl; U rows <- G @ Wl
                    Bn_r = (_dotg(Gr_, Bl_r, ((2,), (1,)), prec)
                            + _dotg(Gi_, Bl_i, ((2,), (1,)), prec))
                    Bn_i = (_dotg(Gr_, Bl_i, ((2,), (1,)), prec)
                            - _dotg(Gi_, Bl_r, ((2,), (1,)), prec))
                    Un_r = (_dotg(Gr_, Wl_r, ((2,), (1,)), prec)
                            - _dotg(Gi_, Wl_i, ((2,), (1,)), prec))
                    Un_i = (_dotg(Gr_, Wl_i, ((2,), (1,)), prec)
                            + _dotg(Gi_, Wl_r, ((2,), (1,)), prec))
                    # scatter the LS rows back: X += Rsel^T (Xn - Xl)
                    B_r[:] = B_r[:] + _dotg(Rsel, Bn_r - Bl_r,
                                            ((1,), (1,)), prec)
                    B_i[:] = B_i[:] + _dotg(Rsel, Bn_i - Bl_i,
                                            ((1,), (1,)), prec)
                    U_r[:] = U_r[:] + _dotg(Rsel, Un_r - Wl_r,
                                            ((1,), (1,)), prec)
                    U_i[:] = U_i[:] + _dotg(Rsel, Un_i - Wl_i,
                                            ((1,), (1,)), prec)
                    return (tc_end + 1,) + carry

                fin = lax.while_loop(chunk_cond, chunk_body,
                                     (tcur, xr_v, xi_v, yr_v, yi_v))
                _, xr_v, xi_v, yr_v, yi_v = fin
            else:
                carry = lax.fori_loop(tcur, t_end + 1,
                                      make_step(B_r, B_i, U_r, U_i, a, wb),
                                      (xr_v, xi_v, yr_v, yi_v))
                xr_v, xi_v, yr_v, yi_v = carry

            # --- B <- B U^T; keep parked bulge bumps alive ------------------
            Br_ = B_r[:]
            Bi_ = B_i[:]
            Ur_ = U_r[:]
            Ui_ = U_i[:]
            Br2 = (_dotg(Br_, Ur_, ((2,), (2,)), prec)
                   - _dotg(Bi_, Ui_, ((2,), (2,)), prec))
            Bi2 = (_dotg(Br_, Ui_, ((2,), (2,)), prec)
                   + _dotg(Bi_, Ur_, ((2,), (2,)), prec))
            # parked bumps: rows r = t_end + 2 - 2i (i = 0..m-1) carry a live
            # second-subdiagonal entry that must survive into the next window
            u = (t_end + 2) - (aa + i2r)
            parked = (u >= 0) & (u <= 2 * (m - 1)) & ((u % 2) == 0)
            hm = (i2r <= i2c + 1) | ((i2r == i2c + 2) & parked)
            B_r[:] = jnp.where(hm, Br2, 0.)
            B_i[:] = jnp.where(hm, Bi2, 0.)
            _cdma(B_r, B_i, hr.at[:, pl.ds(aa, wb), pl.ds(aa, wb)],
                  hi_.at[:, pl.ds(aa, wb), pl.ds(aa, wb)], sem)

            # --- right slabs: H[a:a+wb, c:c+512] <- conj(U) @ slab ----------
            n_right = (n - (a + wb) + 511) // 512

            def right_body(j, _):
                c0 = pl.multiple_of(aa + wb + j * 512, 128)
                _cdma(hr.at[:, pl.ds(aa, wb), pl.ds(c0, 512)],
                      hi_.at[:, pl.ds(aa, wb), pl.ds(c0, 512)],
                      S_r, S_i, sem)
                Sr = S_r[:]
                Si = S_i[:]
                S_r[:] = (_dotg(Ur_, Sr, ((2,), (1,)), prec)
                          + _dotg(Ui_, Si, ((2,), (1,)), prec))
                S_i[:] = (_dotg(Ur_, Si, ((2,), (1,)), prec)
                          - _dotg(Ui_, Sr, ((2,), (1,)), prec))
                _cdma(S_r, S_i, hr.at[:, pl.ds(aa, wb), pl.ds(c0, 512)],
                      hi_.at[:, pl.ds(aa, wb), pl.ds(c0, 512)], sem)
                return 0

            lax.fori_loop(0, n_right, right_body, 0)

            # --- top slabs: H[r:r+128, a:a+wb] <- slab @ U^T ----------------
            n_top = a // 128

            def top_body(j, _):
                r0 = pl.multiple_of(j * 128, 8)
                _cdma(hr.at[:, pl.ds(r0, 128), pl.ds(aa, wb)],
                      hi_.at[:, pl.ds(r0, 128), pl.ds(aa, wb)],
                      P_r, P_i, sem)
                Sr = P_r[:]
                Si = P_i[:]
                P_r[:] = (_dotg(Sr, Ur_, ((2,), (2,)), prec)
                          - _dotg(Si, Ui_, ((2,), (2,)), prec))
                P_i[:] = (_dotg(Sr, Ui_, ((2,), (2,)), prec)
                          + _dotg(Si, Ur_, ((2,), (2,)), prec))
                _cdma(P_r, P_i, hr.at[:, pl.ds(r0, 128), pl.ds(aa, wb)],
                      hi_.at[:, pl.ds(r0, 128), pl.ds(aa, wb)], sem)
                return 0

            lax.fori_loop(0, n_top, top_body, 0)

            # --- Z^T slabs: Z^T[a:a+wb, c:c+512] <- U @ slab ----------------
            def z_body(j, _):
                c0 = pl.multiple_of(j * 512, 128)
                _cdma(ztr.at[:, pl.ds(aa, wb), pl.ds(c0, 512)],
                      zti.at[:, pl.ds(aa, wb), pl.ds(c0, 512)],
                      S_r, S_i, sem)
                Sr = S_r[:]
                Si = S_i[:]
                S_r[:] = (_dotg(Ur_, Sr, ((2,), (1,)), prec)
                          - _dotg(Ui_, Si, ((2,), (1,)), prec))
                S_i[:] = (_dotg(Ur_, Si, ((2,), (1,)), prec)
                          + _dotg(Ui_, Sr, ((2,), (1,)), prec))
                _cdma(S_r, S_i, ztr.at[:, pl.ds(aa, wb), pl.ds(c0, 512)],
                      zti.at[:, pl.ds(aa, wb), pl.ds(c0, 512)], sem)
                return 0

            lax.fori_loop(0, (n + 511) // 512, z_body, 0)

            return (a + stride, t_end + 1, xr_v, xi_v, yr_v, yi_v)

        zeros_m = jnp.zeros((1, 1, m), jnp.float32)
        lax.while_loop(win_cond, win_body,
                       (a0, lo, zeros_m, zeros_m, zeros_m, zeros_m))
        stall = jnp.where((hi < hi_top) | exc, 0, stall + 1)
        aed_tot = aed_tot + (hi_band - hi)
        skip_tot = skip_tot + nibbled.astype(jnp.int32)
        multi_tot = multi_tot + second_run
        if aed:
            tb_new = c128a // 128
        else:
            tb_new = jnp.int32(0)
        return (hi, it + 1, stall, aed_tot, skip_tot, multi_tot,
                nibbled.astype(jnp.int32), tb_new)

    def cond(state):
        hi_top, it = state[0], state[1]
        return (hi_top > 0) & (it < max_sweeps)

    hi_f, it_f, _, aed_f, skip_f, multi_f, _, _ = lax.while_loop(
        cond, sweep,
        (jnp.int32(n - 1), jnp.int32(0), jnp.int32(0), jnp.int32(0),
         jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    sub = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    stat_ref[:] = jnp.where(
        sub == 0, hi_f.astype(jnp.float32),
        jnp.where(sub == 2, aed_f.astype(jnp.float32),
                  jnp.where(sub == 3, skip_f.astype(jnp.float32),
                            jnp.where(sub == 4,
                                      multi_f.astype(jnp.float32),
                                      it_f.astype(jnp.float32)))))


@functools.partial(jax.jit, static_argnames=('n', 'n_arr', 'm', 'wb',
                                             'max_sweeps', 'interpret',
                                             'aed', 'kw', 'nibble',
                                             'defl_mult', 'local_chase'))
def _call_hbm(Hr, Hi, ZTr, ZTi, n, n_arr, m, wb, max_sweeps, interpret,
              aed, kw=_AED_KW, nibble=_NIBBLE, defl_mult=1.0,
              local_chase=True):
    nt = n // 128
    kern = functools.partial(_kernel_hbm, n=n, m=m, wb=wb,
                             max_sweeps=max_sweeps, aed=aed, kw=kw,
                             nibble=nibble, defl_mult=defl_mult,
                             local_chase=local_chase)
    trows = kw + 16 if aed else m + 8
    return pl.pallas_call(
        kern,
        out_shape=([jax.ShapeDtypeStruct((1, n_arr, n_arr), jnp.float32)] * 4
                   + [jax.ShapeDtypeStruct((8, 128), jnp.float32)]),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=([pl.BlockSpec(memory_space=pl.ANY)] * 4
                   + [pl.BlockSpec(memory_space=pltpu.VMEM)]),
        scratch_shapes=[
            pltpu.VMEM((1, wb, wb), jnp.float32),    # B_r
            pltpu.VMEM((1, wb, wb), jnp.float32),    # B_i
            pltpu.VMEM((1, wb, wb), jnp.float32),    # U_r
            pltpu.VMEM((1, wb, wb), jnp.float32),    # U_i
            pltpu.VMEM((1, wb, 512), jnp.float32),   # S_r
            pltpu.VMEM((1, wb, 512), jnp.float32),   # S_i
            pltpu.VMEM((1, trows, 256), jnp.float32),  # T_r (shift/AED blk)
            pltpu.VMEM((1, trows, 256), jnp.float32),  # T_i
            pltpu.VMEM((1, 256, 256), jnp.float32),  # K_r (band tiles)
            pltpu.VMEM((1, 256, 256), jnp.float32),  # K_i
            pltpu.VMEM((1, 128, wb), jnp.float32),   # P_r (top slabs)
            pltpu.VMEM((1, 128, wb), jnp.float32),   # P_i
            pltpu.VMEM((1, 256, 512), jnp.float32),  # S2_r (AED slabs)
            pltpu.VMEM((1, 256, 512), jnp.float32),  # S2_i
            pltpu.VMEM((1, 128, 256), jnp.float32),  # T2_r (AED top slabs)
            pltpu.VMEM((1, 128, 256), jnp.float32),  # T2_i
            pltpu.VMEM((1, nt, 128), jnp.float32),   # dg_r
            pltpu.VMEM((1, nt, 128), jnp.float32),   # dg_i
            pltpu.VMEM((1, nt, 128), jnp.float32),   # sb_r
            pltpu.VMEM((1, nt, 128), jnp.float32),   # sb_i
            pltpu.VMEM((1, _LS_CHASE, _LS_CHASE), jnp.float32),  # D_r
            pltpu.VMEM((1, _LS_CHASE, _LS_CHASE), jnp.float32),  # D_i
            pltpu.VMEM((1, _LS_CHASE, _LS_CHASE), jnp.float32),  # G_r
            pltpu.VMEM((1, _LS_CHASE, _LS_CHASE), jnp.float32),  # G_i
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 2 ** 20),
        interpret=interpret,
    )(Hr, Hi, ZTr, ZTi)


def schur_qr_hbm(Hr, Hi, Qr, Qi, m=16, wb=512, max_iter_factor=40,
                 interpret=False, return_stats=False, aed=True,
                 kw=_AED_KW, nibble=_NIBBLE, defl_mult=1.0,
                 local_chase=True):
    """HBM-resident multishift Schur QR for ONE [n, n] Hessenberg pair.

    Drop-in for schur_qr_pallas_ms with no VMEM size ceiling.  Returns
    (Tr, Ti, Zr, Zi); non-converged spectra are NaN-poisoned.

    ``aed=True`` (default) runs aggressive-early-deflation each sweep:
    the trailing _AED_KW window is Schur-factored in VMEM, spike entries
    |beta conj(U[0,i])| below the LAPACK threshold deflate as a
    contiguous bottom run, the undeflated window + spike column is
    re-Hessenberged by masked Householder reflections, and the composed
    transform streams through the borders once.  Shifts come from the
    undeflated window eigenvalues (zgeev/zlaqr3 structure; the reference
    gets this from LAPACK behind torcwa rcwa.py:1236).
    """
    n0 = Hr.shape[-1]
    n = max(-(-n0 // 128) * 128, 256)    # math size (padded)
    n_arr = n + wb + 128                 # allocation size (margin)
    max_sweeps = (max_iter_factor * n) // m + 8 * m + 40
    stride = wb - ((2 * m + 127) // 128) * 128
    if stride <= 0:
        raise ValueError(f'window {wb} too small for {m} bulges '
                         f'(stride {stride} <= 0)')
    if aed:
        if kw % 8 or not 16 <= kw <= 120:
            # the composed AED transform (kw+8 wide) must embed in a
            # 256-wide slab at any 128-alignment offset: oc + kw + 8 <= 256
            raise ValueError(f'AED window kw={kw} must be a multiple of 8 '
                             f'in [16, 120]')
        if m > kw:
            raise ValueError(f'm={m} shifts need an AED window kw >= m '
                             f'(got {kw})')

    def embed(X, fill_diag=None):
        full = jnp.zeros((n_arr, n_arr), jnp.float32)
        full = full.at[:n0, :n0].set(X.astype(jnp.float32))
        if fill_diag is not None:
            idx = jnp.arange(n0, n)
            full = full.at[idx, idx].set(fill_diag)
        return full[None]

    # padding eigenvalues: distinct values away from typical spectra; the
    # zero subdiagonal at n0-1 makes them deflate on the first sweep
    pad_vals = 1. + 0.5 * jnp.arange(n - n0, dtype=jnp.float32)
    Hr_p = embed(Hr, pad_vals)
    Hi_p = embed(Hi)
    ZTr_p = embed(jnp.swapaxes(Qr, -2, -1), jnp.ones(n - n0))
    ZTi_p = embed(jnp.swapaxes(Qi, -2, -1))

    # the blocked local chase needs strictly narrower blocks than the
    # window (and bulges must fit the block: 2m + 2 < LS)
    local_chase = (local_chase and wb > _LS_CHASE
                   and 2 * m + 2 < _LS_CHASE)
    Tr, Ti, Zr, Zi, stat = _call_hbm(Hr_p, Hi_p, ZTr_p, ZTi_p,
                                     n, n_arr, m, wb, max_sweeps, interpret,
                                     aed, kw, nibble, defl_mult,
                                     local_chase)
    Tr, Ti, Zr, Zi = Tr[0], Ti[0], Zr[0], Zi[0]
    hi_f = stat[0, 0]
    sweeps = stat[1, 0]
    aed_defl = stat[2, 0]
    skipped = stat[3, 0]
    multi = stat[4, 0]          # sweeps where a 2nd alive run sat above lo
    tri = jnp.arange(n0)[:, None] <= jnp.arange(n0)[None, :]
    Tr = jnp.where(tri, Tr[:n0, :n0], 0.).astype(Hr.dtype)
    Ti = jnp.where(tri, Ti[:n0, :n0], 0.).astype(Hr.dtype)
    bad = hi_f > 0
    eye = jnp.eye(n0, dtype=bool)
    Tr = jnp.where(bad & eye, jnp.nan, Tr)
    Ti = jnp.where(bad & eye, jnp.nan, Ti)
    Zr = jnp.swapaxes(Zr[:n, :n], -2, -1)[:n0, :n0].astype(Hr.dtype)
    Zi = jnp.swapaxes(Zi[:n, :n], -2, -1)[:n0, :n0].astype(Hr.dtype)
    out = (Tr, Ti, Zr, Zi)
    if return_stats:
        return out + ((hi_f.astype(jnp.int32), sweeps.astype(jnp.int32),
                       aed_defl.astype(jnp.int32),
                       skipped.astype(jnp.int32),
                       multi.astype(jnp.int32)),)
    return out
