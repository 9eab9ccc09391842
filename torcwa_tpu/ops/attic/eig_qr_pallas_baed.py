"""Batched multishift Schur QR with in-kernel AED (VMEM-resident).

The batched single-shift kernel (eig_qr_pallas.schur_qr_pallas_acc)
spends ~1.1n sweeps per spectrum: one Wilkinson shift retires per sweep,
and every sweep pays a full deflation scan plus the deferred-column
prefix GEMMs.  This kernel is the batched composition of the two levers
already proven on this runtime:

* the m-bulge pipelined chase of eig_qr_pallas_ms (LAPACK zlaqr5's
  small-bulge multishift with the deferred-column trick: row-pair
  updates O(B n) per rotation, next-rotation sources reconstructed from
  the invariant M = H W^T, columns applied once per sweep as prefix
  GEMMs), generalized from batch 1 to a VMEM-resident batch; and
* the aggressive-early-deflation block of eig_qr_hbm (LAPACK zlaqr3's
  structure: Schur-factor the trailing kw window with accumulated
  vectors, deflate spike entries below the LAPACK threshold as a
  contiguous bottom run, re-Hessenberg the undeflated window + spike
  column by masked Householder reflections, shifts = undeflated window
  eigenvalues), with the border application done as one-hot embedding
  GEMMs on the VMEM-resident batch instead of DMA'd HBM slabs — each
  lane carries its own window position, so every selection matrix is
  per-lane.

Per-lane state (deflation window, stall counter, AED gate) is carried as
(b, 1, 1) vectors; converged lanes run masked no-ops until the whole
batch retires.  Everything respects the Mosaic constraint set recorded
in eig_qr_pallas.py (no lane-dim dynamic slices, scalars via one-hot
reductions, single-axis staged reductions).

Reference baseline: cuSOLVER/MAGMA zgeev behind torch.linalg.eig
(/root/reference/torcwa/rcwa.py:1236); this kernel is the TPU analogue
of its AED+multishift internals (zlaqr0/zlaqr3/zlaqr5).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..eig_qr_pallas_ms import _givens, _wilkinson

__all__ = ['schur_qr_pallas_baed']

_F32EPS = 1.1920929e-07
_SMLNUM = 1e-31
_VMEM_BUDGET = 96 * 2 ** 20
_CHUNK = 512


def _dotg(a, b, dims, prec):
    return lax.dot_general(a, b, (dims, ((0,), (0,))), precision=prec,
                           preferred_element_type=jnp.float32)


def _mini_schur_b(Br, Bi, kw, b, max_sweeps):
    """Batched masked single-shift Schur QR of (b, kw, kw) Hessenberg
    pairs, accumulating the transform (the AED window factorization).

    Returns (Tr, Ti, Ur, Ui, hi_m) with U = conj(Q) (chase accumulation
    convention), so T = Q W Q^H and the AED spike is beta * conj(U[:, 0]).
    ``hi_m`` is (b, 1, 1); 0 iff that lane fully converged.
    Port of eig_qr_hbm._mini_schur from batch 1 to batch b.
    """
    rows = lax.broadcasted_iota(jnp.int32, (b, kw, kw), 1)
    cols = lax.broadcasted_iota(jnp.int32, (b, kw, kw), 2)
    iota_k = lax.broadcasted_iota(jnp.int32, (b, 1, kw), 2)

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
            ridx = lax.broadcasted_iota(jnp.int32, (b, kw, 1), 1)
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

        Br, Bi, Ur, Ui, _, _, _, _ = lax.fori_loop(
            0, kw - 1, step, (Br, Bi, Ur, Ui, x0r, x0i, y0r, y0i))
        return (Br, Bi, Ur, Ui, hi, it + 1)

    def cond(state):
        hi, it = state[4], state[5]
        return jnp.any(hi > 0) & (it < max_sweeps)

    hi0 = jnp.full((b, 1, 1), kw - 1, jnp.int32)
    Ur0 = (rows == cols).astype(jnp.float32)
    Ui0 = jnp.zeros((b, kw, kw), jnp.float32)
    Br, Bi, Ur, Ui, hi_f, _ = lax.while_loop(
        cond, body, (Br, Bi, Ur0, Ui0, hi0, jnp.int32(0)))
    return Br, Bi, Ur, Ui, hi_f


def _kernel_baed(hr_in, hi_in, ztr_in, zti_in,
                 hr_ref, hi_ref, ztr_ref, zti_ref, wr_ref, wi_ref, stat_ref,
                 *, max_sweeps: int, n: int, b: int, m: int, kw: int):
    # explicit copy-in: input_output_aliases miscompiles when several
    # aliased pallas calls (batch chunks) share one jit program here
    hr_ref[:] = hr_in[:]
    hi_ref[:] = hi_in[:]
    ztr_ref[:] = ztr_in[:]
    zti_ref[:] = zti_in[:]
    rows = lax.broadcasted_iota(jnp.int32, (b, n, n), 1)
    cols = lax.broadcasted_iota(jnp.int32, (b, n, n), 2)
    iota_n = lax.broadcasted_iota(jnp.int32, (b, 1, n), 2)
    iota_m = lax.broadcasted_iota(jnp.int32, (b, 1, m), 2)
    eye = (rows == cols).astype(jnp.float32)
    hess_mask = rows <= cols + 1
    prec = lax.Precision.HIGHEST
    kp = kw + 8                          # padded transform size (>= kw+1)
    kb = kw + 1                          # spike row + window

    def diag_vec(Xr, Xi, off):
        msk = rows == (cols - off)
        return (jnp.sum(jnp.where(msk, Xr, 0.), axis=1, keepdims=True),
                jnp.sum(jnp.where(msk, Xi, 0.), axis=1, keepdims=True))

    def at_lane(v, j):
        return jnp.sum(jnp.where(iota_n == j, v, 0.), axis=2, keepdims=True)

    def at_lane_m(v, j):
        return jnp.sum(jnp.where(iota_m == j, v, 0.), axis=2, keepdims=True)

    def s11(x):
        return jnp.sum(jnp.sum(x, axis=1, keepdims=True),
                       axis=2, keepdims=True)

    def m11(x):
        return jnp.max(jnp.max(x, axis=1, keepdims=True),
                       axis=2, keepdims=True)

    def body(state):
        hi_prev, it, stall = state
        Hr = hr_ref[:]
        Hi = hi_ref[:]

        # ---- deflation window (LAPACK thresholds), per lane ----------------
        dr, di = diag_vec(Hr, Hi, 0)
        d = jnp.sqrt(dr * dr + di * di)
        sr_, si_ = diag_vec(Hr, Hi, -1)
        sub2 = sr_ * sr_ + si_ * si_
        dshift = jnp.where(iota_n == n - 1, 0.,
                           pltpu.roll(d, shift=n - 1, axis=2))
        thresh = jnp.maximum(_F32EPS * (d + dshift), _SMLNUM)
        alive = sub2 > thresh * thresh
        lane = iota_n + 1
        hi = jnp.max(jnp.where((lane <= hi_prev) & alive, lane, 0),
                     axis=2, keepdims=True)
        alive_prev = pltpu.roll(alive.astype(jnp.float32),
                                shift=1, axis=2) > 0.5
        lo = jnp.max(jnp.where((iota_n <= hi) &
                               ((iota_n == 0) | ~alive_prev),
                               iota_n, 0), axis=2, keepdims=True)
        exc = stall >= 13

        # ==== AED: trailing-window Schur + spike deflation (zlaqr3) =========
        # window start per lane; clamped so row s-1 (the spike row) exists
        s = jnp.clip(jnp.maximum(hi - kw + 1, lo + 1), 1, n - 1)
        live = hi > 0

        # extraction masks (per-lane one-hot selections)
        q1 = lax.broadcasted_iota(jnp.int32, (b, kw, n), 1)
        r1 = lax.broadcasted_iota(jnp.int32, (b, kw, n), 2)
        Rw = ((r1 == s + q1) & live).astype(jnp.float32)     # (b, kw, n)
        RHr = _dotg(Rw, Hr, ((2,), (1,)), prec)              # (b, kw, n)
        RHi = _dotg(Rw, Hi, ((2,), (1,)), prec)
        Wr0 = _dotg(RHr, Rw, ((2,), (2,)), prec)             # (b, kw, kw)
        Wi0 = _dotg(RHi, Rw, ((2,), (2,)), prec)
        bsel = (q1 == 0) & (r1 == s - 1)
        beta_r = s11(jnp.where(bsel, RHr, 0.))               # (b, 1, 1)
        beta_i = s11(jnp.where(bsel, RHi, 0.))
        smax = jnp.maximum(m11(jnp.sqrt(Wr0 * Wr0 + Wi0 * Wi0)), _SMLNUM)

        Tw_r, Tw_i, Uw_r, Uw_i, hi_m = _mini_schur_b(
            Wr0, Wi0, kw, b, 3 * kw + 40)

        # spike = beta * conj(U[:, 0])
        roww = lax.broadcasted_iota(jnp.int32, (b, kw, kw), 1)
        colw = lax.broadcasted_iota(jnp.int32, (b, kw, kw), 2)
        iota_kw = lax.broadcasted_iota(jnp.int32, (b, 1, kw), 2)
        u0_r = jnp.sum(jnp.where(colw == 0, Uw_r, 0.), axis=2, keepdims=True)
        u0_i = jnp.sum(jnp.where(colw == 0, Uw_i, 0.), axis=2, keepdims=True)
        sp_r = beta_r * u0_r + beta_i * u0_i                 # (b, kw, 1)
        sp_i = beta_i * u0_r - beta_r * u0_i
        sp_abs = jnp.sqrt(sp_r * sp_r + sp_i * sp_i)
        tds_r = jnp.sum(jnp.where(roww == colw, Tw_r, 0.),
                        axis=2, keepdims=True)               # (b, kw, 1)
        tds_i = jnp.sum(jnp.where(roww == colw, Tw_i, 0.),
                        axis=2, keepdims=True)
        td_abs = jnp.sqrt(tds_r * tds_r + tds_i * tds_i)
        rk = lax.broadcasted_iota(jnp.int32, (b, kw, 1), 1)
        deflatable = ((sp_abs <= _F32EPS * jnp.maximum(td_abs, smax))
                      & (rk >= hi_m))
        ku = jnp.max(jnp.where(~deflatable, rk + 1, 0),
                     axis=1, keepdims=True)                  # (b, 1, 1)
        hi_new = s + ku - 1
        apply_l = (hi_new < hi) & live                       # (b, 1, 1)

        # ---- shifts: m undeflated window eigenvalues closest to the new
        # corner T[ku-1, ku-1] (selection sort via one-hot) ------------------
        td_r = jnp.sum(jnp.where(roww == colw, Tw_r, 0.),
                       axis=1, keepdims=True)                # (b, 1, kw)
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
        remaining = jnp.ones((b, 1, kw), bool)
        shr = jnp.zeros((b, 1, m), jnp.float32)
        shi = jnp.zeros((b, 1, m), jnp.float32)
        for i_s in range(m):
            dmin = jnp.min(jnp.where(remaining, dist, big),
                           axis=2, keepdims=True)
            hit = remaining & (dist <= dmin)
            lane_idx = jnp.min(jnp.where(hit, iota_kw, kw),
                               axis=2, keepdims=True)
            onehot = iota_kw == lane_idx
            val_r = jnp.sum(jnp.where(onehot, td_r, 0.),
                            axis=2, keepdims=True)
            val_i = jnp.sum(jnp.where(onehot, td_i, 0.),
                            axis=2, keepdims=True)
            shr = jnp.where(iota_m == i_s, val_r, shr)
            shi = jnp.where(iota_m == i_s, val_i, shi)
            remaining = remaining & ~onehot
        # exceptional sweep: perturbed trailing undeflated diagonals
        pos_l = jnp.clip(ku - m + iota_m, 0, kum1)           # (b, 1, m)
        l_iota = lax.broadcasted_iota(jnp.int32, (b, kw, m), 1)
        gsel = (l_iota == pos_l).astype(jnp.float32)
        exd_r = _dotg(td_r, gsel, ((2,), (1,)), prec)        # (b, 1, m)
        exd_i = _dotg(td_i, gsel, ((2,), (1,)), prec)
        spa_l = _dotg(sp_abs, gsel, ((1,), (1,)), prec)
        shr = jnp.where(exc, exd_r + 0.75 * spa_l, shr)
        shi = jnp.where(exc, exd_i, shi)

        # ---- compose L = Qb . diag(1, conj(Q)) on a (kp, kp) pad -----------
        rp = lax.broadcasted_iota(jnp.int32, (b, kp, kp), 1)
        cp = lax.broadcasted_iota(jnp.int32, (b, kp, kp), 2)
        s1_r = lax.broadcasted_iota(jnp.int32, (b, kp, kw), 1)
        s1_l = lax.broadcasted_iota(jnp.int32, (b, kp, kw), 2)
        S1T = (s1_r == s1_l + 1).astype(jnp.float32)

        def emb(X):
            return _dotg(_dotg(S1T, X, ((2,), (1,)), prec), S1T,
                         ((2,), (2,)), prec)

        idpad = ((rp == cp) & ((rp == 0) | (rp >= kb))).astype(jnp.float32)
        Lr_ = emb(Uw_r) + idpad
        Li_ = -emb(Uw_i)
        spm_r = jnp.where(deflatable, 0., sp_r)
        spm_i = jnp.where(deflatable, 0., sp_i)
        spe_r = _dotg(S1T, spm_r, ((2,), (1,)), prec)        # (b, kp, 1)
        spe_i = _dotg(S1T, spm_i, ((2,), (1,)), prec)
        apad = ((rp == cp) & (rp >= kb)).astype(jnp.float32)
        Ap_r = emb(Tw_r) + jnp.where(cp == 0, spe_r, 0.) + apad
        Ap_i = emb(Tw_i) + jnp.where(cp == 0, spe_i, 0.)

        # masked Householder re-Hessenberg of the (ku+1) active block
        rp1 = lax.broadcasted_iota(jnp.int32, (b, kp, 1), 1)
        eyep = (rp == cp).astype(jnp.float32)
        tiny = jnp.float32(1e-30)

        def hh_body(j, carry):
            Ar_, Ai_, Lr_, Li_ = carry
            cj = cp == j
            colr = jnp.sum(jnp.where(cj, Ar_, 0.), axis=2, keepdims=True)
            coli = jnp.sum(jnp.where(cj, Ai_, 0.), axis=2, keepdims=True)
            maskv = (rp1 >= j + 2) & (rp1 <= ku)
            x1r = jnp.sum(jnp.where(rp1 == j + 1, colr, 0.),
                          axis=1, keepdims=True)
            x1i = jnp.sum(jnp.where(rp1 == j + 1, coli, 0.),
                          axis=1, keepdims=True)
            sigma = jnp.sum(jnp.where(maskv, colr * colr + coli * coli, 0.),
                            axis=1, keepdims=True)
            xn1 = jnp.sqrt(x1r * x1r + x1i * x1i)
            safe1 = jnp.where(xn1 > 0, xn1, 1.)
            phr = jnp.where(xn1 > 0, x1r / safe1, 1.)
            phi = jnp.where(xn1 > 0, x1i / safe1, 0.)
            normx = jnp.sqrt(sigma + xn1 * xn1)
            vhr = x1r + phr * normx
            vhi = x1i + phi * normx
            vr = (jnp.where(maskv, colr, 0.)
                  + jnp.where(rp1 == j + 1, vhr, 0.))
            vi = (jnp.where(maskv, coli, 0.)
                  + jnp.where(rp1 == j + 1, vhi, 0.))
            vn2 = 2. * (sigma + xn1 * xn1 + normx * xn1)
            tau = jnp.where(sigma > 0, 2. / jnp.maximum(vn2, tiny), 0.)
            vTr = _dotg(vr, eyep, ((1,), (1,)), prec)        # (b, 1, kp)
            vTi = _dotg(vi, eyep, ((1,), (1,)), prec)
            wr_ = jnp.sum(vr * Ar_ + vi * Ai_, axis=1, keepdims=True)
            wi_ = jnp.sum(vr * Ai_ - vi * Ar_, axis=1, keepdims=True)
            Ar_ = Ar_ - tau * (vr * wr_ - vi * wi_)
            Ai_ = Ai_ - tau * (vr * wi_ + vi * wr_)
            ur_ = jnp.sum(Ar_ * vTr - Ai_ * vTi, axis=2, keepdims=True)
            ui_ = jnp.sum(Ar_ * vTi + Ai_ * vTr, axis=2, keepdims=True)
            Ar_ = Ar_ - tau * (ur_ * vTr + ui_ * vTi)
            Ai_ = Ai_ - tau * (ui_ * vTr - ur_ * vTi)
            lwr = jnp.sum(vr * Lr_ + vi * Li_, axis=1, keepdims=True)
            lwi = jnp.sum(vr * Li_ - vi * Lr_, axis=1, keepdims=True)
            Lr_ = Lr_ - tau * (vr * lwr - vi * lwi)
            Li_ = Li_ - tau * (vr * lwi + vi * lwr)
            return (Ar_, Ai_, Lr_, Li_)

        _, _, Lr_, Li_ = lax.fori_loop(0, kw - 1, hh_body,
                                       (Ap_r, Ap_i, Lr_, Li_))

        # per-lane gate: non-deflating lanes keep H via an identity L
        Lr_ = jnp.where(apply_l, Lr_, eyep)
        Li_ = jnp.where(apply_l, Li_, 0.)

        # ---- apply H <- P H P^H, Z^T <- conj(P) Z^T via embeddings ---------
        # E (b, n, kp): E[l, r, q] = (r == s_l - 1 + q); P = E L E^T outside
        # the window rows/cols P is the identity.
        re_ = lax.broadcasted_iota(jnp.int32, (b, n, kp), 1)
        qe_ = lax.broadcasted_iota(jnp.int32, (b, n, kp), 2)
        E = ((re_ == s - 1 + qe_) & live).astype(jnp.float32)
        in_rc = (iota_n >= s - 1) & (iota_n < s - 1 + kp) & live  # (b,1,n)
        # (b, n, 1) twin built from its own iota: Mosaic cannot transpose
        # a boolean vector
        iota_c1 = lax.broadcasted_iota(jnp.int32, (b, n, 1), 1)
        in_row = (iota_c1 >= s - 1) & (iota_c1 < s - 1 + kp) & live

        # rows: H[s-1:s-1+kp, :] <- L @ rows
        RsR = _dotg(E, Hr, ((1,), (1,)), prec)               # (b, kp, n)
        RsI = _dotg(E, Hi, ((1,), (1,)), prec)
        NRr = (_dotg(Lr_, RsR, ((2,), (1,)), prec)
               - _dotg(Li_, RsI, ((2,), (1,)), prec))
        NRi = (_dotg(Lr_, RsI, ((2,), (1,)), prec)
               + _dotg(Li_, RsR, ((2,), (1,)), prec))
        Hr = jnp.where(in_row, 0., Hr) + _dotg(E, NRr, ((2,), (1,)), prec)
        Hi = jnp.where(in_row, 0., Hi) + _dotg(E, NRi, ((2,), (1,)), prec)

        # cols: H[:, s-1:s-1+kp] <- cols @ L^H
        CsR = _dotg(Hr, E, ((2,), (1,)), prec)               # (b, n, kp)
        CsI = _dotg(Hi, E, ((2,), (1,)), prec)
        NCr = (_dotg(CsR, Lr_, ((2,), (2,)), prec)
               + _dotg(CsI, Li_, ((2,), (2,)), prec))
        NCi = (_dotg(CsI, Lr_, ((2,), (2,)), prec)
               - _dotg(CsR, Li_, ((2,), (2,)), prec))
        Hr = jnp.where(in_rc, 0., Hr) + _dotg(NCr, E, ((2,), (2,)), prec)
        Hi = jnp.where(in_rc, 0., Hi) + _dotg(NCi, E, ((2,), (2,)), prec)

        # structure enforcement inside the transformed block: zeros below
        # the subdiagonal, dead subdiagonal beyond the undeflated run
        in_r2 = (rows >= s - 1) & (rows < s - 1 + kb)
        in_c2 = (cols >= s - 1) & (cols < s - 1 + kb)
        below = in_r2 & in_c2 & (cols <= rows - 2)
        subdead = in_r2 & in_c2 & (cols == rows - 1) & (rows >= s + ku)
        kill = (below | subdead) & apply_l
        hr_ref[:] = jnp.where(kill, 0., Hr)
        hi_ref[:] = jnp.where(kill, 0., Hi)

        # Z^T rows: <- conj(L) @ rows
        Zr = ztr_ref[:]
        Zi = zti_ref[:]
        ZsR = _dotg(E, Zr, ((1,), (1,)), prec)
        ZsI = _dotg(E, Zi, ((1,), (1,)), prec)
        NZr = (_dotg(Lr_, ZsR, ((2,), (1,)), prec)
               + _dotg(Li_, ZsI, ((2,), (1,)), prec))
        NZi = (_dotg(Lr_, ZsI, ((2,), (1,)), prec)
               - _dotg(Li_, ZsR, ((2,), (1,)), prec))
        ztr_ref[:] = (jnp.where(in_row, 0., Zr)
                      + _dotg(E, NZr, ((2,), (1,)), prec))
        zti_ref[:] = (jnp.where(in_row, 0., Zi)
                      + _dotg(E, NZi, ((2,), (1,)), prec))

        hi = jnp.where(apply_l, hi_new, hi)

        # ==== pipelined m-bulge chase (deferred columns) =====================
        wr_ref[:] = eye
        wi_ref[:] = jnp.zeros_like(eye)
        valid = (lo + 2 * iota_m + 1) <= hi                  # (b, 1, m)
        zeros_m = jnp.zeros((b, 1, m), jnp.float32)

        def step(t, carry):
            xr_v, xi_v, yr_v, yi_v = carry
            for i in range(m):
                k_raw = t - 2 * i
                # hardware dynamic slices do NOT clamp like the interpreter
                k = jnp.clip(k_raw, 0, n - 2)
                valid_i = jnp.sum(jnp.where(iota_m == i,
                                            valid.astype(jnp.int32), 0),
                                  axis=2, keepdims=True) > 0
                sg_r = at_lane_m(shr, i)
                sg_i = at_lane_m(shi, i)

                intro = (k_raw == lo) & valid_i
                hk_r = hr_ref[:, pl.ds(k, 1), :]
                hk_i = hi_ref[:, pl.ds(k, 1), :]
                h1_r = hr_ref[:, pl.ds(k + 1, 1), :]
                h1_i = hi_ref[:, pl.ds(k + 1, 1), :]
                wk_r = wr_ref[:, pl.ds(k, 1), :]
                wk_i = wi_ref[:, pl.ds(k, 1), :]
                mk_kr = jnp.sum(hk_r * wk_r - hk_i * wk_i,
                                axis=2, keepdims=True)
                mk_ki = jnp.sum(hk_r * wk_i + hk_i * wk_r,
                                axis=2, keepdims=True)
                m1_kr = jnp.sum(h1_r * wk_r - h1_i * wk_i,
                                axis=2, keepdims=True)
                m1_ki = jnp.sum(h1_r * wk_i + h1_i * wk_r,
                                axis=2, keepdims=True)
                xr = at_lane_m(xr_v, i)
                xi = at_lane_m(xi_v, i)
                yr = at_lane_m(yr_v, i)
                yi = at_lane_m(yi_v, i)
                xr = jnp.where(intro, mk_kr - sg_r, xr)
                xi = jnp.where(intro, mk_ki - sg_i, xi)
                yr = jnp.where(intro, m1_kr, yr)
                yi = jnp.where(intro, m1_ki, yi)

                active = (k_raw >= lo) & (k_raw < hi) & valid_i
                c, sr, si = _givens(xr, xi, yr, yi, active)

                nk_r = c * hk_r + (sr * h1_r - si * h1_i)
                nk_i = c * hk_i + (sr * h1_i + si * h1_r)
                n1_r = c * h1_r - (sr * hk_r + si * hk_i)
                n1_i = c * h1_i - (sr * hk_i - si * hk_r)
                hr_ref[:, pl.ds(k, 1), :] = nk_r
                hi_ref[:, pl.ds(k, 1), :] = nk_i
                hr_ref[:, pl.ds(k + 1, 1), :] = n1_r
                hi_ref[:, pl.ds(k + 1, 1), :] = n1_i

                w1_r = wr_ref[:, pl.ds(k + 1, 1), :]
                w1_i = wi_ref[:, pl.ds(k + 1, 1), :]
                mw_r = c * wk_r + (sr * w1_r + si * w1_i)
                mw_i = c * wk_i + (sr * w1_i - si * w1_r)
                m1w_r = c * w1_r - (sr * wk_r - si * wk_i)
                m1w_i = c * w1_i - (sr * wk_i + si * wk_r)
                wr_ref[:, pl.ds(k, 1), :] = mw_r
                wi_ref[:, pl.ds(k, 1), :] = mw_i
                wr_ref[:, pl.ds(k + 1, 1), :] = m1w_r
                wi_ref[:, pl.ds(k + 1, 1), :] = m1w_i

                k2 = jnp.minimum(k + 2, n - 1)
                h2_r = hr_ref[:, pl.ds(k2, 1), :]
                h2_i = hi_ref[:, pl.ds(k2, 1), :]
                xn_r = jnp.sum(n1_r * mw_r - n1_i * mw_i,
                               axis=2, keepdims=True)
                xn_i = jnp.sum(n1_r * mw_i + n1_i * mw_r,
                               axis=2, keepdims=True)
                y2_r = jnp.sum(h2_r * mw_r - h2_i * mw_i,
                               axis=2, keepdims=True)
                y2_i = jnp.sum(h2_r * mw_i + h2_i * mw_r,
                               axis=2, keepdims=True)
                nxt_ok = (k_raw + 2) <= hi
                yn_r = jnp.where(nxt_ok, y2_r, 0.)
                yn_i = jnp.where(nxt_ok, y2_i, 0.)
                xr_new = jnp.where(active, xn_r, xr)
                xi_new = jnp.where(active, xn_i, xi)
                yr_new = jnp.where(active, yn_r, yr)
                yi_new = jnp.where(active, yn_i, yi)
                sel = iota_m == i
                xr_v = jnp.where(sel, xr_new, xr_v)
                xi_v = jnp.where(sel, xi_new, xi_v)
                yr_v = jnp.where(sel, yr_new, yr_v)
                yi_v = jnp.where(sel, yi_new, yi_v)
            return (xr_v, xi_v, yr_v, yi_v)

        lo_s = jnp.min(lo)
        t_end = jnp.minimum(jnp.max(hi) + 2 * m, n - 1 + 2 * m)
        lax.fori_loop(lo_s, t_end, step,
                      (zeros_m, zeros_m, zeros_m, zeros_m))

        # ---- apply deferred columns: H <- H W^T, Z^T <- W Z^T --------------
        dn_t = (((2,), (2,)), ((0,), (0,)))
        dn_mz = (((2,), (1,)), ((0,), (0,)))

        def apply_slab(width):
            def f():
                Wr = wr_ref[:, :width, :width]
                Wi = wi_ref[:, :width, :width]
                for r0 in range(0, n, _CHUNK):
                    r1 = min(r0 + _CHUNK, n)
                    Hr = hr_ref[:, r0:r1, :width]
                    Hi = hi_ref[:, r0:r1, :width]
                    Hr2 = (lax.dot_general(Hr, Wr, dn_t, precision=prec,
                                           preferred_element_type=jnp.float32)
                           - lax.dot_general(Hi, Wi, dn_t, precision=prec,
                                             preferred_element_type=jnp.float32))
                    Hi2 = (lax.dot_general(Hr, Wi, dn_t, precision=prec,
                                           preferred_element_type=jnp.float32)
                           + lax.dot_general(Hi, Wr, dn_t, precision=prec,
                                             preferred_element_type=jnp.float32))
                    hm = hess_mask[:, r0:r1, :width]
                    hr_ref[:, r0:r1, :width] = jnp.where(hm, Hr2, 0.)
                    hi_ref[:, r0:r1, :width] = jnp.where(hm, Hi2, 0.)
                for c0 in range(0, n, _CHUNK):
                    c1 = min(c0 + _CHUNK, n)
                    Zr = ztr_ref[:, :width, c0:c1]
                    Zi = zti_ref[:, :width, c0:c1]
                    Zr2 = (lax.dot_general(Wr, Zr, dn_mz, precision=prec,
                                           preferred_element_type=jnp.float32)
                           - lax.dot_general(Wi, Zi, dn_mz, precision=prec,
                                             preferred_element_type=jnp.float32))
                    Zi2 = (lax.dot_general(Wr, Zi, dn_mz, precision=prec,
                                           preferred_element_type=jnp.float32)
                           + lax.dot_general(Wi, Zr, dn_mz, precision=prec,
                                             preferred_element_type=jnp.float32))
                    ztr_ref[:, :width, c0:c1] = Zr2
                    zti_ref[:, :width, c0:c1] = Zi2
            return f

        gran = 128 if n <= 640 else 256
        widths = [min(gran * (i + 1), n) for i in range((n + gran - 1)
                                                        // gran)]
        # rotations touch rows up to hi+1; +2m covers the bulge drain rows
        branch = jnp.minimum((jnp.max(hi) + 2 * m + 2) // gran,
                             len(widths) - 1)
        lax.switch(branch, [apply_slab(w) for w in widths])
        # stall counts sweeps without deflation progress from EITHER the
        # detection pass or AED (hi here is post-AED), per lane
        stall = jnp.where((hi < hi_prev) | exc, 0, stall + 1)
        return (hi, it + 1, stall)

    def cond(state):
        hi, it, _ = state
        return jnp.any(hi > 0) & (it < max_sweeps)

    hi0 = jnp.full((b, 1, 1), n - 1, jnp.int32)
    stall0 = jnp.zeros((b, 1, 1), jnp.int32)
    hi_f, it_f, _ = lax.while_loop(cond, body, (hi0, jnp.int32(0), stall0))

    lower = rows > cols
    hr_ref[:] = jnp.where(lower, 0., hr_ref[:])
    hi_ref[:] = jnp.where(lower, 0., hi_ref[:])
    sub = lax.broadcasted_iota(jnp.int32, (b, 2, n), 1)
    stat_ref[:] = jnp.where(sub == 0,
                            jnp.broadcast_to(hi_f.astype(jnp.float32),
                                             (b, 2, n)),
                            it_f.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('m', 'kw', 'max_iter_factor',
                                             'interpret'))
def _call_baed(Hr, Hi, ZTr, ZTi, m, kw, max_iter_factor, interpret):
    b, n = Hr.shape[0], Hr.shape[-1]
    max_sweeps = (max_iter_factor * n) // m + 8 * m + 40
    kern = functools.partial(_kernel_baed, max_sweeps=max_sweeps, n=n,
                             b=b, m=m, kw=kw)
    out = pl.pallas_call(
        kern,
        out_shape=([jax.ShapeDtypeStruct((b, n, n), Hr.dtype)] * 6
                   + [jax.ShapeDtypeStruct((b, 2, n), jnp.float32)]),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 2 ** 20),
        interpret=interpret,
    )(Hr, Hi, ZTr, ZTi)
    return out[:4] + (out[6],)


def schur_qr_pallas_baed(Hr, Hi, Qr, Qi, m=8, kw=64, max_iter_factor=40,
                         interpret=False, return_stats=False):
    """Batched AED + multishift Schur QR: [B, n, n] split-real Hessenberg
    pairs -> Schur factors.

    Drop-in for eig_qr_pallas.schur_qr_pallas_acc with the zlaqr0-family
    internals: per sweep, the trailing ``kw`` window of each lane is
    Schur-factored in-kernel, converged eigenvalues deflate through the
    spike test without being chased, and ``m`` bulges carrying the
    undeflated window eigenvalues as shifts run down the window in one
    pipelined pass.  Non-converged lanes NaN-poison their Schur diagonal
    (the zgeev-INFO analogue).  ``n`` must exceed ``kw + 9`` so the spike
    transform fits; callers should route smaller problems to
    schur_qr_pallas_acc.
    """
    b, n = Hr.shape[0], Hr.shape[-1]
    if n < kw + 10:
        raise ValueError(f'n={n} too small for AED window kw={kw}')
    # VMEM model: 6 resident (n,n) refs + 4 input copies + GEMM/masking
    # temporaries (the AED apply keeps ~4 (n,n)-sized values live)
    per = 56 * n * n * np.dtype(Hr.dtype).itemsize
    chunk = max(1, min(b, _VMEM_BUDGET // per))
    ZTr = jnp.swapaxes(Qr, -2, -1)
    ZTi = jnp.swapaxes(Qi, -2, -1)
    outs = []
    for st in range(0, b, chunk):
        e = min(st + chunk, b)
        outs.append(_call_baed(Hr[st:e], Hi[st:e], ZTr[st:e], ZTi[st:e],
                               m, kw, max_iter_factor, interpret))
    Tr, Ti, Zr, Zi, stat = [jnp.concatenate([o[i] for o in outs], axis=0)
                            for i in range(5)]
    hi_f = stat[:, 0, 0]
    sweeps = stat[:, 1, 0]
    bad = (hi_f > 0)[:, None, None]
    eye = jnp.eye(n, dtype=bool)[None]
    Tr = jnp.where(bad & eye, jnp.nan, Tr)
    Ti = jnp.where(bad & eye, jnp.nan, Ti)
    out = (Tr, Ti, jnp.swapaxes(Zr, -2, -1), jnp.swapaxes(Zi, -2, -1))
    if return_stats:
        return out + ((hi_f.astype(jnp.int32), sweeps.astype(jnp.int32)),)
    return out
