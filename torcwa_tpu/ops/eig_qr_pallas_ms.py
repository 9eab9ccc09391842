"""Multishift Pallas Schur QR: m pipelined bulges per sweep (single matrix).

The deferred-column kernel in eig_qr_pallas.py pays two prefix GEMMs
(H <- H W^T, Z^T <- W Z^T) per single-shift sweep — O(n^2) MXU work that,
integrated over the ~2.5n sweeps a spectrum needs, is the dominant
O(n^3.. n^4/const) term at large n.  This kernel chases a CHAIN of m
bulges per sweep (LAPACK zlaqr5's small-bulge multishift, shaped to this
runtime): per sweep it advances m shifts of convergence, so the sweep
count — and with it both the GEMM count and the serial step count —
drops ~m-fold.

Structure per sweep:
  * deflation window [lo, hi] from subdiagonal magnitudes (same LAPACK
    thresholds as the single-shift kernel);
  * m shifts = eigenvalues of the trailing m x m block, computed by an
    in-kernel mini single-shift QR on a VMEM scratch (the m x m block is
    extracted with one-hot selection matmuls — per-lane dynamic slicing
    is not lowerable here);
  * the step loop runs t = lo .. hi + 2m; bulge i occupies row pair
    (t - 2i, t - 2i + 1) — disjoint pairs, spacing 2, introduced at the
    top when t - 2i == lo and retired when it passes hi.  Row-pair
    updates and the deferred-column dot products (next rotation source
    from M = H @ W^T) are exactly the single-shift kernel's, unrolled
    over the m bulges (leading bulge first, so trailing bulges read
    already-updated rows);
  * one prefix GEMM pair per sweep applies the accumulated W.

Specialized to batch == 1: the production large-n workloads (Example6's
[15,8], Example3's [20,20], the order-25 north star) are single-matrix
solves; batched small-n sweeps stay on the single-shift batched kernel
where the batch already amortizes the per-step overhead.

Reference baseline: cuSOLVER/MAGMA zgeev behind torch.linalg.eig
(/root/reference/torcwa/rcwa.py:1236).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['schur_qr_pallas_ms']

_F32EPS = 1.1920929e-07
_SMLNUM = 1e-31
_CHUNK = 512


def _givens(xr, xi, yr, yi, active):
    """Complex Givens (c real, s pair) with identity fallback."""
    ax2 = xr * xr + xi * xi
    ay2 = yr * yr + yi * yi
    dn = jnp.sqrt(ax2 + ay2)
    ax = jnp.sqrt(ax2)
    safe_dn = jnp.where(dn > 0, dn, 1.)
    safe_ax = jnp.where(ax > 0, ax, 1.)
    c = jnp.where(dn > 0, ax / safe_dn, 1.)
    den = safe_ax * safe_dn
    both = (ax > 0) & (dn > 0)
    sr = jnp.where(both, (xr * yr + xi * yi) / den, 0.)
    si = jnp.where(both, (xi * yr - xr * yi) / den, 0.)
    swap = (ax2 == 0) & (ay2 > 0)
    c = jnp.where(swap, 0., c)
    sr = jnp.where(swap, 1., sr)
    si = jnp.where(swap, 0., si)
    c = jnp.where(active, c, 1.)
    sr = jnp.where(active, sr, 0.)
    si = jnp.where(active, si, 0.)
    return c, sr, si


def _wilkinson(ar, ai, br, bi, cr, ci, dr, di):
    """Eigenvalues of [[a,b],[c,d]]; returns both roots (pairs)."""
    trr, tri = ar + dr, ai + di
    detr = (ar * dr - ai * di) - (br * cr - bi * ci)
    deti = (ar * di + ai * dr) - (br * ci + bi * cr)
    qr_ = (trr * trr - tri * tri) - 4 * detr
    qi_ = 2 * trr * tri - 4 * deti
    qmag = jnp.sqrt(qr_ * qr_ + qi_ * qi_)
    dscr = jnp.sqrt(jnp.maximum((qmag + qr_) / 2, 0.))
    # zero-safe branch sign: a NEGATIVE REAL discriminant (qi_ == 0,
    # qmag > qr_) must still produce the +-i sqrt pair; jnp.sign(0)=0
    # used to zero it, collapsing the Wilkinson shift to tr/2 and
    # stalling pure-imaginary spectra (e.g. antisymmetric matrices)
    dsci = jnp.where(qi_ >= 0, 1., -1.) * jnp.sqrt(
        jnp.maximum((qmag - qr_) / 2, 0.))
    return ((trr + dscr) / 2, (tri + dsci) / 2,
            (trr - dscr) / 2, (tri - dsci) / 2)


def _mini_eigvals(Br, Bi, m):
    """Eigenvalues of a (1, m, m) upper-Hessenberg-ish block by masked
    single-shift QR (v2-kernel style; no Z accumulation, fixed budget).

    Shift quality, not machine-precision eigenvalues, is the goal — the
    diagonal after deflation-driven sweeps is returned as (1, 1, m) pairs.
    """
    rows = lax.broadcasted_iota(jnp.int32, (1, m, m), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, m, m), 2)
    iota_m = lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)

    def diag_vec(Xr, Xi, off):
        msk = rows == (cols - off)
        return (jnp.sum(jnp.where(msk, Xr, 0.), axis=1, keepdims=True),
                jnp.sum(jnp.where(msk, Xi, 0.), axis=1, keepdims=True))

    def at_lane(v, j):
        return jnp.sum(jnp.where(iota_m == j, v, 0.), axis=2, keepdims=True)

    def body(state):
        Br, Bi, hi, it = state
        dr, di = diag_vec(Br, Bi, 0)
        d = jnp.sqrt(dr * dr + di * di)
        sr_, si_ = diag_vec(Br, Bi, -1)
        sub2 = sr_ * sr_ + si_ * si_
        dshift = jnp.where(iota_m == m - 1, 0.,
                           pltpu.roll(d, shift=m - 1, axis=2))
        thresh = jnp.maximum(_F32EPS * (d + dshift), _SMLNUM)
        alive = sub2 > thresh * thresh
        lane = iota_m + 1
        hi = jnp.max(jnp.where((lane <= hi) & alive, lane, 0),
                     axis=2, keepdims=True)
        alive_prev = pltpu.roll(alive.astype(jnp.float32),
                                shift=1, axis=2) > 0.5
        lo = jnp.max(jnp.where((iota_m <= hi) &
                               ((iota_m == 0) | ~alive_prev),
                               iota_m, 0), axis=2, keepdims=True)

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
            Br, Bi, xr, xi, yr, yi = carry
            active = (k >= lo) & (k < hi)
            c, sr, si = _givens(xr, xi, yr, yi, active)
            is0 = rows == k
            is1 = rows == (k + 1)
            up_r = pltpu.roll(Br, shift=m - 1, axis=1)
            up_i = pltpu.roll(Bi, shift=m - 1, axis=1)
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

            jc0 = cols == k
            jc1 = cols == (k + 1)
            lf_r = pltpu.roll(Br, shift=m - 1, axis=2)
            lf_i = pltpu.roll(Bi, shift=m - 1, axis=2)
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
            ridx = lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
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
            return (Br, Bi, xr, xi, yr, yi)

        Br, Bi, _, _, _, _ = lax.fori_loop(
            0, m - 1, step, (Br, Bi, x0r, x0i, y0r, y0i))
        return (Br, Bi, hi, it + 1)

    # fixed budget (nested data-dependent while loops are riskier to lower
    # than fori here; an empty window makes the sweep a masked no-op, so
    # extra iterations are harmless)
    def fori_body(_, state):
        return body(state)

    hi0 = jnp.full((1, 1, 1), m - 1, jnp.int32)
    Br, Bi, _, _ = lax.fori_loop(0, 6 * m, fori_body,
                                 (Br, Bi, hi0, jnp.int32(0)))
    return diag_vec(Br, Bi, 0)


def _kernel_ms(hr_in, hi_in, ztr_in, zti_in,
               hr_ref, hi_ref, ztr_ref, zti_ref, wr_ref, wi_ref, stat_ref,
               *, max_sweeps: int, n: int, m: int):
    hr_ref[:] = hr_in[:]
    hi_ref[:] = hi_in[:]
    ztr_ref[:] = ztr_in[:]
    zti_ref[:] = zti_in[:]
    rows = lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    iota_n = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    iota_m = lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    eye = (rows == cols).astype(jnp.float32)
    hess_mask = rows <= cols + 1
    prec = lax.Precision.HIGHEST

    def diag_vec(Xr, Xi, off):
        msk = rows == (cols - off)
        return (jnp.sum(jnp.where(msk, Xr, 0.), axis=1, keepdims=True),
                jnp.sum(jnp.where(msk, Xi, 0.), axis=1, keepdims=True))

    def at_lane(v, j):
        return jnp.sum(jnp.where(iota_n == j, v, 0.), axis=2, keepdims=True)

    def at_lane_m(v, j):
        return jnp.sum(jnp.where(iota_m == j, v, 0.), axis=2, keepdims=True)

    def body(state):
        hi, it, stall = state
        hi_prev = hi
        Hr = hr_ref[:]
        Hi = hi_ref[:]

        # ---- deflation window (LAPACK thresholds) -------------------------
        dr, di = diag_vec(Hr, Hi, 0)
        d = jnp.sqrt(dr * dr + di * di)
        sr_, si_ = diag_vec(Hr, Hi, -1)
        sub2 = sr_ * sr_ + si_ * si_
        dshift = jnp.where(iota_n == n - 1, 0.,
                           pltpu.roll(d, shift=n - 1, axis=2))
        thresh = jnp.maximum(_F32EPS * (d + dshift), _SMLNUM)
        alive = sub2 > thresh * thresh
        lane = iota_n + 1
        hi = jnp.max(jnp.where((lane <= hi) & alive, lane, 0),
                     axis=2, keepdims=True)
        alive_prev = pltpu.roll(alive.astype(jnp.float32),
                                shift=1, axis=2) > 0.5
        lo = jnp.max(jnp.where((iota_n <= hi) &
                               ((iota_n == 0) | ~alive_prev),
                               iota_n, 0), axis=2, keepdims=True)

        # ---- shifts: m best eigenvalues of the trailing 2m block ----------
        # A kk=2m trailing block gives the mini QR more spectrum context
        # than the m-block (measured ~15% fewer sweeps); rows beyond hi are
        # masked to a diagonal so the mini-QR treats them as converged
        # padding.
        # pool size: the m-block mini QR — a 2m pool cuts sweeps ~15%
        # (numpy-model measured) but costs 2x the serial mini budget,
        # a net loss on chip; keep kk = m
        kk = m
        iota_kk = lax.broadcasted_iota(jnp.int32, (1, 1, kk), 2)
        base = jnp.maximum(hi - (kk - 1), lo)                # (1,1,1)
        krow = lax.broadcasted_iota(jnp.int32, (1, kk, 1), 1)
        rsel = (iota_n == (base + krow)).astype(jnp.float32)  # (1, kk, n)
        dn_rn = (((2,), (1,)), ((0,), (0,)))
        Hrows_r = lax.dot_general(rsel, Hr, dn_rn, precision=prec,
                                  preferred_element_type=jnp.float32)
        Hrows_i = lax.dot_general(rsel, Hi, dn_rn, precision=prec,
                                  preferred_element_type=jnp.float32)
        dn_nm = (((2,), (2,)), ((0,), (0,)))
        Br = lax.dot_general(Hrows_r, rsel, dn_nm, precision=prec,
                             preferred_element_type=jnp.float32)
        Bi = lax.dot_general(Hrows_i, rsel, dn_nm, precision=prec,
                             preferred_element_type=jnp.float32)
        krows = lax.broadcasted_iota(jnp.int32, (1, kk, kk), 1)
        kcols = lax.broadcasted_iota(jnp.int32, (1, kk, kk), 2)
        valid_rc = ((base + krows) <= hi) & ((base + kcols) <= hi)
        Br = jnp.where(valid_rc, Br, 0.)
        Bi = jnp.where(valid_rc, Bi, 0.)
        shr2, shi2 = _mini_eigvals(Br, Bi, kk)               # (1,1,kk)

        # ---- Wilkinson-style shift ordering --------------------------------
        # deflation is anchored at hi, so the leading bulge must carry the
        # shift closest to M[hi, hi] (the generalization of the Wilkinson
        # root choice); unordered shifts leave the bottom subdiagonal alive
        # and the window never shrinks.  Selection sort: the m closest of
        # the kk candidates land on lanes 0..m-1.
        hh_r = at_lane(dr, hi)
        hh_i = at_lane(di, hi)
        dist = (shr2 - hh_r) ** 2 + (shi2 - hh_i) ** 2
        big = jnp.float32(3.4e38)
        # padding lanes of the trailing block (global index beyond hi) hold
        # eigenvalue 0, NOT a spectrum estimate; when |M[hi, hi]| is small
        # they would sort ahead of the true shifts and the live bulges then
        # chase useless zero shifts forever (observed: a 2x2 window with
        # near-zero diagonal and eigenvalues ~ +-6.8i cycling for 900
        # sweeps).  Push them behind every valid shift.
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
        shr = out_r
        shi = out_i

        # exceptional sweep: perturbed trailing-diagonal shifts, fired only
        # after 13 sweeps without deflation progress (an unconditional
        # every-13th scramble destroys nearly-converged bottom rows)
        exc = stall >= 13
        # gather diag/subdiag of the trailing m-block from the kk pool at
        # clamped positions (one-hot matmul; lane-dim dynamic gathers do
        # not lower)
        pos = jnp.minimum(jnp.maximum(hi - (m - 1), lo) + iota_m, hi)
        gsel = ((base + krow) == pos).astype(jnp.float32)    # (1, kk, m)
        dg2_r = jnp.sum(jnp.where(krows == kcols, Br, 0.),
                        axis=1, keepdims=True)               # (1,1,kk)
        dg2_i = jnp.sum(jnp.where(krows == kcols, Bi, 0.),
                        axis=1, keepdims=True)
        sb2 = jnp.sqrt(jnp.sum(jnp.where(krows == kcols + 1,
                                         Br * Br + Bi * Bi, 0.),
                               axis=1, keepdims=True))
        dn_gath = (((2,), (1,)), ((0,), (0,)))
        tr_diag_r = lax.dot_general(dg2_r, gsel, dn_gath, precision=prec,
                                    preferred_element_type=jnp.float32)
        tr_diag_i = lax.dot_general(dg2_i, gsel, dn_gath, precision=prec,
                                    preferred_element_type=jnp.float32)
        sub_mag = lax.dot_general(sb2, gsel, dn_gath, precision=prec,
                                  preferred_element_type=jnp.float32)
        shr = jnp.where(exc, tr_diag_r + 0.75 * sub_mag, shr)
        shi = jnp.where(exc, tr_diag_i, shi)

        # ---- pipelined m-bulge chase --------------------------------------
        wr_ref[:] = eye
        wi_ref[:] = jnp.zeros_like(eye)

        # per-bulge (x, y) carried as (1,1,m) rows; bulge i valid iff its
        # chase fits the window
        ivec = iota_m
        valid = (lo + 2 * ivec + 1) <= hi                    # (1,1,m)

        zeros_m = jnp.zeros((1, 1, m), jnp.float32)

        def step(t, carry):
            xr_v, xi_v, yr_v, yi_v = carry
            for i in range(m):
                k_raw = t - 2 * i
                # hardware dynamic slices do NOT clamp like the interpreter:
                # out-of-range k (pipeline fill/drain of trailing bulges)
                # must be clamped explicitly; the rotation is identity when
                # inactive, so the clamped row-pair is read-modify-written
                # unchanged
                k = jnp.clip(k_raw, 0, n - 2)
                valid_i = jnp.sum(jnp.where(iota_m == i,
                                            valid.astype(jnp.int32), 0),
                                  axis=2, keepdims=True) > 0
                sg_r = at_lane_m(shr, i)
                sg_i = at_lane_m(shi, i)

                # --- introduction at the window top ------------------------
                intro = (k_raw == lo) & valid_i
                hk_r = hr_ref[:, pl.ds(k, 1), :]
                hk_i = hi_ref[:, pl.ds(k, 1), :]
                h1_r = hr_ref[:, pl.ds(k + 1, 1), :]
                h1_i = hi_ref[:, pl.ds(k + 1, 1), :]
                wk_r = wr_ref[:, pl.ds(k, 1), :]
                wk_i = wi_ref[:, pl.ds(k, 1), :]
                # M[k,k], M[k+1,k] from the deferred invariant M = H W^T
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

                # --- rotate H rows k, k+1 ----------------------------------
                nk_r = c * hk_r + (sr * h1_r - si * h1_i)
                nk_i = c * hk_i + (sr * h1_i + si * h1_r)
                n1_r = c * h1_r - (sr * hk_r + si * hk_i)
                n1_i = c * h1_i - (sr * hk_i - si * hk_r)
                hr_ref[:, pl.ds(k, 1), :] = nk_r
                hi_ref[:, pl.ds(k, 1), :] = nk_i
                hr_ref[:, pl.ds(k + 1, 1), :] = n1_r
                hi_ref[:, pl.ds(k + 1, 1), :] = n1_i

                # --- W <- conj(G) W ----------------------------------------
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

                # --- next rotation source ----------------------------------
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
        # the trailing bulge (i = m-1) finishes at t = hi - 1 + 2(m-1)
        t_end = jnp.minimum(jnp.max(hi) + 2 * m, n - 1 + 2 * m)
        lax.fori_loop(lo_s, t_end, step,
                      (zeros_m, zeros_m, zeros_m, zeros_m))

        # ---- apply deferred columns (prefix slab, as in the acc kernel) ---
        dn_t = (((2,), (2,)), ((0,), (0,)))
        dn_mz = (((2,), (1,)), ((0,), (0,)))

        def apply_slab(width):
            # chunked so GEMM temporaries stay <= (1, _CHUNK, width) each
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

        widths = [min(256 * (i + 1), n) for i in range((n + 255) // 256)]
        branch = jnp.minimum((jnp.max(hi) + 2) // 256, len(widths) - 1)
        lax.switch(branch, [apply_slab(w) for w in widths])
        stall = jnp.where(jnp.any(hi < hi_prev) | exc, 0, stall + 1)
        return (hi, it + 1, stall)

    def cond(state):
        hi, it, _ = state
        return jnp.any(hi > 0) & (it < max_sweeps)

    hi0 = jnp.full((1, 1, 1), n - 1, jnp.int32)
    hi_f, it_f, _ = lax.while_loop(cond, body,
                                   (hi0, jnp.int32(0), jnp.int32(0)))

    lower = rows > cols
    hr_ref[:] = jnp.where(lower, 0., hr_ref[:])
    hi_ref[:] = jnp.where(lower, 0., hi_ref[:])
    sub = lax.broadcasted_iota(jnp.int32, (1, 2, n), 1)
    stat_ref[:] = jnp.where(sub == 0,
                            jnp.broadcast_to(hi_f.astype(jnp.float32),
                                             (1, 2, n)),
                            it_f.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('m', 'max_iter_factor',
                                             'interpret'))
def _call_ms(Hr, Hi, ZTr, ZTi, m, max_iter_factor, interpret):
    n = Hr.shape[-1]
    # m shifts retire per sweep; keep the same total-shift budget as the
    # single-shift kernel plus slack for partial windows
    max_sweeps = (max_iter_factor * n) // m + 8 * m + 40
    kern = functools.partial(_kernel_ms, max_sweeps=max_sweeps, n=n, m=m)
    out = pl.pallas_call(
        kern,
        out_shape=([jax.ShapeDtypeStruct((1, n, n), Hr.dtype)] * 6
                   + [jax.ShapeDtypeStruct((1, 2, n), jnp.float32)]),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 2 ** 20),
        interpret=interpret,
    )(Hr, Hi, ZTr, ZTi)
    return out[:4] + (out[6],)


def schur_qr_pallas_ms(Hr, Hi, Qr, Qi, m=8, max_iter_factor=40,
                       interpret=False, return_stats=False):
    """Multishift Schur QR on ONE split-real Hessenberg pair [n, n].

    Drop-in for eig_qr_pallas.schur_qr_pallas_acc at batch 1; ``m`` bulges
    chased per sweep.  Non-converged spectra are NaN-poisoned exactly like
    the single-shift kernel.
    """
    n = Hr.shape[-1]
    ZTr = jnp.swapaxes(Qr, -2, -1)
    ZTi = jnp.swapaxes(Qi, -2, -1)
    Tr, Ti, Zr, Zi, stat = _call_ms(Hr[None], Hi[None], ZTr[None], ZTi[None],
                                    m, max_iter_factor, interpret)
    hi_f = stat[:, 0, 0]
    sweeps = stat[:, 1, 0]
    bad = (hi_f > 0)[:, None, None]
    eye = jnp.eye(n, dtype=bool)[None]
    Tr = jnp.where(bad & eye, jnp.nan, Tr)
    Ti = jnp.where(bad & eye, jnp.nan, Ti)
    out = (Tr[0], Ti[0], jnp.swapaxes(Zr, -2, -1)[0],
           jnp.swapaxes(Zi, -2, -1)[0])
    if return_stats:
        return out + ((hi_f[0].astype(jnp.int32),
                       sweeps[0].astype(jnp.int32)),)
    return out
