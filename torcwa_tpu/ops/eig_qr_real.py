"""Split-real TPU eigensolver: complex eig on (re, im) float pairs.

The production TPU backend for the general complex eigendecomposition.
Same algorithm as ``eig_qr.py`` (Householder Hessenberg -> implicitly
single-shifted QR -> back-substitution eigenvectors), but every array is a
(re, im) pair of real floats and all complex arithmetic is explicit.

Why split-real rather than complex64 arrays:

* TPUs have no complex compute units — XLA decomposes complex ops into real
  ones anyway; doing it explicitly lets every matmul hit the MXU directly
  and is the layout Pallas kernels require.
* The TPU runtime in this environment does not lower several complex64
  patterns at all (``lax.while_loop``/``fori_loop``/``scan`` with complex
  carries, dynamic-index scatter on complex) — the loops at the heart of a
  QR iteration.  Split-real floats lower everywhere.

The reference runs the same mathematical kernel through cuSOLVER/MAGMA
zgeev (torcwa rcwa.py:1236 via torch.linalg.eig).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['eig_qr_real', 'eig_qr_split']

# Single-matrix solves at n >= this use the HBM-resident pipeline
# (blocked WY Hessenberg + windowed-multishift HBM Schur QR with
# in-kernel AED + row-block eigenvector solve).  Measured on chip, the
# AED pipeline beats the VMEM-resident multishift kernel at every
# n >= 512 (0.24 vs 0.32 s at n=512, 0.45 vs 0.95 at n=882, 0.57 vs
# 1.52 at n=1054); below 512 the batched single-shift kernel wins.
_HBM_MIN_N_SINGLE = 512
# Batched solves hold VMEM-chunked lanes in the batched kernel while a
# chunk fits >= 2 lanes (the batch amortizes per-step overhead, see
# _acc_chunk); otherwise lanes run sequentially through the HBM
# pipeline.
_HBM_MIN_N = 1300          # retained for reference; routing uses _acc_chunk


def _acc_chunk(n):
    """Lanes per VMEM chunk the batched acc kernel would use at size n
    (mirrors eig_qr_pallas.schur_qr_pallas_acc's budget arithmetic)."""
    from .eig_qr_pallas import _VMEM_BUDGET
    per = 48 * n * n * 4                      # float32 lanes
    return max(1, _VMEM_BUDGET // per)
# Chase-window width.  Chip A/B (r5, bench_logs/hbm_ab_r5.log): the
# chase is per-rotation WIDTH-bound (each rotation's row ops span wb
# lanes), so narrower windows win despite 3x the window count per
# sweep: n=3362 m=24 wb 512/384/256 -> 2.55/2.43/2.37 s steady;
# n=5202 m=32 -> 5.8/5.6/5.4 s.  128 would leave stride <= 0.
_HBM_WINDOW = 256
# deflation-threshold multiplier for the HBM QR (chip A/B, r5): the
# nibble effective-window fix + defl_mult=4 took n=3362 m=24 from
# 3.24-3.27 s to 2.55-2.57 s and n=5202 m=32 from 6.95-7.39 s to
# 5.78-6.32 s (both at wb=512), with end-to-end accuracy unchanged
# (same rationale as eig_qr_pallas._DEFL_MULT: deflation backward
# error O(4 eps |H|)).
_HBM_DEFL = 4.0


def _hbm_shifts(n):
    """Shift count per sweep for the HBM QR, by matrix size (chip-measured
    on random split-real pairs, scripts/m_sweep_check.py, wb=512 kw=64):

      n=3362: m=16 4.01s / m=24 3.44s / m=32 3.57s / m=48 4.42s
      n=5202: m=16 8.66s / m=24 8.24s / m=32 8.15s

    Small n is sweep-fixed-cost bound (band refresh + AED amortize over
    m), large n chase-rotation bound (rotations = total shifts x span,
    m-independent), and shift quality degrades once m crowds the kw=64
    AED window (m=48 sweeps drop 170->140 but total shifts RISE 24%).
    """
    return 24 if n < 4200 else 32


def _consts(rdtype):
    if np.dtype(rdtype) == np.dtype(np.float32):
        return 1.1920929e-07, 1e-31
    return 2.220446049250313e-16, 1e-291


# -- small complex helpers on (re, im) pairs --------------------------------

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    d = jnp.where(d > 0, d, 1.)
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _cabs2(ar, ai):
    return ar * ar + ai * ai


def _csqrt(ar, ai):
    """Principal complex sqrt on real pairs."""
    r = jnp.sqrt(ar * ar + ai * ai)
    re = jnp.sqrt(jnp.maximum((r + ar) / 2, 0.))
    im_mag = jnp.sqrt(jnp.maximum((r - ar) / 2, 0.))
    im = jnp.where(ai < 0, -im_mag, im_mag)
    return re, im


# ---------------------------------------------------------------------------
# Hessenberg reduction (split-real Householder)
# ---------------------------------------------------------------------------

def hessenberg_real(Ar, Ai):
    n = Ar.shape[-1]
    rdtype = Ar.dtype
    if n <= 2:
        eye = jnp.eye(n, dtype=rdtype)
        return Ar, Ai, eye, jnp.zeros_like(eye)

    idx = jnp.arange(n)

    def step(k, state):
        Hr, Hi, Qr, Qi = state
        mask = (idx > k).astype(rdtype)
        xr = Hr[:, k] * mask
        xi = Hi[:, k] * mask
        ar_, ai_ = Hr[k + 1, k], Hi[k + 1, k]
        xnorm = jnp.sqrt(jnp.sum(xr * xr + xi * xi))
        aabs = jnp.sqrt(ar_ * ar_ + ai_ * ai_)
        safe = jnp.where(aabs > 0, aabs, 1.)
        phr = jnp.where(aabs > 0, ar_ / safe, 1.)
        phi = jnp.where(aabs > 0, ai_ / safe, 0.)
        vr = xr.at[k + 1].add(phr * xnorm)
        vi = xi.at[k + 1].add(phi * xnorm)
        vnorm2 = jnp.sum(vr * vr + vi * vi)
        beta = jnp.where(vnorm2 > 0, 2. / jnp.where(vnorm2 > 0, vnorm2, 1.), 0.)

        # w = beta * v^H H   (conj(v) @ H)
        wr = beta * (vr @ Hr + vi @ Hi)
        wi = beta * (vr @ Hi - vi @ Hr)
        # H -= v w
        Hr = Hr - (vr[:, None] * wr[None, :] - vi[:, None] * wi[None, :])
        Hi = Hi - (vr[:, None] * wi[None, :] + vi[:, None] * wr[None, :])
        # u = beta * H v
        ur = beta * (Hr @ vr - Hi @ vi)
        ui = beta * (Hr @ vi + Hi @ vr)
        # H -= u v^H
        Hr = Hr - (ur[:, None] * vr[None, :] + ui[:, None] * vi[None, :])
        Hi = Hi - (ui[:, None] * vr[None, :] - ur[:, None] * vi[None, :])
        # Q -= (beta Q v) v^H
        uqr = beta * (Qr @ vr - Qi @ vi)
        uqi = beta * (Qr @ vi + Qi @ vr)
        Qr = Qr - (uqr[:, None] * vr[None, :] + uqi[:, None] * vi[None, :])
        Qi = Qi - (uqi[:, None] * vr[None, :] - uqr[:, None] * vi[None, :])
        return (Hr, Hi, Qr, Qi)

    eye = jnp.eye(n, dtype=rdtype)
    Hr, Hi, Qr, Qi = lax.fori_loop(
        0, n - 2, step, (Ar, Ai, eye, jnp.zeros_like(eye)))
    row = idx[:, None]
    col = idx[None, :]
    below = row > col + 1
    Hr = jnp.where(below, 0., Hr)
    Hi = jnp.where(below, 0., Hi)
    return Hr, Hi, Qr, Qi


# ---------------------------------------------------------------------------
# QR iteration
# ---------------------------------------------------------------------------

def _givens_real(fr, fi, gr, gi):
    """(c real, s complex pair) with [[c, s], [-conj(s), c]] [f;g] = [r;0]."""
    af2 = fr * fr + fi * fi
    ag2 = gr * gr + gi * gi
    d = jnp.sqrt(af2 + ag2)
    af = jnp.sqrt(af2)
    safe_d = jnp.where(d > 0, d, 1.)
    safe_af = jnp.where(af > 0, af, 1.)
    c = jnp.where(d > 0, af / safe_d, 1.)
    denom = safe_af * safe_d
    sr = jnp.where((af > 0) & (d > 0), (fr * gr + fi * gi) / denom, 0.)
    si = jnp.where((af > 0) & (d > 0), (fi * gr - fr * gi) / denom, 0.)
    # f == 0, g != 0
    swap = (af2 == 0) & (ag2 > 0)
    c = jnp.where(swap, 0., c)
    sr = jnp.where(swap, 1., sr)
    si = jnp.where(swap, 0., si)
    return c, sr, si


def _wilkinson_real(ar, ai, br, bi, cr, ci, dr, di):
    """Eigenvalue of [[a,b],[c,d]] closest to d, on real pairs."""
    trr, tri = ar + dr, ai + di
    detr, deti = _cmul(ar, ai, dr, di)
    bcr, bci = _cmul(br, bi, cr, ci)
    detr, deti = detr - bcr, deti - bci
    t2r, t2i = _cmul(trr, tri, trr, tri)
    dscr, dsci = _csqrt(t2r - 4 * detr, t2i - 4 * deti)
    l1r, l1i = (trr + dscr) / 2, (tri + dsci) / 2
    l2r, l2i = (trr - dscr) / 2, (tri - dsci) / 2
    pick1 = _cabs2(l1r - dr, l1i - di) < _cabs2(l2r - dr, l2i - di)
    return jnp.where(pick1, l1r, l2r), jnp.where(pick1, l1i, l2i)


def schur_qr_real(Hr, Hi, Qr, Qi, max_iter_factor=40):
    """Implicit single-shift QR on a split-real Hessenberg pair.

    Structured for this runtime's loop cost model (measured): all in-loop
    mutation is dynamic_slice + dynamic_update_slice on (2,n)/(n,2) panels
    (~1-3us/step); no full-matrix elementwise rewrites inside the loop (a
    whole-carry rewrite costs ~1000x a DUS here); window detection is two
    masked max-reductions, not a scalar scan.  Deflated subdiagonals are
    never written in-loop — the window logic just stops crossing them
    (equivalent to LAPACK's set-to-zero up to the same backward error);
    the lower triangle is zeroed once at the end.
    """
    n = Hr.shape[-1]
    rdtype = Hr.dtype
    eps, smlnum = _consts(rdtype)
    if n == 1:
        return Hr, Hi, Qr, Qi
    idx = jnp.arange(n)
    idx1 = jnp.arange(1, n)
    coln = jnp.arange(n)
    max_iters = max_iter_factor * n

    def sweep(Hr, Hi, Zr, Zi, lo, hi, sgr, sgi):
        # first rotation from the shifted column (implicit shift)
        h2 = lax.dynamic_slice(Hr, (lo, lo), (2, 1))
        h2i = lax.dynamic_slice(Hi, (lo, lo), (2, 1))
        x0r = h2[0, 0] - sgr
        x0i = h2i[0, 0] - sgi
        y0r = h2[1, 0]
        y0i = h2i[1, 0]

        def body(k, state):
            Hr, Hi, Zr, Zi, xr, xi, yr, yi = state
            active = (k >= lo) & (k < hi)
            c, sr, si = _givens_real(xr, xi, yr, yi)
            c = jnp.where(active, c, 1.)
            sr = jnp.where(active, sr, 0.)
            si = jnp.where(active, si, 0.)

            # --- left rotation on the (2, n) row panel ---------------------
            Rr = lax.dynamic_slice(Hr, (k, 0), (2, n))
            Ri = lax.dynamic_slice(Hi, (k, 0), (2, n))
            # new_top = c*top + s*bot ; new_bot = -conj(s)*top + c*bot
            tr_, ti_ = _cmul(sr, si, Rr[1], Ri[1])
            ntr = c * Rr[0] + tr_
            nti = c * Ri[0] + ti_
            br_, bi_ = _cmul(sr, -si, Rr[0], Ri[0])
            nbr = c * Rr[1] - br_
            nbi = c * Ri[1] - bi_
            # the rotation annihilates the bulge at (k+1, k-1); pin it to
            # an exact zero inside the panel (keeps the subdiagonal clean
            # for the deflation test)
            zap = active & (coln == k - 1)
            nbr = jnp.where(zap, 0., nbr)
            nbi = jnp.where(zap, 0., nbi)
            Hr = lax.dynamic_update_slice(Hr, jnp.stack([ntr, nbr]), (k, 0))
            Hi = lax.dynamic_update_slice(Hi, jnp.stack([nti, nbi]), (k, 0))

            # --- right rotation on the (n, 2) column panel -----------------
            Cr = lax.dynamic_slice(Hr, (0, k), (n, 2))
            Ci = lax.dynamic_slice(Hi, (0, k), (n, 2))
            # new_l = c*l + conj(s)*r ; new_r = -s*l + c*r
            t1r, t1i = _cmul(sr, -si, Cr[:, 1], Ci[:, 1])
            nlr = c * Cr[:, 0] + t1r
            nli = c * Ci[:, 0] + t1i
            t2r, t2i = _cmul(sr, si, Cr[:, 0], Ci[:, 0])
            nrr = c * Cr[:, 1] - t2r
            nri = c * Ci[:, 1] - t2i
            Hr = lax.dynamic_update_slice(Hr, jnp.stack([nlr, nrr], 1), (0, k))
            Hi = lax.dynamic_update_slice(Hi, jnp.stack([nli, nri], 1), (0, k))

            # --- accumulate Z ---------------------------------------------
            Wr = lax.dynamic_slice(Zr, (0, k), (n, 2))
            Wi = lax.dynamic_slice(Zi, (0, k), (n, 2))
            u1r, u1i = _cmul(sr, -si, Wr[:, 1], Wi[:, 1])
            nwlr = c * Wr[:, 0] + u1r
            nwli = c * Wi[:, 0] + u1i
            u2r, u2i = _cmul(sr, si, Wr[:, 0], Wi[:, 0])
            nwrr = c * Wr[:, 1] - u2r
            nwri = c * Wi[:, 1] - u2i
            Zr = lax.dynamic_update_slice(Zr, jnp.stack([nwlr, nwrr], 1),
                                          (0, k))
            Zi = lax.dynamic_update_slice(Zi, jnp.stack([nwli, nwri], 1),
                                          (0, k))

            # --- next rotation source: col k entries (k+1, k+2) ------------
            nxt_ok = k + 2 <= hi
            kk = jnp.minimum(k + 2, n - 1)
            xnr, xni = nlr[k + 1], nli[k + 1]
            ynr = jnp.where(nxt_ok, nlr[kk], 0.)
            yni = jnp.where(nxt_ok, nli[kk], 0.)
            xr = jnp.where(active, xnr, xr)
            xi = jnp.where(active, xni, xi)
            yr = jnp.where(active, ynr, yr)
            yi = jnp.where(active, yni, yi)
            return (Hr, Hi, Zr, Zi, xr, xi, yr, yi)

        Hr, Hi, Zr, Zi, _, _, _, _ = lax.fori_loop(
            0, n - 1, body, (Hr, Hi, Zr, Zi, x0r, x0i, y0r, y0i))
        return Hr, Hi, Zr, Zi

    def cond(state):
        _, _, _, _, hi, it = state
        return (hi > 0) & (it < max_iters)

    def body(state):
        Hr, Hi, Zr, Zi, hi, it = state
        # --- deflation-aware window, all vector reductions ----------------
        dgr = jnp.diagonal(Hr)
        dgi = jnp.diagonal(Hi)
        d = jnp.sqrt(dgr * dgr + dgi * dgi)
        sbr = jnp.diagonal(Hr, -1)
        sbi = jnp.diagonal(Hi, -1)
        sub2 = sbr * sbr + sbi * sbi
        thresh = jnp.maximum(eps * (d[:-1] + d[1:]), smlnum)
        alive = sub2 > thresh * thresh
        # hi <- largest h <= hi with alive[h-1], else 0
        hi = jnp.max(jnp.where((idx1 <= hi) & alive, idx1, 0))
        # lo <- largest l <= hi with l == 0 or ~alive[l-1]
        lo = jnp.max(jnp.where(
            (idx <= hi) & jnp.concatenate([jnp.ones((1,), bool), ~alive]),
            idx, 0))

        # --- shift from the trailing 2x2 of the window ---------------------
        him1 = jnp.maximum(hi - 1, 0)
        B2r = lax.dynamic_slice(Hr, (him1, him1), (2, 2))
        B2i = lax.dynamic_slice(Hi, (him1, him1), (2, 2))
        sgr, sgi = _wilkinson_real(B2r[0, 0], B2i[0, 0], B2r[0, 1], B2i[0, 1],
                                   B2r[1, 0], B2i[1, 0], B2r[1, 1], B2i[1, 1])
        exc = (it % 13) == 12
        sgr = jnp.where(
            exc, B2r[1, 1] + 0.75 * jnp.sqrt(B2r[1, 0] ** 2 + B2i[1, 0] ** 2),
            sgr)
        sgi = jnp.where(exc, B2i[1, 1], sgi)

        # sweep is masked to [lo, hi); when the window is empty every step
        # is an identity rotation, and cond() ends the loop right after
        Hr, Hi, Zr, Zi = sweep(Hr, Hi, Zr, Zi, lo, hi, sgr, sgi)
        return (Hr, Hi, Zr, Zi, hi, it + 1)

    Hr, Hi, Zr, Zi, hi_final, _ = lax.while_loop(
        cond, body, (Hr, Hi, Qr, Qi, n - 1, 0))
    lower = idx[:, None] > idx[None, :]
    Hr = jnp.where(lower, 0., Hr)
    Hi = jnp.where(lower, 0., Hi)
    # Non-convergence surfaces instead of returning silent garbage: if the
    # iteration budget ran out with an un-deflated window (hi_final > 0),
    # poison the diagonal (the eigenvalues) with NaN — the analogue of
    # LAPACK zgeev's nonzero INFO, which the reference would raise on.
    bad = hi_final > 0
    diag = idx[:, None] == idx[None, :]
    Hr = jnp.where(bad & diag, jnp.nan, Hr)
    Hi = jnp.where(bad & diag, jnp.nan, Hi)
    return Hr, Hi, Zr, Zi


# ---------------------------------------------------------------------------
# Eigenvectors by split-real back-substitution
# ---------------------------------------------------------------------------

def eig_tri_vectors_real(Tr, Ti, Zr, Zi):
    n = Tr.shape[-1]
    rdtype = Tr.dtype
    eps, smlnum = _consts(rdtype)
    idx = jnp.arange(n)
    tnorm = jnp.max(jnp.sum(jnp.sqrt(Tr * Tr + Ti * Ti), axis=0))

    def one_vec(i):
        lr, li = Tr[i, i], Ti[i, i]
        # upper-triangular system rows j < i of (T - lam I) on cols < i
        Br = Tr - lr * jnp.eye(n, dtype=rdtype)
        Bi = Ti - li * jnp.eye(n, dtype=rdtype)
        # pivot guard
        dmin = jnp.maximum(eps * jnp.sqrt(lr * lr + li * li), eps * tnorm)
        dmin = jnp.maximum(dmin, smlnum)
        dr, di = jnp.diagonal(Br), jnp.diagonal(Bi)
        dabs = jnp.sqrt(dr * dr + di * di)
        scale_up = jnp.where(dabs > 0, dmin / jnp.where(dabs > 0, dabs, 1.), 1.)
        small = dabs < dmin
        pdr = jnp.where(small, jnp.where(dabs > 0, dr * scale_up, dmin), dr)
        pdi = jnp.where(small, jnp.where(dabs > 0, di * scale_up, 0.), di)

        # back-substitution for y[j], j = i-1 .. 0 ;  y[i] = 1
        yr = jnp.where(idx == i, 1., 0.)
        yi = jnp.zeros((n,), rdtype)

        def step(t, yy):
            yr, yi = yy
            j = i - 1 - t
            jc = jnp.maximum(j, 0)
            colmask = ((idx > jc) & (idx <= i)).astype(rdtype)
            # s = sum_k B[j,k] y[k] for k in (j, i]
            br_, bi_ = Br[jc, :] * colmask, Bi[jc, :] * colmask
            sr_ = br_ @ yr - bi_ @ yi
            si_ = br_ @ yi + bi_ @ yr
            num_r, num_i = -sr_, -si_
            qr_, qi_ = _cdiv(num_r, num_i, pdr[jc], pdi[jc])
            valid = j >= 0
            yr = yr.at[jc].set(jnp.where(valid, qr_, yr[jc]))
            yi = yi.at[jc].set(jnp.where(valid, qi_, yi[jc]))
            return (yr, yi)

        yr, yi = lax.fori_loop(0, n - 1, step, (yr, yi))
        mask = (idx <= i).astype(rdtype)
        return yr * mask, yi * mask

    Yr, Yi = jax.vmap(one_vec, out_axes=1)(idx)
    Xr = Zr @ Yr - Zi @ Yi
    Xi = Zr @ Yi + Zi @ Yr
    nrm = jnp.sqrt(jnp.sum(Xr * Xr + Xi * Xi, axis=0))
    nrm = jnp.where(nrm > 0, nrm, 1.)
    return Xr / nrm[None, :], Xi / nrm[None, :]


# ---------------------------------------------------------------------------
# Public entries
# ---------------------------------------------------------------------------

@jax.jit
def _eig_real_single(Ar, Ai):
    # QR iterations are precision-critical: TPU's default f32 matmul runs
    # in bf16 passes, which stalls deflation and corrupts eigenvectors.
    with jax.default_matmul_precision('highest'):
        n_in = Ar.shape[-1]
        on_cpu = jax.default_backend() == 'cpu'
        if not on_cpu and n_in >= _HBM_MIN_N_SINGLE:
            # large-n path: nothing holds a full batch in VMEM
            from .hess_blocked import hessenberg_blocked
            from .eig_qr_hbm import schur_qr_hbm
            from .vec_blocked import eig_tri_vectors_blocked
            Hr, Hi, Qr, Qi = hessenberg_blocked(Ar, Ai)
            Tr, Ti, Zr, Zi = schur_qr_hbm(Hr, Hi, Qr, Qi,
                                          m=_hbm_shifts(n_in),
                                          wb=_HBM_WINDOW,
                                          defl_mult=_HBM_DEFL)
            wr = jnp.diagonal(Tr)
            wi = jnp.diagonal(Ti)
            Vr, Vi = eig_tri_vectors_blocked(Tr, Ti, Zr, Zi)
            return wr, wi, Vr, Vi
        if on_cpu:
            Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        else:
            from .eig_qr_pallas import hessenberg_pallas
            out = hessenberg_pallas(Ar[None], Ai[None])
            Hr, Hi, Qr, Qi = (x[0] for x in out)
        if jax.default_backend() == 'cpu':
            # XLA-loop QR: fine on CPU, ~25us/rotation on the TPU runtime
            Tr, Ti, Zr, Zi = schur_qr_real(Hr, Hi, Qr, Qi)
        else:
            # single matrix (n < _HBM_MIN_N_SINGLE) = batch of 1 through
            # the batched kernels
            from .eig_qr_pallas import (schur_qr_pallas_acc,
                                        eig_tri_vectors_pallas)
            Tr, Ti, Zr, Zi = schur_qr_pallas_acc(Hr[None], Hi[None],
                                                 Qr[None], Qi[None])
            wr = jnp.diagonal(Tr[0])
            wi = jnp.diagonal(Ti[0])
            Vr, Vi = eig_tri_vectors_pallas(Tr, Ti, Zr, Zi)
            return wr, wi, Vr[0], Vi[0]
        wr, wi = jnp.diagonal(Tr), jnp.diagonal(Ti)
        Vr, Vi = eig_tri_vectors_real(Tr, Ti, Zr, Zi)
    return wr, wi, Vr, Vi


@jax.jit
def _eig_real_batched(fr, fi):
    """[B, n, n] pairs -> batched eig via the batched Pallas Schur kernel
    (all matrices of a VMEM-sized chunk iterate inside one kernel)."""
    from .eig_qr_pallas import (schur_qr_pallas_acc, eig_tri_vectors_pallas,
                                hessenberg_pallas)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_pallas(fr, fi)
        Tr, Ti, Zr, Zi = schur_qr_pallas_acc(Hr, Hi, Qr, Qi)
        wr = jnp.diagonal(Tr, axis1=-2, axis2=-1)
        wi = jnp.diagonal(Ti, axis1=-2, axis2=-1)
        Vr, Vi = eig_tri_vectors_pallas(Tr, Ti, Zr, Zi)
    return wr, wi, Vr, Vi


def eig_qr_real(Ar, Ai):
    """Split-real batched eig: (Ar, Ai) [..., n, n] float pairs ->
    (wr, wi, Vr, Vi)."""
    if Ar.ndim == 2:
        return _eig_real_single(Ar, Ai)
    n = Ar.shape[-1]
    batch = Ar.shape[:-2]
    fr = Ar.reshape((-1, n, n))
    fi = Ai.reshape((-1, n, n))
    if jax.default_backend() == 'cpu':
        wr, wi, Vr, Vi = jax.vmap(_eig_real_single)(fr, fi)
    elif n >= _HBM_MIN_N_SINGLE and _acc_chunk(n) < 2:
        # The VMEM batched kernel only pays when >= 2 lanes share a
        # chunk.  When one lane already fills the budget, run the lanes
        # sequentially through the HBM pipeline instead: faster per lane
        # at this size (0.24 vs 0.32 s at n=512, chip) and it avoids a
        # scoped-vmem fusion OOM XLA builds around the chunk
        # concatenate (seen at n=578, b=4 in the example3 smoke).
        wr, wi, Vr, Vi = lax.map(lambda p: _eig_real_single(p[0], p[1]),
                                 (fr, fi))
    else:
        wr, wi, Vr, Vi = _eig_real_batched(fr, fi)
    return (wr.reshape(batch + (n,)), wi.reshape(batch + (n,)),
            Vr.reshape(batch + (n, n)), Vi.reshape(batch + (n, n)))


def eig_qr_split(A):
    """Complex-in/complex-out wrapper over the split-real kernel.

    The complex<->real conversions happen outside all loops (safe on TPU).
    """
    A = jnp.asarray(A)
    wr, wi, Vr, Vi = eig_qr_real(jnp.real(A), jnp.imag(A))
    return wr + 1j * wi, Vr + 1j * Vi
