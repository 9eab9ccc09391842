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
    n = Hr.shape[-1]
    rdtype = Hr.dtype
    eps, smlnum = _consts(rdtype)
    if n == 1:
        return Hr, Hi, Qr, Qi
    idx = jnp.arange(n)
    row = idx[:, None]
    col = idx[None, :]
    on_sub = row == col + 1
    max_iters = max_iter_factor * n

    def deflate(Hr, Hi):
        d = jnp.sqrt(jnp.diagonal(Hr) ** 2 + jnp.diagonal(Hi) ** 2)
        tst = d + jnp.concatenate([d[1:], d[-1:]])
        thresh = jnp.maximum(eps * tst, smlnum)
        sub2 = jnp.diagonal(Hr, -1) ** 2 + jnp.diagonal(Hi, -1) ** 2
        keep = sub2 > thresh[:-1] ** 2
        keep_full = jnp.concatenate([keep, jnp.zeros((1,), bool)])[col]
        kill = on_sub & ~keep_full
        return jnp.where(kill, 0., Hr), jnp.where(kill, 0., Hi)

    def active_window(Hr, Hi, hi):
        subr = jnp.concatenate([jnp.diagonal(Hr, -1), jnp.zeros((1,), rdtype)])
        subi = jnp.concatenate([jnp.diagonal(Hi, -1), jnp.zeros((1,), rdtype)])
        alive = (subr ** 2 + subi ** 2) > 0

        def cond(h):
            return (h > 0) & ~alive[h - 1]

        hi = lax.while_loop(cond, lambda h: h - 1, hi)
        cand = jnp.where((idx <= hi) & jnp.concatenate(
            [jnp.ones((1,), bool), ~alive[:-1]]), idx, 0)
        lo = jnp.max(cand)
        return lo, hi

    def sweep(Hr, Hi, Zr, Zi, lo, hi, sgr, sgi):
        x0r = Hr[lo, lo] - sgr
        x0i = Hi[lo, lo] - sgi
        y0r = Hr[lo + 1, lo]
        y0i = Hi[lo + 1, lo]

        def body(k, state):
            Hr, Hi, Zr, Zi, xr, xi, yr, yi = state
            active = (k >= lo) & (k < hi)
            c, sr, si = _givens_real(xr, xi, yr, yi)
            c = jnp.where(active, c, 1.)
            sr = jnp.where(active, sr, 0.)
            si = jnp.where(active, si, 0.)

            # left rotation, rows k and k+1:
            # new_rk = c*rk + s*rk1 ; new_rk1 = -conj(s)*rk + c*rk1
            rkr, rki = Hr[k, :], Hi[k, :]
            r1r, r1i = Hr[k + 1, :], Hi[k + 1, :]
            sr1r, sr1i = _cmul(sr, si, r1r, r1i)
            nkr, nki = c * rkr + sr1r, c * rki + sr1i
            csr, csi = _cmul(sr, -si, rkr, rki)     # conj(s) * rk
            n1r, n1i = -csr + c * r1r, -csi + c * r1i
            Hr = Hr.at[k, :].set(nkr).at[k + 1, :].set(n1r)
            Hi = Hi.at[k, :].set(nki).at[k + 1, :].set(n1i)

            # right rotation, cols k and k+1:
            # new_ck = c*ck + conj(s)*ck1 ; new_ck1 = -s*ck + c*ck1
            ckr, cki = Hr[:, k], Hi[:, k]
            c1r, c1i = Hr[:, k + 1], Hi[:, k + 1]
            t1r, t1i = _cmul(sr, -si, c1r, c1i)
            mkr, mki = c * ckr + t1r, c * cki + t1i
            t2r, t2i = _cmul(sr, si, ckr, cki)
            m1r, m1i = -t2r + c * c1r, -t2i + c * c1i
            Hr = Hr.at[:, k].set(mkr).at[:, k + 1].set(m1r)
            Hi = Hi.at[:, k].set(mki).at[:, k + 1].set(m1i)

            zkr, zki = Zr[:, k], Zi[:, k]
            z1r, z1i = Zr[:, k + 1], Zi[:, k + 1]
            t3r, t3i = _cmul(sr, -si, z1r, z1i)
            wkr, wki = c * zkr + t3r, c * zki + t3i
            t4r, t4i = _cmul(sr, si, zkr, zki)
            w1r, w1i = -t4r + c * z1r, -t4i + c * z1i
            Zr = Zr.at[:, k].set(wkr).at[:, k + 1].set(w1r)
            Zi = Zi.at[:, k].set(wki).at[:, k + 1].set(w1i)

            # store the exact zero for the annihilated bulge (see eig_qr.py)
            km1 = jnp.maximum(k - 1, 0)
            zap = active & (k > lo)
            Hr = Hr.at[k + 1, km1].set(jnp.where(zap, 0., Hr[k + 1, km1]))
            Hi = Hi.at[k + 1, km1].set(jnp.where(zap, 0., Hi[k + 1, km1]))

            nxt_ok = k + 2 <= hi
            kk = jnp.minimum(k + 2, n - 1)
            xnr, xni = Hr[k + 1, k], Hi[k + 1, k]
            ynr = jnp.where(nxt_ok, Hr[kk, k], 0.)
            yni = jnp.where(nxt_ok, Hi[kk, k], 0.)
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
        Hr, Hi = deflate(Hr, Hi)
        lo, hi = active_window(Hr, Hi, hi)

        def do_sweep(args):
            Hr, Hi, Zr, Zi = args
            him1 = jnp.maximum(hi - 1, 0)
            ar, ai = Hr[him1, him1], Hi[him1, him1]
            br, bi = Hr[him1, hi], Hi[him1, hi]
            cr, ci = Hr[hi, him1], Hi[hi, him1]
            dr, di = Hr[hi, hi], Hi[hi, hi]
            sgr, sgi = _wilkinson_real(ar, ai, br, bi, cr, ci, dr, di)
            exc = (it % 13) == 12
            sgr = jnp.where(exc, dr + 0.75 * jnp.sqrt(cr * cr + ci * ci), sgr)
            sgi = jnp.where(exc, di, sgi)
            return sweep(Hr, Hi, Zr, Zi, lo, hi, sgr, sgi)

        Hr, Hi, Zr, Zi = lax.cond(hi > 0, do_sweep, lambda a: a,
                                  (Hr, Hi, Zr, Zi))
        return (Hr, Hi, Zr, Zi, hi, it + 1)

    Hr, Hi, Zr, Zi, _, _ = lax.while_loop(
        cond, body, (Hr, Hi, Qr, Qi, n - 1, 0))
    Hr, Hi = deflate(Hr, Hi)
    lower = row > col
    Hr = jnp.where(lower, 0., Hr)
    Hi = jnp.where(lower, 0., Hi)
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
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        Tr, Ti, Zr, Zi = schur_qr_real(Hr, Hi, Qr, Qi)
        wr, wi = jnp.diagonal(Tr), jnp.diagonal(Ti)
        Vr, Vi = eig_tri_vectors_real(Tr, Ti, Zr, Zi)
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
    wr, wi, Vr, Vi = jax.vmap(_eig_real_single)(fr, fi)
    return (wr.reshape(batch + (n,)), wi.reshape(batch + (n,)),
            Vr.reshape(batch + (n, n)), Vi.reshape(batch + (n, n)))


def eig_qr_split(A):
    """Complex-in/complex-out wrapper over the split-real kernel.

    The complex<->real conversions happen outside all loops (safe on TPU).
    """
    A = jnp.asarray(A)
    wr, wi, Vr, Vi = eig_qr_real(jnp.real(A), jnp.imag(A))
    return wr + 1j * wi, Vr + 1j * Vi
