"""Pallas TPU kernel: complex Schur QR iteration on split-real pairs.

The entire implicitly-shifted QR iteration (the hot O(n^3) loop of the
general complex eigensolver, replacing cuSOLVER/MAGMA zgeev behind
torch.linalg.eig in the reference, /root/reference/torcwa/rcwa.py:1236)
runs inside ONE kernel with H and Z resident in VMEM.  Measured cost
model on this runtime that dictates the design:

* one XLA op inside a lax loop costs ~1-25us of dispatch (a full QR in
  XLA ops is ~25us/rotation); inside a Pallas kernel a masked full-matrix
  rotation costs ~0.8us and loop steps ~0.4us -> ~10x.
* Mosaic here cannot lower: dynamic slices in the lane (last) dim,
  dynamic sublane slices of size >1, scalar reads at dynamic indices,
  jnp.flip.  Therefore: all dynamic row access uses size-1 sublane
  slices; all column updates are masked full-matrix expressions; scalars
  at dynamic positions are extracted with onehot mask + sum.

Algorithm notes mirror ops/eig_qr_real.py (same math, same deflation
semantics): implicit single-shift Francis sweeps with Wilkinson shifts,
exceptional shift every 13 iterations, deflation-aware [lo, hi] windows
recomputed per sweep from subdiagonal magnitudes vs LAPACK-style
thresholds; deflated entries are never crossed, the lower triangle is
zeroed once at the end.

Z is stored TRANSPOSED in the kernel: the QR accumulates Z <- Z G^H,
a column operation; on Z^T it is a row-pair update, which is the cheap
access pattern here.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['schur_qr_pallas']

_F32EPS = 1.1920929e-07
_SMLNUM = 1e-31


def _kernel(hr_in, hi_in, ztr_in, zti_in,
            hr_ref, hi_ref, ztr_ref, zti_ref, *, max_iters: int, n: int):
    # input refs alias the output refs (input_output_aliases); all work
    # happens on the out refs, which already hold the input values
    del hr_in, hi_in, ztr_in, zti_in
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    iota_n = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def diag_vec(Xr, Xi, off):
        """|diag(X, off)|^2 and the (re, im) diagonals as (1, n) rows
        (entry j = X[j - min(off,0)... ] aligned to j for off in {0,-1})."""
        m = rows == (cols - off)          # off=-1: subdiagonal
        # sum over rows puts element (j+off_row, j) at lane j
        dr = jnp.sum(jnp.where(m, Xr, 0.), axis=0, keepdims=True)
        di = jnp.sum(jnp.where(m, Xi, 0.), axis=0, keepdims=True)
        return dr, di

    def at_lane(vec_row, j):
        """Scalar at dynamic lane j of a (1, n) row via mask+sum."""
        return jnp.sum(jnp.where(iota_n == j, vec_row, 0.))

    def body(state):
        hi, it = state
        Hr = hr_ref[:]
        Hi = hi_ref[:]

        # ---- deflation window from subdiagonal magnitudes ----------------
        dr, di = diag_vec(Hr, Hi, 0)
        d = jnp.sqrt(dr * dr + di * di)                       # (1, n)
        sr_, si_ = diag_vec(Hr, Hi, -1)                       # lane j = H[j+1, j]
        sub2 = sr_ * sr_ + si_ * si_                          # (1, n); lane n-1 = 0
        dshift = jnp.where(iota_n == n - 1, 0.,
                           pltpu.roll(d, shift=n - 1, axis=1))  # d[j+1] at lane j
        thresh = jnp.maximum(_F32EPS * (d + dshift), _SMLNUM)
        alive = sub2 > thresh * thresh                        # lane j: H[j+1,j] alive
        # hi <- largest h <= hi with alive[h-1]; lanes are j = h-1
        lane = iota_n + 1                                     # candidate h at lane j
        hi = jnp.max(jnp.where((lane <= hi) & alive, lane, 0))
        # lo <- largest l <= hi with l == 0 or ~alive[l-1]
        # (roll a float mask: tpu.dynamic_rotate has no i1 lowering)
        alive_prev = pltpu.roll(alive.astype(jnp.float32),
                                shift=1, axis=1) > 0.5
        lo = jnp.max(jnp.where((iota_n <= hi) &
                               ((iota_n == 0) | ~alive_prev),
                               iota_n, 0))

        # ---- Wilkinson shift from trailing 2x2 of the window -------------
        him1 = jnp.maximum(hi - 1, 0)
        ar = at_lane(dr, him1)
        ai = at_lane(di, him1)
        dr_ = at_lane(dr, hi)
        di_ = at_lane(di, hi)
        # off-diagonals: b = H[hi-1, hi], c = H[hi, hi-1]
        supr, supi = diag_vec(Hr, Hi, 1)                      # lane j = H[j-1, j]
        br = at_lane(supr, hi)
        bi = at_lane(supi, hi)
        cr = at_lane(sr_, him1)
        ci = at_lane(si_, him1)
        # eigenvalue of [[a,b],[c,d]] closest to d
        trr, tri = ar + dr_, ai + di_
        detr = (ar * dr_ - ai * di_) - (br * cr - bi * ci)
        deti = (ar * di_ + ai * dr_) - (br * ci + bi * cr)
        t2r = trr * trr - tri * tri
        t2i = 2 * trr * tri
        # sqrt(t2 - 4 det)
        qr_ = t2r - 4 * detr
        qi_ = t2i - 4 * deti
        qmag = jnp.sqrt(qr_ * qr_ + qi_ * qi_)
        dscr = jnp.sqrt(jnp.maximum((qmag + qr_) / 2, 0.))
        dsci = jnp.sign(qi_) * jnp.sqrt(jnp.maximum((qmag - qr_) / 2, 0.))
        l1r, l1i = (trr + dscr) / 2, (tri + dsci) / 2
        l2r, l2i = (trr - dscr) / 2, (tri - dsci) / 2
        pick1 = ((l1r - dr_) ** 2 + (l1i - di_) ** 2 <
                 (l2r - dr_) ** 2 + (l2i - di_) ** 2)
        sgr = jnp.where(pick1, l1r, l2r)
        sgi = jnp.where(pick1, l1i, l2i)
        exc = (it % 13) == 12
        sgr = jnp.where(exc, dr_ + 0.75 * jnp.sqrt(cr * cr + ci * ci), sgr)
        sgi = jnp.where(exc, di_, sgi)

        # ---- sweep: chase one bulge from lo to hi-1 -----------------------
        x0r = at_lane(dr, lo) - sgr
        x0i = at_lane(di, lo) - sgi
        y0r = at_lane(sr_, lo)   # H[lo+1, lo]
        y0i = at_lane(si_, lo)

        def step(k, carry):
            xr, xi, yr, yi = carry
            active = (k >= lo) & (k < hi)
            # Givens: c real, s complex; [c, s; -conj(s), c] [x; y] = [r; 0]
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

            Hr = hr_ref[:]
            Hi = hi_ref[:]
            # --- left rotation (rows k, k+1), masked full-matrix ----------
            is0 = rows == k
            is1 = rows == (k + 1)
            up_r = pltpu.roll(Hr, shift=n - 1, axis=0)   # row k -> row k+1 vals
            up_i = pltpu.roll(Hi, shift=n - 1, axis=0)
            dn_r = pltpu.roll(Hr, shift=1, axis=0)       # row k+1 -> row k vals
            dn_i = pltpu.roll(Hi, shift=1, axis=0)
            # new row k   = c*rk + s*rk1 ; new row k+1 = -conj(s)*rk + c*rk1
            nk_r = c * Hr + (sr * up_r - si * up_i)
            nk_i = c * Hi + (sr * up_i + si * up_r)
            n1_r = c * Hr - (sr * dn_r + si * dn_i)
            n1_i = c * Hi - (sr * dn_i - si * dn_r)
            # bulge annihilation: exact zero at (k+1, k-1)
            zap = is1 & (cols == (k - 1)) & active
            Hr = jnp.where(is0, nk_r, jnp.where(is1, n1_r, Hr))
            Hi = jnp.where(is0, nk_i, jnp.where(is1, n1_i, Hi))
            Hr = jnp.where(zap, 0., Hr)
            Hi = jnp.where(zap, 0., Hi)

            # --- right rotation (cols k, k+1), masked full-matrix ---------
            # new col k = c*ck + conj(s)*ck1 ; new col k+1 = -s*ck + c*ck1
            jc0 = cols == k
            jc1 = cols == (k + 1)
            lf_r = pltpu.roll(Hr, shift=n - 1, axis=1)   # col k+1 vals at col k
            lf_i = pltpu.roll(Hi, shift=n - 1, axis=1)
            rt_r = pltpu.roll(Hr, shift=1, axis=1)       # col k vals at col k+1
            rt_i = pltpu.roll(Hi, shift=1, axis=1)
            mk_r = c * Hr + (sr * lf_r + si * lf_i)
            mk_i = c * Hi + (sr * lf_i - si * lf_r)
            m1_r = c * Hr - (sr * rt_r - si * rt_i)
            m1_i = c * Hi - (sr * rt_i + si * rt_r)
            Hr = jnp.where(jc0, mk_r, jnp.where(jc1, m1_r, Hr))
            Hi = jnp.where(jc0, mk_i, jnp.where(jc1, m1_i, Hi))
            hr_ref[:] = Hr
            hi_ref[:] = Hi

            # --- Z^T rows k, k+1: (Z G^H)^T = conj(G) Z^T ------------------
            # new zt_k = c*ztk + conj(s)*ztk1 ; new zt_k1 = -s*ztk + c*ztk1
            Zr = ztr_ref[:]
            Zi = zti_ref[:]
            zu_r = pltpu.roll(Zr, shift=n - 1, axis=0)
            zu_i = pltpu.roll(Zi, shift=n - 1, axis=0)
            zd_r = pltpu.roll(Zr, shift=1, axis=0)
            zd_i = pltpu.roll(Zi, shift=1, axis=0)
            wk_r = c * Zr + (sr * zu_r + si * zu_i)
            wk_i = c * Zi + (sr * zu_i - si * zu_r)
            w1_r = c * Zr - (sr * zd_r - si * zd_i)
            w1_i = c * Zi - (sr * zd_i + si * zd_r)
            ztr_ref[:] = jnp.where(is0, wk_r, jnp.where(is1, w1_r, Zr))
            zti_ref[:] = jnp.where(is0, wk_i, jnp.where(is1, w1_i, Zi))

            # --- next rotation source: new H[k+1, k], H[k+2, k] ------------
            colk_r = jnp.sum(jnp.where(jc0, Hr, 0.), axis=1, keepdims=True)
            colk_i = jnp.sum(jnp.where(jc0, Hi, 0.), axis=1, keepdims=True)
            # colk as (n, 1); extract sublane k+1 and k+2 via mask+sum
            ridx = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            xn_r = jnp.sum(jnp.where(ridx == k + 1, colk_r, 0.))
            xn_i = jnp.sum(jnp.where(ridx == k + 1, colk_i, 0.))
            nxt_ok = (k + 2) <= hi
            yn_r = jnp.where(nxt_ok,
                             jnp.sum(jnp.where(ridx == k + 2, colk_r, 0.)), 0.)
            yn_i = jnp.where(nxt_ok,
                             jnp.sum(jnp.where(ridx == k + 2, colk_i, 0.)), 0.)
            xr = jnp.where(active, xn_r, xr)
            xi = jnp.where(active, xn_i, xi)
            yr = jnp.where(active, yn_r, yr)
            yi = jnp.where(active, yn_i, yi)
            return (xr, xi, yr, yi)

        lax.fori_loop(0, n - 1, step, (x0r, x0i, y0r, y0i))
        return (hi, it + 1)

    def cond(state):
        hi, it = state
        return (hi > 0) & (it < max_iters)

    lax.while_loop(cond, body, (jnp.int32(n - 1), jnp.int32(0)))

    # zero the strictly lower triangle once
    lower = rows > cols
    hr_ref[:] = jnp.where(lower, 0., hr_ref[:])
    hi_ref[:] = jnp.where(lower, 0., hi_ref[:])


@functools.partial(jax.jit, static_argnames=('max_iter_factor', 'interpret'))
def schur_qr_pallas(Hr, Hi, Qr, Qi, max_iter_factor=40, interpret=False):
    """Drop-in twin of eig_qr_real.schur_qr_real running as one TPU kernel.

    (Hr, Hi): split-real upper-Hessenberg pair [n, n].
    (Qr, Qi): accumulated similarity from the Hessenberg reduction.
    Returns (Tr, Ti, Zr, Zi) with T upper triangular.
    interpret=True runs the kernel in the Pallas interpreter (CPU tests).
    """
    n = Hr.shape[-1]
    kern = functools.partial(_kernel, max_iters=max_iter_factor * n, n=n)

    # in/out aliasing: H and Z^T are carried in-place in VMEM
    Tr, Ti, ZTr, ZTi = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((n, n), Hr.dtype)] * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        interpret=interpret,
    )(Hr, Hi, jnp.swapaxes(Qr, -2, -1), jnp.swapaxes(Qi, -2, -1))
    return Tr, Ti, jnp.swapaxes(ZTr, -2, -1), jnp.swapaxes(ZTi, -2, -1)
