"""Pallas TPU kernel: batched complex Schur QR on split-real pairs.

The entire implicitly-shifted QR iteration (the hot O(n^3) loop of the
general complex eigensolver, replacing cuSOLVER/MAGMA zgeev behind
torch.linalg.eig in the reference, /root/reference/torcwa/rcwa.py:1236)
runs inside ONE kernel with a BATCH of H and Z matrices resident in VMEM.
Each batch lane carries its own deflation window, Wilkinson shift, and
rotation chain; the masked full-matrix updates vectorize across the batch
on the VPU, so the ~0.4us/step loop overhead is amortized over all lanes.

Measured cost model on this runtime that dictates the design:

* one XLA op inside a lax loop costs ~1-25us of dispatch (a full QR in
  XLA ops is ~25us/rotation; batched dynamic updates up to 47ms/step);
  inside a Pallas kernel a masked full-matrix rotation costs ~0.8us and
  loop steps ~0.4us.
* Mosaic here cannot lower: dynamic slices in the lane (last) dim,
  dynamic sublane slices of size >1, scalar reads at dynamic indices,
  jnp.flip, roll of i1 vectors.  Therefore: all column/row updates are
  masked full-matrix expressions, per-lane scalars are extracted with
  onehot mask + sum, and Z is stored TRANSPOSED (its accumulation
  Z <- Z G^H becomes a row-pair update).

Algorithm notes mirror ops/eig_qr_real.py (same math, same deflation
semantics): implicit single-shift Francis sweeps with Wilkinson shifts,
exceptional shift every 13 iterations, deflation-aware [lo, hi] windows
recomputed per sweep from subdiagonal magnitudes vs LAPACK-style
thresholds; deflated entries are never crossed, the lower triangle is
zeroed once at the end.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['schur_qr_pallas', 'schur_qr_pallas_batched']

_F32EPS = 1.1920929e-07
_SMLNUM = 1e-31

# VMEM budget for the four resident (B, n, n) arrays, leaving headroom
# for temporaries of the masked updates.
_VMEM_BUDGET = 96 * 2 ** 20

# row/column chunk for the deferred-column epilogue GEMMs (bounds the
# kernel's GEMM temporaries to (b, _CHUNK, width) each)
_CHUNK = 512

# sweeps without deflation progress before an exactly-real lane is allowed
# to take the complex discriminant branch (see the stall-gate comment in
# _kernel_acc's shift computation).  Measured on the order-6 bench wave
# matrices (chip, 8 lanes): gate=0 (eager complex) 872/1038 sweeps,
# gate=6 911/1119, gate=inf 886/937 — the real tr/2 shift is the best
# default and the complex branch is only needed to escape genuinely
# complex-pair bottoms (antisymmetric spectra converge in ~46 sweeps at
# n=24 once the gate opens), so keep the gate high but finite.
_CPLX_STALL = 30

# deflation-threshold multiplier: subdiagonals deflate when |h| <=
# defl_mult * eps * (|d_k| + |d_k+1|).  Chip-swept on the bench wave
# matrices (scripts/acc_knob_sweep.py, b=8 n=338): 1.0 -> 508 sweeps /
# 187 ms, 4.0 -> 443 / 159-163 ms, 8.0 -> 432 / 160 ms, with identical
# eigenvalue error (4-5e-5 nearest-match rel) at every setting — the
# deflation backward error is O(defl_mult * eps * |H|), far below the
# f32 solve's own roundoff.  4.0 is the conservative knee.
_DEFL_MULT = 4.0

# independent deflation windows chased concurrently per sweep in the
# deferred-column kernel (one bulge each; runs are disjoint so a single
# (x, y) carry serves all of them).  The sweep count — the kernel's cost
# driver, at ~120us fixed per sweep vs ~0.3us per rotation — drops
# ~2.2-2.4x on RCWA wave matrices, which deflate mid-matrix constantly
# (mean 2.8 alive runs per sweep; diminishing returns past 4 runs).
_NRUNS = 4


def _kernel(hr_in, hi_in, ztr_in, zti_in,
            hr_ref, hi_ref, ztr_ref, zti_ref, *, max_iters: int, n: int,
            b: int):
    # explicit copy-in (input_output_aliases miscompiles when several
    # aliased pallas calls share one jit program on this runtime)
    hr_ref[:] = hr_in[:]
    hi_ref[:] = hi_in[:]
    ztr_ref[:] = ztr_in[:]
    zti_ref[:] = zti_in[:]
    rows = lax.broadcasted_iota(jnp.int32, (b, n, n), 1)
    cols = lax.broadcasted_iota(jnp.int32, (b, n, n), 2)
    iota_n = lax.broadcasted_iota(jnp.int32, (b, 1, n), 2)

    def diag_vec(Xr, Xi, off):
        """(re, im) of diag(X, off) per lane as (b, 1, n) rows."""
        m = rows == (cols - off)
        dr = jnp.sum(jnp.where(m, Xr, 0.), axis=1, keepdims=True)
        di = jnp.sum(jnp.where(m, Xi, 0.), axis=1, keepdims=True)
        return dr, di

    def at_lane(vec_row, j):
        """(b,1,1) scalar at per-lane dynamic lane j of a (b,1,n) row."""
        return jnp.sum(jnp.where(iota_n == j, vec_row, 0.),
                       axis=2, keepdims=True)

    def body(state):
        hi, it = state                          # hi: (b,1,1) int32
        Hr = hr_ref[:]
        Hi = hi_ref[:]

        # ---- deflation window from subdiagonal magnitudes ----------------
        dr, di = diag_vec(Hr, Hi, 0)
        d = jnp.sqrt(dr * dr + di * di)                      # (b,1,n)
        sr_, si_ = diag_vec(Hr, Hi, -1)                      # lane j = H[j+1,j]
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

        # ---- Wilkinson shift from trailing 2x2 of each window -------------
        him1 = jnp.maximum(hi - 1, 0)
        ar = at_lane(dr, him1)
        ai = at_lane(di, him1)
        dr_ = at_lane(dr, hi)
        di_ = at_lane(di, hi)
        supr, supi = diag_vec(Hr, Hi, 1)                     # lane j = H[j-1,j]
        br = at_lane(supr, hi)
        bi = at_lane(supi, hi)
        cr = at_lane(sr_, him1)
        ci = at_lane(si_, him1)
        trr, tri = ar + dr_, ai + di_
        detr = (ar * dr_ - ai * di_) - (br * cr - bi * ci)
        deti = (ar * di_ + ai * dr_) - (br * ci + bi * cr)
        t2r = trr * trr - tri * tri
        t2i = 2 * trr * tri
        qr_ = t2r - 4 * detr
        qi_ = t2i - 4 * deti
        qmag = jnp.sqrt(qr_ * qr_ + qi_ * qi_)
        dscr = jnp.sqrt(jnp.maximum((qmag + qr_) / 2, 0.))
        # zero-safe branch sign: a NEGATIVE REAL discriminant (qi_ == 0,
        # qmag > qr_) must still produce the +-i sqrt pair; jnp.sign(0)=0
        # used to zero it, collapsing the Wilkinson shift to tr/2 and
        # stalling pure-imaginary spectra (e.g. antisymmetric matrices)
        dsci = jnp.where(qi_ >= 0, 1., -1.) * jnp.sqrt(
            jnp.maximum((qmag - qr_) / 2, 0.))
        l1r, l1i = (trr + dscr) / 2, (tri + dsci) / 2
        l2r, l2i = (trr - dscr) / 2, (tri - dsci) / 2
        pick1 = ((l1r - dr_) ** 2 + (l1i - di_) ** 2 <
                 (l2r - dr_) ** 2 + (l2i - di_) ** 2)
        sgr = jnp.where(pick1, l1r, l2r)
        sgi = jnp.where(pick1, l1i, l2i)
        exc = (it % 13) == 12
        sgr = jnp.where(exc, dr_ + 0.75 * jnp.sqrt(cr * cr + ci * ci), sgr)
        sgi = jnp.where(exc, di_, sgi)

        # ---- sweep: chase one bulge per lane from lo to hi-1 ---------------
        x0r = at_lane(dr, lo) - sgr
        x0i = at_lane(di, lo) - sgi
        y0r = at_lane(sr_, lo)
        y0i = at_lane(si_, lo)

        def step(k, carry):
            xr, xi, yr, yi = carry              # (b,1,1) each
            active = (k >= lo) & (k < hi)       # (b,1,1) bool
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
            up_r = pltpu.roll(Hr, shift=n - 1, axis=1)
            up_i = pltpu.roll(Hi, shift=n - 1, axis=1)
            dn_r = pltpu.roll(Hr, shift=1, axis=1)
            dn_i = pltpu.roll(Hi, shift=1, axis=1)
            nk_r = c * Hr + (sr * up_r - si * up_i)
            nk_i = c * Hi + (sr * up_i + si * up_r)
            n1_r = c * Hr - (sr * dn_r + si * dn_i)
            n1_i = c * Hi - (sr * dn_i - si * dn_r)
            zap = is1 & (cols == (k - 1)) & active
            Hr = jnp.where(is0, nk_r, jnp.where(is1, n1_r, Hr))
            Hi = jnp.where(is0, nk_i, jnp.where(is1, n1_i, Hi))
            Hr = jnp.where(zap, 0., Hr)
            Hi = jnp.where(zap, 0., Hi)

            # --- right rotation (cols k, k+1), masked full-matrix ---------
            jc0 = cols == k
            jc1 = cols == (k + 1)
            lf_r = pltpu.roll(Hr, shift=n - 1, axis=2)
            lf_i = pltpu.roll(Hi, shift=n - 1, axis=2)
            rt_r = pltpu.roll(Hr, shift=1, axis=2)
            rt_i = pltpu.roll(Hi, shift=1, axis=2)
            mk_r = c * Hr + (sr * lf_r + si * lf_i)
            mk_i = c * Hi + (sr * lf_i - si * lf_r)
            m1_r = c * Hr - (sr * rt_r - si * rt_i)
            m1_i = c * Hi - (sr * rt_i + si * rt_r)
            Hr = jnp.where(jc0, mk_r, jnp.where(jc1, m1_r, Hr))
            Hi = jnp.where(jc0, mk_i, jnp.where(jc1, m1_i, Hi))
            hr_ref[:] = Hr
            hi_ref[:] = Hi

            # --- Z^T rows k, k+1: (Z G^H)^T = conj(G) Z^T ------------------
            Zr = ztr_ref[:]
            Zi = zti_ref[:]
            zu_r = pltpu.roll(Zr, shift=n - 1, axis=1)
            zu_i = pltpu.roll(Zi, shift=n - 1, axis=1)
            zd_r = pltpu.roll(Zr, shift=1, axis=1)
            zd_i = pltpu.roll(Zi, shift=1, axis=1)
            wk_r = c * Zr + (sr * zu_r + si * zu_i)
            wk_i = c * Zi + (sr * zu_i - si * zu_r)
            w1_r = c * Zr - (sr * zd_r - si * zd_i)
            w1_i = c * Zi - (sr * zd_i + si * zd_r)
            ztr_ref[:] = jnp.where(is0, wk_r, jnp.where(is1, w1_r, Zr))
            zti_ref[:] = jnp.where(is0, wk_i, jnp.where(is1, w1_i, Zi))

            # --- next rotation source: new H[k+1, k], H[k+2, k] ------------
            colk_r = jnp.sum(jnp.where(jc0, Hr, 0.), axis=2, keepdims=True)
            colk_i = jnp.sum(jnp.where(jc0, Hi, 0.), axis=2, keepdims=True)
            ridx = lax.broadcasted_iota(jnp.int32, (b, n, 1), 1)
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
            return (xr, xi, yr, yi)

        lax.fori_loop(0, n - 1, step, (x0r, x0i, y0r, y0i))
        return (hi, it + 1)

    def cond(state):
        hi, it = state
        return jnp.any(hi > 0) & (it < max_iters)

    hi0 = jnp.full((b, 1, 1), n - 1, jnp.int32)
    lax.while_loop(cond, body, (hi0, jnp.int32(0)))

    lower = rows > cols
    hr_ref[:] = jnp.where(lower, 0., hr_ref[:])
    hi_ref[:] = jnp.where(lower, 0., hi_ref[:])


@functools.partial(jax.jit, static_argnames=('max_iter_factor', 'interpret'))
def _call(Hr, Hi, ZTr, ZTi, max_iter_factor, interpret):
    b, n = Hr.shape[0], Hr.shape[-1]
    kern = functools.partial(_kernel, max_iters=max_iter_factor * n, n=n,
                             b=b)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((b, n, n), Hr.dtype)] * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        interpret=interpret,
    )(Hr, Hi, ZTr, ZTi)


def schur_qr_pallas_batched(Hr, Hi, Qr, Qi, max_iter_factor=40,
                            interpret=False):
    """Batched Schur QR: [B, n, n] split-real Hessenberg pairs -> Schur.

    Splits the batch into VMEM-sized chunks; each chunk is one kernel
    launch holding all its matrices in VMEM.
    """
    b, n = Hr.shape[0], Hr.shape[-1]
    per = 4 * n * n * np.dtype(Hr.dtype).itemsize
    chunk = max(1, min(b, _VMEM_BUDGET // per))
    ZTr = jnp.swapaxes(Qr, -2, -1)
    ZTi = jnp.swapaxes(Qi, -2, -1)
    outs = []
    for s in range(0, b, chunk):
        e = min(s + chunk, b)
        outs.append(_call(Hr[s:e], Hi[s:e], ZTr[s:e], ZTi[s:e],
                          max_iter_factor, interpret))
    Tr, Ti, Zr, Zi = [jnp.concatenate([o[i] for o in outs], axis=0)
                      for i in range(4)]
    return Tr, Ti, jnp.swapaxes(Zr, -2, -1), jnp.swapaxes(Zi, -2, -1)


def schur_qr_pallas(Hr, Hi, Qr, Qi, max_iter_factor=40, interpret=False):
    """Drop-in twin of eig_qr_real.schur_qr_real running as one TPU kernel.

    (Hr, Hi): split-real upper-Hessenberg pair [n, n].
    (Qr, Qi): accumulated similarity from the Hessenberg reduction.
    Returns (Tr, Ti, Zr, Zi) with T upper triangular.
    interpret=True runs the kernel in the Pallas interpreter (CPU tests).
    """
    out = schur_qr_pallas_batched(Hr[None], Hi[None], Qr[None], Qi[None],
                                  max_iter_factor, interpret)
    return tuple(x[0] for x in out)


# ---------------------------------------------------------------------------
# v3: deferred-column ("accumulate and apply") QR kernel
# ---------------------------------------------------------------------------
#
# The v2 kernel above applies each Givens rotation with masked full-matrix
# expressions: O(B n^2) VPU work per rotation, which is the throughput
# bottleneck (the true update is O(n)).  This variant keeps per-step work
# O(B n) and pushes the column side onto the MXU:
#
#  * per step: rows k, k+1 of H are rotated in place ((B,1,n) dynamic
#    slices, the measured-fast pattern); the rotation is also accumulated
#    into W = Ufull^T by the same row-pair update.  Column updates are NOT
#    applied; the two entries the next rotation needs are reconstructed as
#    dot products M[k+1,k] = <H[k+1,:], W[k,:]>, M[k+2,k] = <H[k+2,:],
#    W[k,:]> (M = H @ Ufull is the true similarity-transformed matrix).
#  * per sweep: H <- H @ W^T and Z^T <- W @ Z^T as batched MXU matmuls,
#    then the strictly-below-subdiagonal part (roundoff junk of the
#    deferred representation) is masked to zero.
#
# This is the standard LAPACK "accumulate reflections, apply as GEMM"
# technique (dlaqr5-style), shaped to this runtime's constraint set.


def _kernel_acc(hr_in, hi_in, ztr_in, zti_in,
                hr_ref, hi_ref, ztr_ref, zti_ref, wr_ref, wi_ref, stat_ref,
                *, max_iters: int, n: int, b: int, exc_every: int = 13,
                cplx_stall: int = _CPLX_STALL, nruns: int = _NRUNS,
                defl_mult: float = 1.0):
    # explicit copy-in: input_output_aliases miscompiles when several
    # aliased pallas calls (batch chunks) share one jit program here
    hr_ref[:] = hr_in[:]
    hi_ref[:] = hi_in[:]
    ztr_ref[:] = ztr_in[:]
    zti_ref[:] = zti_in[:]
    rows = lax.broadcasted_iota(jnp.int32, (b, n, n), 1)
    cols = lax.broadcasted_iota(jnp.int32, (b, n, n), 2)
    iota_n = lax.broadcasted_iota(jnp.int32, (b, 1, n), 2)
    eye = (rows == cols).astype(jnp.float32)
    hess_mask = rows <= cols + 1

    def diag_vec(Xr, Xi, off):
        m = rows == (cols - off)
        dr = jnp.sum(jnp.where(m, Xr, 0.), axis=1, keepdims=True)
        di = jnp.sum(jnp.where(m, Xi, 0.), axis=1, keepdims=True)
        return dr, di

    def at_lane(vec_row, j):
        return jnp.sum(jnp.where(iota_n == j, vec_row, 0.),
                       axis=2, keepdims=True)

    # prefix-bucket widths shared by the deflation scan, the W reset, and
    # the deferred-column epilogue: everything the sweep touches lives in
    # the [0, max(hi)+2) prefix, which shrinks as lanes deflate.  slab-
    # width granularity: fine (128) buckets at small n, where the late
    # small-window sweeps dominate; coarse (256) at large n to bound the
    # switch-branch count.
    gran = 128 if n <= 640 else 256
    widths = [min(gran * (i + 1), n) for i in range((n + gran - 1) // gran)]

    def body(state):
        hi_prev, it, stall = state

        # ---- deflation scan on the live prefix ----------------------------
        # Extracting the three diagonals costs 6 masked (b, w, w)
        # reductions; with the per-sweep fixed cost dominating this kernel
        # (~120us vs ~0.3us/rotation), scanning the full (b, n, n) on
        # every late small-window sweep was a measured ~25% of total time.
        # The W reset rides the same switch (rotations only touch rows
        # < hi+2 <= w, and the epilogue only reads W[:width <= w]).
        def scan_slab(w):
            def f():
                Hr = hr_ref[:, :w, :w]
                Hi = hi_ref[:, :w, :w]
                rw = lax.broadcasted_iota(jnp.int32, (b, w, w), 1)
                cw = lax.broadcasted_iota(jnp.int32, (b, w, w), 2)
                outs = []
                for off in (0, -1, 1):
                    msk = rw == (cw - off)
                    pr = jnp.sum(jnp.where(msk, Hr, 0.), axis=1,
                                 keepdims=True)
                    pi = jnp.sum(jnp.where(msk, Hi, 0.), axis=1,
                                 keepdims=True)
                    if w < n:
                        z = jnp.zeros((b, 1, n - w), jnp.float32)
                        pr = jnp.concatenate([pr, z], axis=2)
                        pi = jnp.concatenate([pi, z], axis=2)
                    outs += [pr, pi]
                wr_ref[:, :w, :] = eye[:, :w, :]
                wi_ref[:, :w, :] = jnp.zeros((b, w, n), jnp.float32)
                return tuple(outs)
            return f

        branch_s = jnp.minimum((jnp.max(hi_prev) + 2) // gran,
                               len(widths) - 1)
        dr, di, sr_, si_, supr, supi = lax.switch(
            branch_s, [scan_slab(w) for w in widths])

        # ---- deflation window (same rules as v2) --------------------------
        d = jnp.sqrt(dr * dr + di * di)
        sub2 = sr_ * sr_ + si_ * si_
        dshift = jnp.where(iota_n == n - 1, 0.,
                           pltpu.roll(d, shift=n - 1, axis=2))
        thresh = jnp.maximum(defl_mult * _F32EPS * (d + dshift), _SMLNUM)
        alive = sub2 > thresh * thresh
        lane = iota_n + 1
        hi = jnp.max(jnp.where((lane <= hi_prev) & alive, lane, 0),
                     axis=2, keepdims=True)
        # per-lane stall counter: sweeps since the window last shrank
        stall = jnp.where(hi < hi_prev, 0, stall + 1)
        alive_prev = pltpu.roll(alive.astype(jnp.float32),
                                shift=1, axis=2) > 0.5
        lo = jnp.max(jnp.where((iota_n <= hi) &
                               ((iota_n == 0) | ~alive_prev),
                               iota_n, 0), axis=2, keepdims=True)

        # ---- per-position Wilkinson shifts, vectorized over window tops ---
        # Lane h holds the shift of a window whose TOP is at h, from the
        # trailing 2x2 [[H[h-1,h-1], H[h-1,h]], [H[h,h-1], H[h,h]]].  Every
        # ingredient is a (b, 1, n) roll of the diagonal vectors, so ALL
        # possible tops cost one vector pass — the per-run shift is then a
        # single one-hot gather instead of ~12 (the multi-run sweep reads
        # _NRUNS of them).
        ar = pltpu.roll(dr, shift=1, axis=2)
        ai = pltpu.roll(di, shift=1, axis=2)
        br, bi = supr, supi
        cr = pltpu.roll(sr_, shift=1, axis=2)
        ci = pltpu.roll(si_, shift=1, axis=2)
        dr_, di_ = dr, di
        trr, tri = ar + dr_, ai + di_
        detr = (ar * dr_ - ai * di_) - (br * cr - bi * ci)
        deti = (ar * di_ + ai * dr_) - (br * ci + bi * cr)
        qr_ = (trr * trr - tri * tri) - 4 * detr
        qi_ = 2 * trr * tri - 4 * deti
        qmag = jnp.sqrt(qr_ * qr_ + qi_ * qi_)
        dscr = jnp.sqrt(jnp.maximum((qmag + qr_) / 2, 0.))
        # zero-safe branch sign, STALL-GATED: a NEGATIVE REAL discriminant
        # (qi_ == 0, qmag > qr_) must eventually produce the +-i sqrt pair
        # or pure-imaginary spectra (e.g. antisymmetric matrices) never
        # converge — but taking the complex branch eagerly injects
        # imaginary parts into an otherwise EXACTLY-REAL iteration (real
        # eps -> real A=PQ -> qi_ == 0 every sweep), and the perturbed
        # shifts cost ~15% more sweeps on real-spectrum RCWA matrices
        # (measured: order-6 bench 0.0356 -> 0.0417 s/solve).  Real lanes
        # keep the real tr/2 shift unless the window has not deflated for
        # _CPLX_STALL sweeps; once a complex shift fires the lane's H has
        # nonzero imag, qi_ != 0 from then on, and the gate never re-arms.
        cplx_ok = (qi_ != 0.) | (stall >= cplx_stall)
        dsci = jnp.where(cplx_ok, jnp.where(qi_ >= 0, 1., -1.),
                         0.) * jnp.sqrt(jnp.maximum((qmag - qr_) / 2, 0.))
        l1r, l1i = (trr + dscr) / 2, (tri + dsci) / 2
        l2r, l2i = (trr - dscr) / 2, (tri - dsci) / 2
        pick1 = ((l1r - dr_) ** 2 + (l1i - di_) ** 2 <
                 (l2r - dr_) ** 2 + (l2i - di_) ** 2)
        sh_r = jnp.where(pick1, l1r, l2r)
        sh_i = jnp.where(pick1, l1i, l2i)
        exr_v = dr_ + 0.75 * jnp.sqrt(cr * cr + ci * ci)
        exi_v = di_

        # ---- one bulge per independent alive run (up to _NRUNS) ----------
        # The per-sweep FIXED cost (deflation scan, W reset, epilogue
        # GEMMs, loop plumbing — measured ~120us/sweep at n=338 vs ~0.3us
        # per rotation) dominates this kernel, and the bench's RCWA wave
        # matrices deflate mid-matrix constantly (mean 2.8 independent
        # alive runs per sweep, numpy model).  Chasing one bulge through
        # EVERY bottom-most run per sweep — runs are disjoint, so a single
        # (x, y) carry serves them all, re-introduced at each run's lo —
        # cuts the sweep count ~2.2-2.4x at identical total rotations
        # (numpy model: 1116 -> 541 sweeps at n=338).
        exc = (it % exc_every) == exc_every - 1
        zero_v = jnp.zeros((b, 1, n), jnp.float32)
        act_vec = zero_v
        intro_vec = zero_v
        x0r_vec = zero_v
        x0i_vec = zero_v
        y0r_vec = zero_v
        y0i_vec = zero_v
        lo_r, hi_r = lo, hi
        lo_min_v = lo
        for r in range(nruns):
            if r > 0:
                hi_r = jnp.max(jnp.where((lane <= lo_r - 1) & alive,
                                         lane, 0), axis=2, keepdims=True)
                lo_r = jnp.max(jnp.where((iota_n <= hi_r) &
                                         ((iota_n == 0) | ~alive_prev),
                                         iota_n, 0), axis=2, keepdims=True)
            valid = hi_r > 0
            sgr = at_lane(sh_r, hi_r)
            sgi = at_lane(sh_i, hi_r)
            if r == 0:
                sgr = jnp.where(exc, at_lane(exr_v, hi_r), sgr)
                sgi = jnp.where(exc, at_lane(exi_v, hi_r), sgi)
            in_run = (iota_n >= lo_r) & (iota_n < hi_r) & valid
            at_lo = (iota_n == lo_r) & valid
            act_vec = jnp.where(in_run, 1., act_vec)
            intro_vec = jnp.where(at_lo, 1., intro_vec)
            x0r_vec = jnp.where(at_lo, at_lane(dr, lo_r) - sgr, x0r_vec)
            x0i_vec = jnp.where(at_lo, at_lane(di, lo_r) - sgi, x0i_vec)
            y0r_vec = jnp.where(at_lo, at_lane(sr_, lo_r), y0r_vec)
            y0i_vec = jnp.where(at_lo, at_lane(si_, lo_r), y0i_vec)
            lo_min_v = jnp.where(valid, lo_r, lo_min_v)

        # (W was reset to identity on the scan's prefix slab above)
        # NB: a packed (b, 6, n) single-gather variant of the 6 per-k
        # lookups below measured SLOWER (184 vs 169 ms on the bench batch)

        def step(k, carry):
            xr, xi, yr, yi = carry
            active = at_lane(act_vec, k) > 0.5
            intro = at_lane(intro_vec, k) > 0.5
            xr = jnp.where(intro, at_lane(x0r_vec, k), xr)
            xi = jnp.where(intro, at_lane(x0i_vec, k), xi)
            yr = jnp.where(intro, at_lane(y0r_vec, k), yr)
            yi = jnp.where(intro, at_lane(y0i_vec, k), yi)
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

            # rows k, k+1 of H: new_k = c*hk + s*hk1 ; new_k1 = -conj(s)*hk + c*hk1
            hk_r = hr_ref[:, pl.ds(k, 1), :]
            hk_i = hi_ref[:, pl.ds(k, 1), :]
            h1_r = hr_ref[:, pl.ds(k + 1, 1), :]
            h1_i = hi_ref[:, pl.ds(k + 1, 1), :]
            nk_r = c * hk_r + (sr * h1_r - si * h1_i)
            nk_i = c * hk_i + (sr * h1_i + si * h1_r)
            n1_r = c * h1_r - (sr * hk_r + si * hk_i)
            n1_i = c * h1_i - (sr * hk_i - si * hk_r)
            hr_ref[:, pl.ds(k, 1), :] = nk_r
            hi_ref[:, pl.ds(k, 1), :] = nk_i
            hr_ref[:, pl.ds(k + 1, 1), :] = n1_r
            hi_ref[:, pl.ds(k + 1, 1), :] = n1_i

            # W <- conj(G) W: new_k = c*wk + conj(s)*wk1 ; new_k1 = -s*wk + c*wk1
            wk_r = wr_ref[:, pl.ds(k, 1), :]
            wk_i = wi_ref[:, pl.ds(k, 1), :]
            w1_r = wr_ref[:, pl.ds(k + 1, 1), :]
            w1_i = wi_ref[:, pl.ds(k + 1, 1), :]
            mk_r = c * wk_r + (sr * w1_r + si * w1_i)
            mk_i = c * wk_i + (sr * w1_i - si * w1_r)
            m1_r = c * w1_r - (sr * wk_r - si * wk_i)
            m1_i = c * w1_i - (sr * wk_i + si * wk_r)
            wr_ref[:, pl.ds(k, 1), :] = mk_r
            wi_ref[:, pl.ds(k, 1), :] = mk_i
            wr_ref[:, pl.ds(k + 1, 1), :] = m1_r
            wi_ref[:, pl.ds(k + 1, 1), :] = m1_i

            # next rotation source, from the true matrix M = H @ W^T:
            # x' = M[k+1, k] = <H[k+1,:], W[k,:]>, y' = M[k+2, k]
            k2 = jnp.minimum(k + 2, n - 1)
            h2_r = hr_ref[:, pl.ds(k2, 1), :]
            h2_i = hi_ref[:, pl.ds(k2, 1), :]
            xn_r = jnp.sum(n1_r * mk_r - n1_i * mk_i, axis=2, keepdims=True)
            xn_i = jnp.sum(n1_r * mk_i + n1_i * mk_r, axis=2, keepdims=True)
            y2_r = jnp.sum(h2_r * mk_r - h2_i * mk_i, axis=2, keepdims=True)
            y2_i = jnp.sum(h2_r * mk_i + h2_i * mk_r, axis=2, keepdims=True)
            nxt_ok = (k + 2) <= hi
            yn_r = jnp.where(nxt_ok, y2_r, 0.)
            yn_i = jnp.where(nxt_ok, y2_i, 0.)
            xr = jnp.where(active, xn_r, xr)
            xi = jnp.where(active, xn_i, xi)
            yr = jnp.where(active, yn_r, yr)
            yi = jnp.where(active, yn_i, yi)
            return (xr, xi, yr, yi)

        # the step loop only needs [min run lo, max hi) across lanes and
        # runs; traced bounds lower to a while loop, which Mosaic supports
        lo_min = jnp.min(lo_min_v)
        hi_max = jnp.max(hi)
        zero_s = jnp.zeros((b, 1, 1), jnp.float32)
        lax.fori_loop(lo_min, jnp.minimum(hi_max, n - 1), step,
                      (zero_s, zero_s, zero_s, zero_s))

        # ---- apply deferred columns: H <- H @ W^T, Z^T <- W @ Z^T ---------
        # W differs from the identity only inside [lo, hi+1], and lo_min is
        # usually 0 — so the update touches only the column/row PREFIX
        # [0, hi_max+2).  Lane-dim slicing must be static here, so pick a
        # static prefix bucket with lax.switch.
        dn_t = (((2,), (2,)), ((0,), (0,)))     # contract last dims
        dn_m = (((2,), (1,)), ((0,), (0,)))     # W @ Z^T
        # NB: Mosaic only lowers DEFAULT and HIGHEST dot precisions
        prec = lax.Precision.HIGHEST

        def apply_slab(width):
            # chunked over rows (H) / columns (Z^T) so GEMM temporaries stay
            # <= (b, _CHUNK, width): the whole-slab version's temporaries
            # blew the scoped-VMEM limit above n ~ 1000
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
                    # structural Hessenberg enforcement (junk below the
                    # subdiagonal is the deferred representation's roundoff)
                    hm = hess_mask[:, r0:r1, :width]
                    hr_ref[:, r0:r1, :width] = jnp.where(hm, Hr2, 0.)
                    hi_ref[:, r0:r1, :width] = jnp.where(hm, Hi2, 0.)
                for c0 in range(0, n, _CHUNK):
                    c1 = min(c0 + _CHUNK, n)
                    Zr = ztr_ref[:, :width, c0:c1]
                    Zi = zti_ref[:, :width, c0:c1]
                    Zr2 = (lax.dot_general(Wr, Zr, dn_m, precision=prec,
                                           preferred_element_type=jnp.float32)
                           - lax.dot_general(Wi, Zi, dn_m, precision=prec,
                                             preferred_element_type=jnp.float32))
                    Zi2 = (lax.dot_general(Wr, Zi, dn_m, precision=prec,
                                           preferred_element_type=jnp.float32)
                           + lax.dot_general(Wi, Zr, dn_m, precision=prec,
                                             preferred_element_type=jnp.float32))
                    ztr_ref[:, :width, c0:c1] = Zr2
                    zti_ref[:, :width, c0:c1] = Zi2
            return f

        branch = jnp.minimum((hi_max + 2) // gran, len(widths) - 1)
        lax.switch(branch, [apply_slab(w) for w in widths])
        return (hi, it + 1, stall)

    def cond(state):
        hi, it, _ = state
        return jnp.any(hi > 0) & (it < max_iters)

    hi0 = jnp.full((b, 1, 1), n - 1, jnp.int32)
    stall0 = jnp.zeros((b, 1, 1), jnp.int32)
    hi_f, it_f, _ = lax.while_loop(cond, body, (hi0, jnp.int32(0), stall0))

    lower = rows > cols
    hr_ref[:] = jnp.where(lower, 0., hr_ref[:])
    hi_ref[:] = jnp.where(lower, 0., hi_ref[:])
    # Convergence status per lane (the zgeev-INFO analogue): sublane 0 is
    # the final un-deflated window top (0 == converged), sublane 1 the
    # sweep count actually used.
    sub = lax.broadcasted_iota(jnp.int32, (b, 2, n), 1)
    stat_ref[:] = jnp.where(sub == 0,
                            jnp.broadcast_to(hi_f.astype(jnp.float32),
                                             (b, 2, n)),
                            it_f.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('max_iter_factor', 'interpret',
                                              'exc_every', 'cplx_stall',
                                              'nruns', 'defl_mult'))
def _call_acc(Hr, Hi, ZTr, ZTi, max_iter_factor, interpret, exc_every=13,
              cplx_stall=_CPLX_STALL, nruns=_NRUNS, defl_mult=1.0):
    b, n = Hr.shape[0], Hr.shape[-1]
    kern = functools.partial(_kernel_acc, max_iters=max_iter_factor * n,
                             n=n, b=b, exc_every=exc_every,
                             cplx_stall=cplx_stall, nruns=nruns,
                             defl_mult=defl_mult)
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


def schur_qr_pallas_acc(Hr, Hi, Qr, Qi, max_iter_factor=40, interpret=False,
                        return_stats=False, exc_every=13,
                        cplx_stall=_CPLX_STALL, nruns=_NRUNS,
                        defl_mult=_DEFL_MULT):
    """Batched deferred-column Schur QR: [B, n, n] pairs -> Schur.

    O(B n) VPU work per rotation + two MXU matmuls per sweep; W scratch
    lives in VMEM (6 resident arrays per chunk).

    Non-convergence surfaces instead of returning silent garbage: lanes
    whose iteration budget ran out with an un-deflated window get their
    Schur diagonal (the eigenvalues) poisoned with NaN — the analogue of
    LAPACK zgeev's nonzero INFO, which the reference would raise on.
    With ``return_stats=True`` also returns (final_window_top, sweeps)
    per lane, each [B] (window top 0 == converged).
    """
    b, n = Hr.shape[0], Hr.shape[-1]
    # measured VMEM footprint: ~40 (n,n)-array equivalents per batch lane
    # (6 resident refs + 4 input copies + matmul/masking temporaries)
    per = 48 * n * n * np.dtype(Hr.dtype).itemsize
    chunk = max(1, min(b, _VMEM_BUDGET // per))
    ZTr = jnp.swapaxes(Qr, -2, -1)
    ZTi = jnp.swapaxes(Qi, -2, -1)
    outs = []
    for s in range(0, b, chunk):
        e = min(s + chunk, b)
        outs.append(_call_acc(Hr[s:e], Hi[s:e], ZTr[s:e], ZTi[s:e],
                              max_iter_factor, interpret, exc_every,
                              cplx_stall, nruns, defl_mult))
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


# ---------------------------------------------------------------------------
# Eigenvectors of the triangular Schur factor, as one kernel
# ---------------------------------------------------------------------------
#
# For an upper-triangular T, the eigenvector matrix Y (upper triangular,
# unit diagonal) satisfies, for column m and rows j < m:
#     y[j, m] = -( sum_{j < l <= m} T[j, l] y[l, m] ) / (T[j,j] - T[m,m])
# The numerator's T entries are lambda-independent (l != j), so one row
# step j updates ALL columns at once:  s = T[j, j+1:] @ Y[j+1:, :].
# The XLA-loop version (eig_qr_real.eig_tri_vectors_real) pays dispatch
# per step; here the n-step recurrence runs in-kernel (measured ~50x).


def _kernel_vec(tr_in, ti_in, yr_ref, yi_ref, *, n: int, b: int):
    rows = lax.broadcasted_iota(jnp.int32, (b, n, n), 1)
    cols = lax.broadcasted_iota(jnp.int32, (b, n, n), 2)
    iota_n = lax.broadcasted_iota(jnp.int32, (b, 1, n), 2)

    Tr = tr_in[:]
    Ti = ti_in[:]
    # lambda (diagonal) as (b,1,n)
    mdiag = rows == cols
    lr = jnp.sum(jnp.where(mdiag, Tr, 0.), axis=1, keepdims=True)
    li = jnp.sum(jnp.where(mdiag, Ti, 0.), axis=1, keepdims=True)
    # small-pivot floor per column m (LAPACK-style, mirrors
    # eig_qr_real.eig_tri_vectors_real); the (b,n,n) denominator matrix is
    # NOT materialized — row j's denominators are built inside the step,
    # which keeps the kernel's resident VMEM to the 8 refs (the full-matrix
    # variant ran out of VMEM at n ~ 1050)
    tnorm = jnp.max(jnp.sum(jnp.sqrt(Tr * Tr + Ti * Ti), axis=1,
                            keepdims=True), axis=2, keepdims=True)
    lmag = jnp.sqrt(lr * lr + li * li)        # |lambda_m| per column
    dmin = jnp.maximum(_F32EPS * jnp.maximum(lmag, tnorm), _SMLNUM)

    # Y starts as the identity (y[m,m] = 1)
    eye = (rows == cols).astype(jnp.float32)
    yr_ref[:] = eye
    yi_ref[:] = jnp.zeros_like(eye)

    def step(t, _):
        j = n - 2 - t
        # s = T[j, j+1:] @ Y[j+1:, :]  — mask T row j to l > j; Y rows
        # below the diagonal are zero so no second mask is needed
        trow_r = tr_in[:, pl.ds(j, 1), :]
        trow_i = ti_in[:, pl.ds(j, 1), :]
        msk = (iota_n > j).astype(jnp.float32)
        trow_r = trow_r * msk
        trow_i = trow_i * msk
        Yr = yr_ref[:]
        Yi = yi_ref[:]
        tcol_r = jnp.swapaxes(trow_r, 1, 2)   # (b,n,1)
        tcol_i = jnp.swapaxes(trow_i, 1, 2)
        s_r = jnp.sum(tcol_r * Yr - tcol_i * Yi, axis=1, keepdims=True)
        s_i = jnp.sum(tcol_r * Yi + tcol_i * Yr, axis=1, keepdims=True)
        # pivoted denominators for row j: D[j, m] = lambda_j - lambda_m,
        # floored at dmin (all (b,1,n) work)
        ljr = jnp.sum(jnp.where(iota_n == j, lr, 0.), axis=2, keepdims=True)
        lji = jnp.sum(jnp.where(iota_n == j, li, 0.), axis=2, keepdims=True)
        drow_r = ljr - lr
        drow_i = lji - li
        dabs = jnp.sqrt(drow_r * drow_r + drow_i * drow_i)
        small = dabs < dmin
        scl = jnp.where(small & (dabs > 0),
                        dmin / jnp.where(dabs > 0, dabs, 1.), 1.)
        drow_r = jnp.where(small & (dabs == 0), dmin, drow_r * scl)
        drow_i = jnp.where(small & (dabs == 0), 0., drow_i * scl)
        dden_j = drow_r * drow_r + drow_i * drow_i
        dden_j = jnp.where(dden_j > 0, dden_j, 1.)
        # y[j, m] = -s / D[j, m] for m > j
        q_r = -(s_r * drow_r + s_i * drow_i) / dden_j
        q_i = -(s_i * drow_r - s_r * drow_i) / dden_j
        keep = (iota_n > j).astype(jnp.float32)
        yjr = yr_ref[:, pl.ds(j, 1), :]
        yji = yi_ref[:, pl.ds(j, 1), :]
        yr_ref[:, pl.ds(j, 1), :] = yjr * (1 - keep) + q_r * keep
        yi_ref[:, pl.ds(j, 1), :] = yji * (1 - keep) + q_i * keep
        return 0

    lax.fori_loop(0, n - 1, step, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _call_vec(Tr, Ti, interpret):
    b, n = Tr.shape[0], Tr.shape[-1]
    kern = functools.partial(_kernel_vec, n=n, b=b)
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((b, n, n), Tr.dtype)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 2 ** 20),
        interpret=interpret,
    )(Tr, Ti)
    return out


def eig_tri_vectors_pallas(Tr, Ti, Zr, Zi, interpret=False):
    """Batched eigenvectors from Schur factors: [B, n, n] -> (Vr, Vi).

    The triangular back-substitution recurrence runs in-kernel (measured
    ~50x over the XLA-loop twin); the final V = Z @ Y product and column
    normalization run as plain XLA matmuls OUTSIDE the kernel — XLA tiles
    them through HBM, which keeps the kernel's VMEM footprint to the
    4 (b,n,n) refs and lifts the previous n ~ 1050 VMEM ceiling."""
    b, n = Tr.shape[0], Tr.shape[-1]
    per = 12 * n * n * np.dtype(Tr.dtype).itemsize
    chunk = max(1, min(b, _VMEM_BUDGET // per))
    outs = []
    for s in range(0, b, chunk):
        e = min(s + chunk, b)
        outs.append(_call_vec(Tr[s:e], Ti[s:e], interpret))
    Yr = jnp.concatenate([o[0] for o in outs], axis=0)
    Yi = jnp.concatenate([o[1] for o in outs], axis=0)
    with jax.default_matmul_precision('highest'):
        Vr = Zr @ Yr - Zi @ Yi
        Vi = Zr @ Yi + Zi @ Yr
    nrm = jnp.sqrt(jnp.sum(Vr * Vr + Vi * Vi, axis=-2, keepdims=True))
    nrm = jnp.where(nrm > 0, nrm, 1.)
    return Vr / nrm, Vi / nrm


# ---------------------------------------------------------------------------
# Hessenberg reduction kernel
# ---------------------------------------------------------------------------
#
# Householder reduction with the whole batch resident in VMEM.  Each step
# builds the reflector from column k (masked full-matrix reduce — the
# lane dimension cannot be dynamically sliced here), then applies it with
# two MXU matvecs and three outer-product updates.  The XLA-loop twin
# (eig_qr_real.hessenberg_real) pays ~10 dispatches x O(n^2) per step,
# ~30x slower at n=162 and O(n) worse with n.


def _kernel_hess(ar_in, ai_in, hr_ref, hi_ref, qr_ref, qi_ref,
                 *, n: int, b: int):
    rows = lax.broadcasted_iota(jnp.int32, (b, n, n), 1)
    cols = lax.broadcasted_iota(jnp.int32, (b, n, n), 2)
    ridx = lax.broadcasted_iota(jnp.int32, (b, n, 1), 1)

    hr_ref[:] = ar_in[:]
    hi_ref[:] = ai_in[:]
    qr_ref[:] = (rows == cols).astype(jnp.float32)
    qi_ref[:] = jnp.zeros((b, n, n), jnp.float32)

    dn_vm = (((1,), (1,)), ((0,), (0,)))   # (b,n,1)^T-style: v^H H contract rows
    dn_mv = (((2,), (1,)), ((0,), (0,)))   # H v contract lanes
    prec = lax.Precision.HIGHEST

    def step(k, _):
        Hr = hr_ref[:]
        Hi = hi_ref[:]
        # column k below the diagonal, (b,n,1)
        cmask = (cols == k) & (rows > k)
        xr = jnp.sum(jnp.where(cmask, Hr, 0.), axis=2, keepdims=True)
        xi = jnp.sum(jnp.where(cmask, Hi, 0.), axis=2, keepdims=True)
        # alpha = H[k+1, k]
        a_r = jnp.sum(jnp.where(ridx == k + 1, xr, 0.), axis=1, keepdims=True)
        a_i = jnp.sum(jnp.where(ridx == k + 1, xi, 0.), axis=1, keepdims=True)
        # single-axis reduce: Mosaic has no multi-axis reduction lowering
        xnorm = jnp.sqrt(jnp.sum(xr * xr + xi * xi, axis=1, keepdims=True))
        aabs = jnp.sqrt(a_r * a_r + a_i * a_i)
        safe = jnp.where(aabs > 0, aabs, 1.)
        phr = jnp.where(aabs > 0, a_r / safe, 1.)
        phi = jnp.where(aabs > 0, a_i / safe, 0.)
        sel = (ridx == k + 1).astype(jnp.float32)
        vr = xr + sel * phr * xnorm
        vi = xi + sel * phi * xnorm
        vnorm2 = jnp.sum(vr * vr + vi * vi, axis=1, keepdims=True)
        beta = jnp.where(vnorm2 > 0, 2. / jnp.where(vnorm2 > 0, vnorm2, 1.),
                         0.)

        # w = beta v^H H  -> (b,1,n)
        def vh_m(Mr, Mi):
            wr = (lax.dot_general(vr, Mr, dn_vm, precision=prec,
                                  preferred_element_type=jnp.float32)
                  + lax.dot_general(vi, Mi, dn_vm, precision=prec,
                                    preferred_element_type=jnp.float32))
            wi = (lax.dot_general(vr, Mi, dn_vm, precision=prec,
                                  preferred_element_type=jnp.float32)
                  - lax.dot_general(vi, Mr, dn_vm, precision=prec,
                                    preferred_element_type=jnp.float32))
            return wr, wi    # dot_general output is already (b, 1, n)

        wr_, wi_ = vh_m(Hr, Hi)
        wr_ = beta * wr_
        wi_ = beta * wi_
        # H -= v w
        Hr = Hr - (vr * wr_ - vi * wi_)
        Hi = Hi - (vr * wi_ + vi * wr_)

        # u = beta H v -> (b,n,1)
        def m_v(Mr, Mi):
            ur = (lax.dot_general(Mr, vr, dn_mv, precision=prec,
                                  preferred_element_type=jnp.float32)
                  - lax.dot_general(Mi, vi, dn_mv, precision=prec,
                                    preferred_element_type=jnp.float32))
            ui = (lax.dot_general(Mr, vi, dn_mv, precision=prec,
                                  preferred_element_type=jnp.float32)
                  + lax.dot_general(Mi, vr, dn_mv, precision=prec,
                                    preferred_element_type=jnp.float32))
            return ur, ui

        ur_, ui_ = m_v(Hr, Hi)
        ur_ = beta * ur_
        ui_ = beta * ui_
        # H -= u v^H  (v^H = conj(v) as a row)
        vTr = jnp.swapaxes(vr, 1, 2)
        vTi = jnp.swapaxes(vi, 1, 2)
        hr_ref[:] = Hr - (ur_ * vTr + ui_ * vTi)
        hi_ref[:] = Hi - (ui_ * vTr - ur_ * vTi)

        # Q -= (beta Q v) v^H
        Qr = qr_ref[:]
        Qi = qi_ref[:]
        uq_r, uq_i = m_v(Qr, Qi)
        uq_r = beta * uq_r
        uq_i = beta * uq_i
        qr_ref[:] = Qr - (uq_r * vTr + uq_i * vTi)
        qi_ref[:] = Qi - (uq_i * vTr - uq_r * vTi)
        return 0

    lax.fori_loop(0, n - 2, step, 0)

    below = rows > cols + 1
    hr_ref[:] = jnp.where(below, 0., hr_ref[:])
    hi_ref[:] = jnp.where(below, 0., hi_ref[:])


@functools.partial(jax.jit, static_argnames=('interpret',))
def _call_hess(Ar, Ai, interpret):
    b, n = Ar.shape[0], Ar.shape[-1]
    kern = functools.partial(_kernel_hess, n=n, b=b)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((b, n, n), Ar.dtype)] * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 2 ** 20),
        interpret=interpret,
    )(Ar, Ai)


def hessenberg_pallas(Ar, Ai, interpret=False):
    """Batched Hessenberg reduction: [B, n, n] pairs -> (Hr, Hi, Qr, Qi)."""
    b, n = Ar.shape[0], Ar.shape[-1]
    per = 48 * n * n * np.dtype(Ar.dtype).itemsize
    chunk = max(1, min(b, _VMEM_BUDGET // per))
    outs = []
    for s in range(0, b, chunk):
        e = min(s + chunk, b)
        outs.append(_call_hess(Ar[s:e], Ai[s:e], interpret))
    return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                 for i in range(4))
