"""Packed-lane batched Schur QR: the deferred-column kernel with re|im
packed into one lane axis.

Same algorithm as ``eig_qr_pallas._kernel_acc`` (implicit single-shift
Francis QR with multi-run chasing, stall-gated complex shifts and
deferred-column epilogue GEMMs — the hot kernel replacing zgeev behind
torch.linalg.eig at /root/reference/torcwa/rcwa.py:1236), but H and the
accumulator W are stored PACKED: a (b, n, 2n) array whose lanes [0, n)
hold the real part of each row and lanes [n, 2n) the imaginary part.

Why: the batched kernel is per-rotation-overhead-bound (~2.4 us across
~30 small VPU ops per chase step; see NOTES round 3).  Complex rotation
updates mix re and im, which in split storage costs 4 reads + 4 writes +
~16 multiply-adds per row pair.  In packed storage one (b, 1, 2n) row op
replaces each (re, im) pair of (b, 1, n) ops:

    nk = c*hk + sr*h1 + si*(S * roll(h1, n))        S = (-1 | +1)
    n1 = c*h1 - sr*hk + si*(S * roll(hk, n))
    mk = c*wk + sr*w1 + si*(T * roll(w1, n))        T = (+1 | -1) = -S
    m1 = c*w1 - sr*wk + si*(T * roll(wk, n))

because a lane roll by n swaps the halves (re <-> im) and the sign
vector implements the conjugate twist.  The dot products that feed the
next rotation contract the full 2n lanes:

    Re<a, conj(b)>-style terms:  sum(a * (T * b))   = ar.br - ai.bi
    Im terms:                    sum(a * roll(b, n)) = ar.bi + ai.br

Per step this cuts row reads 10 -> 5, writes 8 -> 4 and roughly halves
the elementwise op count at twice the width per op.  The per-sweep
stages (deflation scan, shift vectorization, epilogue GEMMs) keep the
acc kernel's structure on static re/im lane slices of the packed refs.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['schur_qr_pallas_packed']

_F32EPS = 1.1920929e-07
_SMLNUM = 1e-31
_VMEM_BUDGET = 96 * 2 ** 20
_CHUNK = 512
_CPLX_STALL = 30     # see eig_qr_pallas._CPLX_STALL
_NRUNS = 4           # see eig_qr_pallas._NRUNS


def _kernel_packed(hp_in, ztp_in,
                   hp_ref, ztp_ref, wp_ref, stat_ref,
                   *, max_iters: int, n: int, b: int, npad: int):
    # the im half starts at lane npad (n rounded up to the 128-lane vreg
    # width) so the half-swap pltpu.roll is whole-vreg moves, not a
    # misaligned cross-vreg shuffle (measured: misaligned rolls cost the
    # packed kernel its entire advantage); lanes [n, npad) stay zero
    n2 = 2 * npad
    hp_ref[:] = hp_in[:]
    ztp_ref[:] = ztp_in[:]
    rows = lax.broadcasted_iota(jnp.int32, (b, n, n2), 1)
    cols2 = lax.broadcasted_iota(jnp.int32, (b, n, n2), 2)
    col_mod = jnp.where(cols2 < npad, cols2, cols2 - npad)
    iota_n = lax.broadcasted_iota(jnp.int32, (b, 1, n), 2)
    iota_2n = lax.broadcasted_iota(jnp.int32, (b, 1, n2), 2)
    # sign vectors of the packed rotation algebra (see module docstring)
    S_sign = jnp.where(iota_2n < npad, -1., 1.)
    T_sign = -S_sign
    # packed identity: eye in the re half, zero in the im half
    eye_p = ((rows == cols2) & (cols2 < npad)).astype(jnp.float32)
    hess_mask_p = rows <= col_mod + 1

    def at_lane(vec_row, j):
        return jnp.sum(jnp.where(iota_n == j, vec_row, 0.),
                       axis=2, keepdims=True)

    gran = 128 if n <= 640 else 256
    widths = [min(gran * (i + 1), n) for i in range((n + gran - 1) // gran)]

    def body(state):
        hi_prev, it, stall = state

        # ---- deflation scan on the live prefix (packed slab) --------------
        # one masked reduction per diagonal extracts BOTH components: the
        # (b, w, 2w) slab concatenates the re and im lane halves, so the
        # (b, 1, 2w) result rows come out packed (re | im).
        def scan_slab(w):
            def f():
                Hs = jnp.concatenate([hp_ref[:, :w, :w],
                                      hp_ref[:, :w, npad:npad + w]],
                                     axis=2)
                rw = lax.broadcasted_iota(jnp.int32, (b, w, 2 * w), 1)
                cw = lax.broadcasted_iota(jnp.int32, (b, w, 2 * w), 2)
                cwm = jnp.where(cw < w, cw, cw - w)
                outs = []
                zpad = (jnp.zeros((b, 1, n - w), jnp.float32)
                        if w < n else None)
                for off in (0, -1, 1):
                    msk = rw == (cwm - off)
                    p = jnp.sum(jnp.where(msk, Hs, 0.), axis=1,
                                keepdims=True)          # (b, 1, 2w) packed
                    pr = p[:, :, :w]
                    pi = p[:, :, w:]
                    if w < n:
                        pr = jnp.concatenate([pr, zpad], axis=2)
                        pi = jnp.concatenate([pi, zpad], axis=2)
                    outs += [pr, pi]
                wp_ref[:, :w, :] = eye_p[:, :w, :]
                return tuple(outs)
            return f

        branch_s = jnp.minimum((jnp.max(hi_prev) + 2) // gran,
                               len(widths) - 1)
        dr, di, sr_, si_, supr, supi = lax.switch(
            branch_s, [scan_slab(w) for w in widths])

        # ---- deflation window (identical to the acc kernel) ---------------
        d = jnp.sqrt(dr * dr + di * di)
        sub2 = sr_ * sr_ + si_ * si_
        dshift = jnp.where(iota_n == n - 1, 0.,
                           pltpu.roll(d, shift=n - 1, axis=2))
        thresh = jnp.maximum(_F32EPS * (d + dshift), _SMLNUM)
        alive = sub2 > thresh * thresh
        lane = iota_n + 1
        hi = jnp.max(jnp.where((lane <= hi_prev) & alive, lane, 0),
                     axis=2, keepdims=True)
        stall = jnp.where(hi < hi_prev, 0, stall + 1)
        alive_prev = pltpu.roll(alive.astype(jnp.float32),
                                shift=1, axis=2) > 0.5
        lo = jnp.max(jnp.where((iota_n <= hi) &
                               ((iota_n == 0) | ~alive_prev),
                               iota_n, 0), axis=2, keepdims=True)

        # ---- per-position Wilkinson shifts (identical) ---------------------
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
        cplx_ok = (qi_ != 0.) | (stall >= _CPLX_STALL)
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

        # ---- one bulge per independent alive run (identical) ---------------
        exc = (it % 13) == 12
        zero_v = jnp.zeros((b, 1, n), jnp.float32)
        act_vec = zero_v
        intro_vec = zero_v
        x0r_vec = zero_v
        x0i_vec = zero_v
        y0r_vec = zero_v
        y0i_vec = zero_v
        lo_r, hi_r = lo, hi
        lo_min_v = lo
        for r in range(_NRUNS):
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

        # The chase loop carries its working rows instead of re-reading
        # them: H row k equals last step's n1, H row k+1 equals last step's
        # dot-product operand h2, and W rows at and beyond k+1 are still
        # identity one-hots (W was reset this sweep and rotations only
        # touch rows <= k), so w1/w1s are iota compares, not loads.  The
        # half-swapped twins ride along via the roll identity
        # roll(S*roll(x)) == -S*x, leaving ONE roll per step (fresh h2).
        # Rows are flushed once per step (nk, mk final at step k) plus a
        # single dynamic flush of the carried row `end` after the loop.
        def step(k, carry):
            (xr, xi, yr, yi, hk, hks, h1, h1s, wk, wks) = carry
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

            # H rows k, k+1 (packed), both operands carried
            nk = c * hk + sr * h1 + si * (S_sign * h1s)
            n1 = c * h1 - sr * hk + si * (S_sign * hks)
            n1s = c * h1s - sr * hks - si * (S_sign * hk)
            hp_ref[:, pl.ds(k, 1), :] = nk

            # W rows k, k+1: w1 is the identity one-hot e_{k+1}
            w1 = (iota_2n == k + 1).astype(jnp.float32)
            w1s = (iota_2n == npad + k + 1).astype(jnp.float32)
            mk = c * wk + sr * w1 - si * w1s
            mks = c * wks + sr * w1s - si * w1
            m1 = c * w1 - sr * wk + si * (T_sign * wks)
            m1s = c * w1s - sr * wks - si * (T_sign * wk)
            wp_ref[:, pl.ds(k, 1), :] = mk

            # next rotation source from M = H W^T, packed contractions:
            # Re<a, b*> = sum(a * (T*b)), Im = sum(a * roll(b, n))
            k2 = jnp.minimum(k + 2, n - 1)
            h2 = hp_ref[:, pl.ds(k2, 1), :]
            h2s = pltpu.roll(h2, shift=npad, axis=2)
            tmk = T_sign * mk
            xn_r = jnp.sum(n1 * tmk, axis=2, keepdims=True)
            xn_i = jnp.sum(n1 * mks, axis=2, keepdims=True)
            y2_r = jnp.sum(h2 * tmk, axis=2, keepdims=True)
            y2_i = jnp.sum(h2 * mks, axis=2, keepdims=True)
            nxt_ok = (k + 2) <= hi
            yn_r = jnp.where(nxt_ok, y2_r, 0.)
            yn_i = jnp.where(nxt_ok, y2_i, 0.)
            xr = jnp.where(active, xn_r, xr)
            xi = jnp.where(active, xn_i, xi)
            yr = jnp.where(active, yn_r, yr)
            yi = jnp.where(active, yn_i, yi)
            return (xr, xi, yr, yi, n1, n1s, h2, h2s, m1, m1s)

        lo_min = jnp.min(lo_min_v)
        hi_max = jnp.max(hi)
        end = jnp.minimum(hi_max, n - 1)
        zero_s = jnp.zeros((b, 1, 1), jnp.float32)
        hk0 = hp_ref[:, pl.ds(lo_min, 1), :]
        h10 = hp_ref[:, pl.ds(jnp.minimum(lo_min + 1, n - 1), 1), :]
        hks0 = pltpu.roll(hk0, shift=npad, axis=2)
        h1s0 = pltpu.roll(h10, shift=npad, axis=2)
        wk0 = (iota_2n == lo_min).astype(jnp.float32)
        wks0 = (iota_2n == npad + lo_min).astype(jnp.float32)
        fin = lax.fori_loop(lo_min, end, step,
                            (zero_s, zero_s, zero_s, zero_s,
                             hk0, hks0, h10, h1s0, wk0, wks0))
        # flush the carried row `end` (the last n1/m1 live only in the
        # carry); guarded: a sweep where every lane deflated at the scan
        # (hi_max == 0) runs zero steps and must not move row contents
        ran = hi_max > 0
        cur_h = hp_ref[:, pl.ds(end, 1), :]
        cur_w = wp_ref[:, pl.ds(end, 1), :]
        hp_ref[:, pl.ds(end, 1), :] = jnp.where(ran, fin[4], cur_h)
        wp_ref[:, pl.ds(end, 1), :] = jnp.where(ran, fin[8], cur_w)

        # ---- deferred columns: H <- H @ W^T, Z^T <- W @ Z^T ----------------
        # 4 real GEMMs each on static re/im lane slices of the packed refs
        # (same structure and chunking as the acc kernel's epilogue)
        dn_t = (((2,), (2,)), ((0,), (0,)))
        dn_m = (((2,), (1,)), ((0,), (0,)))
        prec = lax.Precision.HIGHEST

        def apply_slab(width):
            def f():
                Wr = wp_ref[:, :width, :width]
                Wi = wp_ref[:, :width, npad:npad + width]
                for r0 in range(0, n, _CHUNK):
                    r1 = min(r0 + _CHUNK, n)
                    Hr = hp_ref[:, r0:r1, :width]
                    Hi = hp_ref[:, r0:r1, npad:npad + width]
                    Hr2 = (lax.dot_general(Hr, Wr, dn_t, precision=prec,
                                           preferred_element_type=jnp.float32)
                           - lax.dot_general(Hi, Wi, dn_t, precision=prec,
                                             preferred_element_type=jnp.float32))
                    Hi2 = (lax.dot_general(Hr, Wi, dn_t, precision=prec,
                                           preferred_element_type=jnp.float32)
                           + lax.dot_general(Hi, Wr, dn_t, precision=prec,
                                             preferred_element_type=jnp.float32))
                    hm = hess_mask_p[:, r0:r1, :width]
                    hp_ref[:, r0:r1, :width] = jnp.where(hm, Hr2, 0.)
                    hp_ref[:, r0:r1, npad:npad + width] = jnp.where(hm, Hi2, 0.)
                for c0 in range(0, n, _CHUNK):
                    c1 = min(c0 + _CHUNK, n)
                    Zr = ztp_ref[:, :width, c0:c1]
                    Zi = ztp_ref[:, :width, npad + c0:npad + c1]
                    Zr2 = (lax.dot_general(Wr, Zr, dn_m, precision=prec,
                                           preferred_element_type=jnp.float32)
                           - lax.dot_general(Wi, Zi, dn_m, precision=prec,
                                             preferred_element_type=jnp.float32))
                    Zi2 = (lax.dot_general(Wr, Zi, dn_m, precision=prec,
                                           preferred_element_type=jnp.float32)
                           + lax.dot_general(Wi, Zr, dn_m, precision=prec,
                                             preferred_element_type=jnp.float32))
                    ztp_ref[:, :width, c0:c1] = Zr2
                    ztp_ref[:, :width, npad + c0:npad + c1] = Zi2
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

    lower = rows > col_mod
    hp_ref[:] = jnp.where(lower, 0., hp_ref[:])
    sub = lax.broadcasted_iota(jnp.int32, (b, 2, n), 1)
    stat_ref[:] = jnp.where(sub == 0,
                            jnp.broadcast_to(hi_f.astype(jnp.float32),
                                             (b, 2, n)),
                            it_f.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('max_iter_factor', 'interpret'))
def _call_packed(Hp, ZTp, max_iter_factor, interpret):
    b, n = Hp.shape[0], Hp.shape[1]
    npad = Hp.shape[2] // 2
    kern = functools.partial(_kernel_packed, max_iters=max_iter_factor * n,
                             n=n, b=b, npad=npad)
    out = pl.pallas_call(
        kern,
        out_shape=([jax.ShapeDtypeStruct((b, n, 2 * npad), Hp.dtype)] * 3
                   + [jax.ShapeDtypeStruct((b, 2, n), jnp.float32)]),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 2 ** 20),
        interpret=interpret,
    )(Hp, ZTp)
    return out[0], out[1], out[3]


def schur_qr_pallas_packed(Hr, Hi, Qr, Qi, max_iter_factor=40,
                           interpret=False, return_stats=False):
    """Packed-lane batched deferred-column Schur QR (drop-in twin of
    eig_qr_pallas.schur_qr_pallas_acc; same convergence semantics and
    NaN-poisoning of non-converged lanes)."""
    b, n = Hr.shape[0], Hr.shape[-1]
    # same resident bytes as the acc kernel (3 packed refs + 2 packed
    # inputs ~= 10 nxn-pairs) plus temporaries
    per = 48 * n * n * np.dtype(Hr.dtype).itemsize
    chunk = max(1, min(b, _VMEM_BUDGET // per))
    ZTr = jnp.swapaxes(Qr, -2, -1)
    ZTi = jnp.swapaxes(Qi, -2, -1)
    npad = -(-n // 128) * 128      # im half at a vreg-aligned lane offset
    zpad = jnp.zeros((b, n, npad - n), Hr.dtype)
    Hp = jnp.concatenate([Hr, zpad, Hi, zpad], axis=2)
    ZTp = jnp.concatenate([ZTr, zpad, ZTi, zpad], axis=2)
    outs = []
    for s in range(0, b, chunk):
        e = min(s + chunk, b)
        outs.append(_call_packed(Hp[s:e], ZTp[s:e],
                                 max_iter_factor, interpret))
    Hp_o = jnp.concatenate([o[0] for o in outs], axis=0)
    ZTp_o = jnp.concatenate([o[1] for o in outs], axis=0)
    stat = jnp.concatenate([o[2] for o in outs], axis=0)
    Tr, Ti = Hp_o[:, :, :n], Hp_o[:, :, npad:npad + n]
    Zr = jnp.swapaxes(ZTp_o[:, :, :n], -2, -1)
    Zi = jnp.swapaxes(ZTp_o[:, :, npad:npad + n], -2, -1)
    hi_f = stat[:, 0, 0]
    sweeps = stat[:, 1, 0]
    bad = (hi_f > 0)[:, None, None]
    eye = jnp.eye(n, dtype=bool)[None]
    Tr = jnp.where(bad & eye, jnp.nan, Tr)
    Ti = jnp.where(bad & eye, jnp.nan, Ti)
    out = (Tr, Ti, Zr, Zi)
    if return_stats:
        return out + ((hi_f.astype(jnp.int32), sweeps.astype(jnp.int32)),)
    return out
