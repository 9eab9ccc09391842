"""Blocked eigenvectors of a triangular Schur factor (large-n path).

The all-in-VMEM kernel (eig_qr_pallas.eig_tri_vectors_pallas) needs the
full T and Y resident, capping n around ~2000.  Here the unit-upper-
triangular Y (T Y = Y diag(lambda)) is built in row blocks from the
bottom: per block, the contribution of already-solved rows is one masked
GEMM at the XLA level (streams through HBM), and the in-block backward
recurrence runs in a reusable Pallas kernel whose refs are three
(p, n) slabs — the block's T rows, the GEMM contribution S, and the Y
block (the block start r0 arrives as a traced scalar operand, so ONE
kernel compilation serves every block).  V = Z @ Y and the column
normalization are plain XLA GEMMs.

Same pivot flooring as the resident kernel (LAPACK-style dmin on the
shifted diagonal), so results match it to roundoff.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['eig_tri_vectors_blocked']

_F32EPS = 1.1920929e-07
_F64EPS = 2.220446049250313e-16
_SMLNUM = 1e-31


def _kernel_block(r0_in, trows_r, trows_i, s_r, s_i, lam_r, lam_i, dmin_in,
                  yr_ref, yi_ref, *, p: int, n: int):
    r0 = r0_in[0, 0]
    iota_n = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    prow = lax.broadcasted_iota(jnp.int32, (1, p, 1), 1)
    dmin = dmin_in[:]                                  # (1, 1, n) per column

    # Y block starts as its slice of the identity
    eye_blk = ((r0 + prow) == iota_n).astype(jnp.float32)
    yr_ref[:] = eye_blk
    yi_ref[:] = jnp.zeros_like(eye_blk)

    # one-hot (1, n, p): sel[l, i] = (l == r0 + i), for gathering the
    # in-block lane window of a T row (lane-dim dynamic slicing is not
    # lowerable; a selection matmul is)
    lcol = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    irow = lax.broadcasted_iota(jnp.int32, (1, 1, p), 2)
    sel = (lcol == (r0 + irow)).astype(jnp.float32)    # (1, n, p)
    dn_sel = (((2,), (1,)), ((0,), (0,)))              # (1,1,n)x(1,n,p)
    dn_row = (((2,), (1,)), ((0,), (0,)))              # (1,1,p)x(1,p,n)
    prec = lax.Precision.HIGHEST

    def step(t, _):
        jl = p - 1 - t
        jg = r0 + jl
        trow_r = trows_r[:, pl.ds(jl, 1), :]
        trow_i = trows_i[:, pl.ds(jl, 1), :]
        inmask = ((iota_n > jg) & (iota_n < r0 + p)).astype(jnp.float32)
        tin_r = trow_r * inmask
        tin_i = trow_i * inmask
        # gather in-block lanes -> (1,1,p), then contract with the Y block
        tcol_r = lax.dot_general(tin_r, sel, dn_sel, precision=prec,
                                 preferred_element_type=jnp.float32)
        tcol_i = lax.dot_general(tin_i, sel, dn_sel, precision=prec,
                                 preferred_element_type=jnp.float32)
        Yr = yr_ref[:]
        Yi = yi_ref[:]
        sin_r = (lax.dot_general(tcol_r, Yr, dn_row, precision=prec,
                                 preferred_element_type=jnp.float32)
                 - lax.dot_general(tcol_i, Yi, dn_row, precision=prec,
                                   preferred_element_type=jnp.float32))
        sin_i = (lax.dot_general(tcol_r, Yi, dn_row, precision=prec,
                                 preferred_element_type=jnp.float32)
                 + lax.dot_general(tcol_i, Yr, dn_row, precision=prec,
                                   preferred_element_type=jnp.float32))
        stot_r = sin_r + s_r[:, pl.ds(jl, 1), :]
        stot_i = sin_i + s_i[:, pl.ds(jl, 1), :]

        # pivoted denominators D[jg, m] = lambda_jg - lambda_m
        ljr = jnp.sum(jnp.where(iota_n == jg, lam_r[:], 0.),
                      axis=2, keepdims=True)
        lji = jnp.sum(jnp.where(iota_n == jg, lam_i[:], 0.),
                      axis=2, keepdims=True)
        dr = ljr - lam_r[:]
        di = lji - lam_i[:]
        dabs = jnp.sqrt(dr * dr + di * di)
        small = dabs < dmin
        scl = jnp.where(small & (dabs > 0),
                        dmin / jnp.where(dabs > 0, dabs, 1.), 1.)
        dr = jnp.where(small & (dabs == 0), dmin, dr * scl)
        di = jnp.where(small & (dabs == 0), 0., di * scl)
        dden = dr * dr + di * di
        dden = jnp.where(dden > 0, dden, 1.)
        q_r = -(stot_r * dr + stot_i * di) / dden
        q_i = -(stot_i * dr - stot_r * di) / dden

        keep = (iota_n > jg).astype(jnp.float32)
        yjr = yr_ref[:, pl.ds(jl, 1), :]
        yji = yi_ref[:, pl.ds(jl, 1), :]
        yr_ref[:, pl.ds(jl, 1), :] = yjr * (1 - keep) + q_r * keep
        yi_ref[:, pl.ds(jl, 1), :] = yji * (1 - keep) + q_i * keep
        return 0

    lax.fori_loop(0, p, step, 0)


@functools.partial(jax.jit, static_argnames=('p', 'n', 'interpret'))
def _call_block(r0, Trows, S, lam, dmin, p, n, interpret):
    kern = functools.partial(_kernel_block, p=p, n=n)
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, p, n), jnp.float32)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=114 * 2 ** 20),
        interpret=interpret,
    )(r0, Trows[0], Trows[1], S[0], S[1], lam[0], lam[1], dmin)
    return out


def eig_tri_vectors_blocked(Tr, Ti, Zr, Zi, block=128, interpret=False):
    """Eigenvectors from Schur factors, [n, n] pairs -> (Vr, Vi).

    Large-n twin of eig_tri_vectors_pallas: O(n/p) kernel launches with
    (p, n)-slab VMEM footprints instead of full-matrix residency.
    """
    n = Tr.shape[-1]
    rdtype = Tr.dtype
    p = min(block, n)
    n_pad = -(-n // p) * p

    lam_r = jnp.diagonal(Tr)[None, None, :]
    lam_i = jnp.diagonal(Ti)[None, None, :]
    tnorm = jnp.max(jnp.sum(jnp.sqrt(Tr * Tr + Ti * Ti), axis=0))
    lmag = jnp.sqrt(lam_r * lam_r + lam_i * lam_i)
    eps = _F32EPS if rdtype == jnp.float32 else _F64EPS
    dmin = jnp.maximum(eps * jnp.maximum(lmag, tnorm), _SMLNUM)
    dmin = dmin.astype(jnp.float32)

    # pad to a block multiple with an identity tail (isolated eigenvalues
    # far from the spectrum keep the padding rows inert)
    if n_pad != n:
        padv = 0.
        Tr_p = jnp.zeros((n_pad, n_pad), rdtype).at[:n, :n].set(Tr)
        Ti_p = jnp.zeros((n_pad, n_pad), rdtype).at[:n, :n].set(Ti)
        lam_rp = jnp.zeros((1, 1, n_pad), rdtype).at[:, :, :n].set(lam_r)
        lam_ip = jnp.zeros((1, 1, n_pad), rdtype).at[:, :, :n].set(lam_i)
        dmin_p = jnp.full((1, 1, n_pad), jnp.float32(1.)
                          ).at[:, :, :n].set(dmin)
    else:
        Tr_p, Ti_p, lam_rp, lam_ip, dmin_p = Tr, Ti, lam_r, lam_i, dmin
    npd = n_pad

    Yr = jnp.eye(npd, dtype=jnp.float32)
    Yi = jnp.zeros((npd, npd), jnp.float32)
    lam = (lam_rp.astype(jnp.float32), lam_ip.astype(jnp.float32))
    iota = jnp.arange(npd)

    with jax.default_matmul_precision('highest'):
        for r0 in range(npd - p, -1, -p):
            r1 = r0 + p
            Trows = (Tr_p[r0:r1, :].astype(jnp.float32),
                     Ti_p[r0:r1, :].astype(jnp.float32))
            # S = T[r0:r1, r1:] @ Y[r1:, :]: mask the summation lanes
            # below r1 (single GEMM shape for every block)
            lmask = (iota >= r1).astype(jnp.float32)[None, :]
            Tm = (Trows[0] * lmask, Trows[1] * lmask)
            S = (Tm[0] @ Yr - Tm[1] @ Yi, Tm[0] @ Yi + Tm[1] @ Yr)
            r0a = jnp.full((1, 1), r0, jnp.int32)
            yb_r, yb_i = _call_block(r0a, (Trows[0][None], Trows[1][None]),
                                     (S[0][None], S[1][None]), lam, dmin_p,
                                     p, npd, interpret)
            Yr = Yr.at[r0:r1, :].set(yb_r[0])
            Yi = Yi.at[r0:r1, :].set(yb_i[0])

        Yr = Yr[:n, :n].astype(rdtype)
        Yi = Yi[:n, :n].astype(rdtype)
        Vr = Zr @ Yr - Zi @ Yi
        Vi = Zr @ Yi + Zi @ Yr
    nrm = jnp.sqrt(jnp.sum(Vr * Vr + Vi * Vi, axis=0, keepdims=True))
    nrm = jnp.where(nrm > 0, nrm, 1.)
    return Vr / nrm, Vi / nrm
