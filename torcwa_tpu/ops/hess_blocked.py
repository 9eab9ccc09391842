"""Blocked (compact-WY) Hessenberg reduction on split-real pairs.

The Pallas Hessenberg kernel (eig_qr_pallas.hessenberg_pallas) keeps the
whole batch VMEM-resident, which caps n around ~1400 on a v5e.  This is
the large-n path: LAPACK zgehrd's panel algorithm (dlahr2 structure)
expressed as plain XLA on (re, im) pairs — per panel, p sequential
reflector constructions (each one GEMV against the panel-start matrix
plus O(n p) small ops), then rank-p GEMM updates of the trailing matrix
and the accumulated Q.  XLA streams the GEMMs through HBM, so there is
no VMEM ceiling; at n = 5202 (the order-25 north star) the GEMM volume
is ~4n^3 complex flops.

Math (per panel starting at column k0, width p):
  Q_p = P_{k0} ... P_{k0+p-1} = I - V T V^H          (compact WY)
  column j of the current matrix (needed to build reflector j):
      u  = a0_j - Y (T (V^H e_j)),   Y = A0 V   (maintained, one GEMV/col)
      c  = u - V (T^H (V^H u))                      [= (Q^H A0 Q) e_j]
  panel end:
      M1 = A0 - Y (T V^H)                           [= A0 Q]
      A  = M1 - V (T^H (V^H M1))                    [= Q^H A0 Q]
      Qacc <- Qacc - (Qacc V)(T V^H)

Validated against the unblocked Householder reduction (hessenberg_real)
and by Q H Q^H == A round trips; see tests/test_hess_blocked.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['hessenberg_blocked']


def _cmm(a, b):
    return (a[0] @ b[0] - a[1] @ b[1], a[0] @ b[1] + a[1] @ b[0])


def _cT(a):
    return (jnp.swapaxes(a[0], -2, -1), -jnp.swapaxes(a[1], -2, -1))


def _csub(a, b):
    return a[0] - b[0], a[1] - b[1]


@functools.partial(jax.jit, static_argnames=('panel',))
def hessenberg_blocked(Ar, Ai, panel=128):
    """[n, n] split-real pair -> (Hr, Hi, Qr, Qi) with H = Q^H A Q upper
    Hessenberg, Q unitary."""
    n = Ar.shape[-1]
    rdtype = Ar.dtype
    p = min(panel, max(n - 2, 1))
    iota = jnp.arange(n)

    def panel_step(k0, A, Q):
        """One panel [k0, k0+p); k0 is traced (fori over panels)."""
        zeros_np = jnp.zeros((n, p), rdtype)
        V = (zeros_np, zeros_np)
        Y = (zeros_np, zeros_np)
        T = (jnp.zeros((p, p), rdtype), jnp.zeros((p, p), rdtype))

        def col_step(jj, carry):
            V, Y, T = carry
            j = k0 + jj
            valid = j < n - 2          # tail panel may be short

            a0 = (lax.dynamic_slice(A[0], (0, j), (n, 1)),
                  lax.dynamic_slice(A[1], (0, j), (n, 1)))
            # V^H e_j = conj(V[j, :])^T  -> (p, 1)
            vrow = (lax.dynamic_slice(V[0], (j, 0), (1, p)),
                    lax.dynamic_slice(V[1], (j, 0), (1, p)))
            vhe = (jnp.swapaxes(vrow[0], 0, 1), -jnp.swapaxes(vrow[1], 0, 1))
            tw = _cmm(T, vhe)                       # (p,1)
            u = _csub(a0, _cmm(Y, tw))
            vhu = _cmm(_cT(V), u)                   # (p,1)
            c = _csub(u, _cmm(V, _cmm(_cT(T), vhu)))

            # Householder from rows > j of c
            mask = (iota > j).astype(rdtype)[:, None]
            xr = c[0] * mask
            xi = c[1] * mask
            sel = (iota == (j + 1)).astype(rdtype)[:, None]
            a_r = jnp.sum(sel * xr)
            a_i = jnp.sum(sel * xi)
            xnorm = jnp.sqrt(jnp.sum(xr * xr + xi * xi))
            aabs = jnp.sqrt(a_r * a_r + a_i * a_i)
            safe = jnp.where(aabs > 0, aabs, 1.)
            phr = jnp.where(aabs > 0, a_r / safe, 1.)
            phi = jnp.where(aabs > 0, a_i / safe, 0.)
            vr = xr + sel * phr * xnorm
            vi = xi + sel * phi * xnorm
            vnorm2 = jnp.sum(vr * vr + vi * vi)
            beta = jnp.where((vnorm2 > 0) & valid,
                             2. / jnp.where(vnorm2 > 0, vnorm2, 1.), 0.)

            # T update: col jj = [-beta T (V^H v); beta]
            vhv = _cmm(_cT(V), (vr, vi))            # (p,1)
            tcol = _cmm(T, vhv)
            tcol = (-beta * tcol[0], -beta * tcol[1])
            rowsel = (jnp.arange(p) == jj).astype(rdtype)[:, None]
            tcol = (tcol[0] * (1 - rowsel) + beta * rowsel,
                    tcol[1] * (1 - rowsel))
            T = (lax.dynamic_update_slice(T[0], tcol[0], (0, jj)),
                 lax.dynamic_update_slice(T[1], tcol[1], (0, jj)))

            # Y col jj = A0 v (the one GEMV per column)
            y = _cmm(A, (vr, vi))
            Y = (lax.dynamic_update_slice(Y[0], y[0], (0, jj)),
                 lax.dynamic_update_slice(Y[1], y[1], (0, jj)))
            V = (lax.dynamic_update_slice(V[0], vr, (0, jj)),
                 lax.dynamic_update_slice(V[1], vi, (0, jj)))
            return (V, Y, T)

        V, Y, T = lax.fori_loop(0, p, col_step, (V, Y, T))

        # trailing updates: A <- Q_p^H A0 Q_p, Q <- Q Q_p
        TVh = _cmm(T, _cT(V))                       # (p, n)
        M1 = _csub(A, _cmm(Y, TVh))                 # A0 Q_p
        VhM = _cmm(_cT(V), M1)                      # (p, n)
        A = _csub(M1, _cmm(V, _cmm(_cT(T), VhM)))
        QV = _cmm(Q, V)
        Q = _csub(Q, _cmm(QV, TVh))
        return A, Q

    eyep = (jnp.eye(n, dtype=rdtype), jnp.zeros((n, n), rdtype))
    A = (Ar, Ai)
    Q = eyep
    if n > 2:
        n_panels = -(-(n - 2) // p)

        def body(ip, AQ):
            A, Q = AQ
            return panel_step(ip * p, A, Q)

        A, Q = lax.fori_loop(0, n_panels, body, (A, Q))

    below = iota[:, None] > iota[None, :] + 1
    Hr = jnp.where(below, 0., A[0])
    Hi = jnp.where(below, 0., A[1])
    return Hr, Hi, Q[0], Q[1]
