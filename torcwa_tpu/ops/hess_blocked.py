"""Blocked (compact-WY) Hessenberg reduction on split-real pairs.

The Pallas Hessenberg kernel (eig_qr_pallas.hessenberg_pallas) keeps the
whole batch VMEM-resident, which caps n around ~1400 on a v5e.  This is
the large-n path: LAPACK zgehrd's panel algorithm (dlahr2 structure)
expressed as plain XLA on (re, im) pairs.

The stage is HBM-bandwidth-bound: the dominant cost is the one GEMV per
column (y = A0 v) that streams the panel-start matrix from HBM.  Two
structural choices keep the traffic at the dlahr2 level rather than the
naive one:

* the panel loop is unrolled over STATIC panel offsets, so every panel
  works on a statically-sliced trailing block A[k0:, k0:] — the per-
  column GEMV then reads (n-k0)^2 elements instead of n^2 (reflector
  columns are zero above row k0+1, and rows above k0 of Y are not needed
  until the panel ends).  Total GEMV traffic drops from ~n^3 to ~n^3/3
  elements;
* the top rows' panel contribution Y_top = A[:k0, k0:] V is computed
  once per panel as a single (k0, t) x (t, p) GEMM (MXU, one pass over
  the top slab) instead of riding every column's GEMV.

Math (per panel starting at column k0, width p, trailing size t = n-k0):
  Q_p = P_{k0} ... P_{k0+p-1} = I - V T V^H          (compact WY)
  column j of the current matrix (needed to build reflector j):
      u  = a0_j - Y (T (V^H e_j)),   Y = A0[k0:, k0:] V   (one GEMV/col)
      c  = u - V (T^H (V^H u))                      [= (Q^H A0 Q) e_j]
  panel end (all updates touch only rows/cols >= k0; columns < k0 are
  already reduced, so the left transform maps their zeros to zeros):
      A[k0:, k0:] <- M1 - V (T^H (V^H M1)),  M1 = A[k0:, k0:] - Y (T V^H)
      A[:k0, k0:] <- A[:k0, k0:] - (A[:k0, k0:] V) (T V^H)
      Q[:, k0:]   <- Q[:, k0:] - (Q[:, k0:] V) (T V^H)

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


def _panel(A, Q, k0, p, n, rdtype):
    """One panel [k0, k0+p) with STATIC k0: all work on the trailing
    (t, t) block plus one GEMM over the top slab at panel end."""
    t = n - k0
    iota_t = jnp.arange(t)
    At = (lax.slice(A[0], (k0, k0), (n, n)),
          lax.slice(A[1], (k0, k0), (n, n)))            # (t, t)
    zeros_tp = jnp.zeros((t, p), rdtype)
    V = (zeros_tp, zeros_tp)
    Y = (zeros_tp, zeros_tp)
    T = (jnp.zeros((p, p), rdtype), jnp.zeros((p, p), rdtype))

    def col_step(jj, carry):
        V, Y, T = carry
        valid = (k0 + jj) < n - 2          # tail panel may be short

        a0 = (lax.dynamic_slice(At[0], (0, jj), (t, 1)),
              lax.dynamic_slice(At[1], (0, jj), (t, 1)))
        # V^H e_j = conj(V[jj, :])^T  -> (p, 1)
        vrow = (lax.dynamic_slice(V[0], (jj, 0), (1, p)),
                lax.dynamic_slice(V[1], (jj, 0), (1, p)))
        vhe = (jnp.swapaxes(vrow[0], 0, 1), -jnp.swapaxes(vrow[1], 0, 1))
        tw = _cmm(T, vhe)                       # (p,1)
        u = _csub(a0, _cmm(Y, tw))
        vhu = _cmm(_cT(V), u)                   # (p,1)
        c = _csub(u, _cmm(V, _cmm(_cT(T), vhu)))

        # Householder from (local) rows > jj of c
        mask = (iota_t > jj).astype(rdtype)[:, None]
        xr = c[0] * mask
        xi = c[1] * mask
        sel = (iota_t == (jj + 1)).astype(rdtype)[:, None]
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

        # Y col jj = A0[k0:, k0:] v — the one (t, t) GEMV per column
        y = _cmm(At, (vr, vi))
        Y = (lax.dynamic_update_slice(Y[0], y[0], (0, jj)),
             lax.dynamic_update_slice(Y[1], y[1], (0, jj)))
        V = (lax.dynamic_update_slice(V[0], vr, (0, jj)),
             lax.dynamic_update_slice(V[1], vi, (0, jj)))
        return (V, Y, T)

    V, Y, T = lax.fori_loop(0, p, col_step, (V, Y, T))

    # trailing block: A[k0:, k0:] <- Q_p^H A0 Q_p
    TVh = _cmm(T, _cT(V))                       # (p, t)
    M1 = _csub(At, _cmm(Y, TVh))                # A0 Q_p (trailing)
    VhM = _cmm(_cT(V), M1)                      # (p, t)
    At_new = _csub(M1, _cmm(V, _cmm(_cT(T), VhM)))
    Ar = lax.dynamic_update_slice(A[0], At_new[0], (k0, k0))
    Ai = lax.dynamic_update_slice(A[1], At_new[1], (k0, k0))

    # top slab: right update only (the left transform touches rows > k0)
    if k0:
        Atop = (lax.slice(A[0], (0, k0), (k0, n)),
                lax.slice(A[1], (0, k0), (k0, n)))      # (k0, t)
        Ytop = _cmm(Atop, V)                    # (k0, p) — one GEMM
        Atop_new = _csub(Atop, _cmm(Ytop, TVh))
        Ar = lax.dynamic_update_slice(Ar, Atop_new[0], (0, k0))
        Ai = lax.dynamic_update_slice(Ai, Atop_new[1], (0, k0))

    # Q <- Q Q_p: only columns >= k0 change (V is zero above row k0+1)
    Qc = (lax.slice(Q[0], (0, k0), (n, n)),
          lax.slice(Q[1], (0, k0), (n, n)))             # (n, t)
    QV = _cmm(Qc, V)
    Qc_new = _csub(Qc, _cmm(QV, TVh))
    Qr = lax.dynamic_update_slice(Q[0], Qc_new[0], (0, k0))
    Qi = lax.dynamic_update_slice(Q[1], Qc_new[1], (0, k0))
    return (Ar, Ai), (Qr, Qi)


@functools.partial(jax.jit, static_argnames=('panel',))
def hessenberg_blocked(Ar, Ai, panel=128):
    """[n, n] split-real pair -> (Hr, Hi, Qr, Qi) with H = Q^H A Q upper
    Hessenberg, Q unitary."""
    n = Ar.shape[-1]
    rdtype = Ar.dtype
    p = min(panel, max(n - 2, 1))
    iota = jnp.arange(n)

    eyep = (jnp.eye(n, dtype=rdtype), jnp.zeros((n, n), rdtype))
    A = (Ar, Ai)
    Q = eyep
    if n > 2:
        n_panels = -(-(n - 2) // p)
        # static unroll: every panel sees a statically-sized trailing
        # block, so the bandwidth-bound GEMVs shrink as panels advance
        for ip in range(n_panels):
            A, Q = _panel(A, Q, ip * p, p, n, rdtype)

    below = iota[:, None] > iota[None, :] + 1
    Hr = jnp.where(below, 0., A[0])
    Hi = jnp.where(below, 0., A[1])
    return Hr, Hi, Q[0], Q[1]
