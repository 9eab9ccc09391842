"""TPU-native general complex eigendecomposition.

JAX has no on-device lowering for ``jnp.linalg.eig`` on TPU (it is
CPU-LAPACK only), yet the dense non-Hermitian eigendecomposition of the
wave-propagation matrix P@Q is RCWA's hot kernel (reference
/root/reference/torcwa/rcwa.py:1236 dispatches to cuSOLVER/MAGMA).  This
module implements the classic dense route entirely in JAX primitives that
lower to TPU:

  1. Hessenberg reduction by Householder reflectors
     (``lax.fori_loop``, masked static shapes);
  2. implicitly single-shifted QR iteration with Wilkinson shifts,
     vectorized Givens sweeps, and deflation bookkeeping under
     ``lax.while_loop`` (complex arithmetic: no double-shift needed);
  3. eigenvectors by back-substitution on the converged triangular Schur
     factor (one vmapped triangular solve), transformed back through the
     accumulated unitary.

Everything is jit/vmap-compatible: batched inputs [..., n, n] are handled
by vmapping the single-matrix kernel, which is how sweeps batch the
per-layer eig across wavelengths on TPU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ['eig_qr', 'hessenberg', 'schur_qr', 'eig_tri_vectors']


def _eps_of(dtype):
    return {np.dtype(np.complex64): 1.1920929e-07,
            np.dtype(np.complex128): 2.220446049250313e-16}[np.dtype(dtype)]


def _smlnum_of(dtype):
    return {np.dtype(np.complex64): 1.1754944e-38 / 1.1920929e-07,
            np.dtype(np.complex128): 2.2250738585072014e-308 / 2.22e-16}[np.dtype(dtype)]


# ---------------------------------------------------------------------------
# Hessenberg reduction
# ---------------------------------------------------------------------------

def hessenberg(A):
    """Reduce A to upper Hessenberg form: A = Q H Q^H.

    Returns (H, Q).  Unblocked Householder; each of the n-2 steps is a
    masked full-width rank-1/rank-2 update (O(n^2) vector work on the VPU,
    O(n^3) total).
    """
    n = A.shape[-1]
    dtype = A.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    if n <= 2:
        return A, jnp.eye(n, dtype=dtype)

    idx = jnp.arange(n)

    def step(k, HQ):
        H, Q = HQ
        # Householder vector zeroing H[k+2:, k], acting on rows k+1..n-1.
        col = H[:, k]
        mask = (idx > k).astype(rdtype)          # rows k+1..n-1
        x = col * mask
        alpha = H[k + 1, k]
        xnorm = jnp.sqrt(jnp.sum(jnp.abs(x) ** 2))
        aabs = jnp.abs(alpha)
        phase = jnp.where(aabs > 0, alpha / jnp.where(aabs > 0, aabs, 1.), 1. + 0.j)
        v = x.at[k + 1].add(phase * xnorm)
        vnorm2 = jnp.sum(jnp.abs(v) ** 2)
        beta = jnp.where(vnorm2 > 0, 2. / jnp.where(vnorm2 > 0, vnorm2, 1.), 0.)
        beta = beta.astype(dtype)

        # H <- (I - beta v v^H) H (left), then H <- H (I - beta v v^H) (right)
        w = beta * (jnp.conj(v) @ H)             # (n,)
        H = H - v[:, None] * w[None, :]
        u = beta * (H @ v)                        # (n,)
        H = H - u[:, None] * jnp.conj(v)[None, :]
        # Accumulate Q <- Q (I - beta v v^H)
        uq = beta * (Q @ v)
        Q = Q - uq[:, None] * jnp.conj(v)[None, :]
        return (H, Q)

    H, Q = lax.fori_loop(0, n - 2, step, (A, jnp.eye(n, dtype=dtype)))
    # Clean below-subdiagonal entries (they are numerically ~0).
    row = idx[:, None]
    colm = idx[None, :]
    H = jnp.where(row > colm + 1, 0., H)
    return H, Q


# ---------------------------------------------------------------------------
# Shifted QR iteration on a Hessenberg matrix
# ---------------------------------------------------------------------------

def _givens(f, g, dtype):
    """zlartg-style rotation: returns (c real, s complex) with
    [[c, s], [-conj(s), c]] @ [f, g] = [r, 0]."""
    rdtype = jnp.zeros((), dtype).real.dtype
    af, ag = jnp.abs(f), jnp.abs(g)
    d = jnp.sqrt(af ** 2 + ag ** 2)
    safe_d = jnp.where(d > 0, d, 1.)
    safe_af = jnp.where(af > 0, af, 1.)
    sgn_f = jnp.where(af > 0, f / safe_af, 1. + 0.j)
    c = jnp.where(d > 0, af / safe_d, jnp.asarray(1., rdtype))
    s = jnp.where(d > 0, sgn_f * jnp.conj(g) / safe_d, 0. + 0.j)
    # f == 0, g != 0: swap rotation
    c = jnp.where((af == 0) & (ag > 0), 0., c)
    s = jnp.where((af == 0) & (ag > 0), 1. + 0.j, s)
    return c.astype(rdtype), s.astype(dtype)


def _wilkinson_shift(a, b, c, d):
    """Eigenvalue of [[a, b], [c, d]] closest to d."""
    tr = a + d
    det = a * d - b * c
    disc = jnp.sqrt(tr * tr - 4 * det)
    l1 = (tr + disc) / 2
    l2 = (tr - disc) / 2
    return jnp.where(jnp.abs(l1 - d) < jnp.abs(l2 - d), l1, l2)


def schur_qr(H, Q, max_iter_factor=40):
    """Complex Schur form of an upper-Hessenberg H: H = Z T Z^H.

    Args:
      H: [n, n] upper Hessenberg.
      Q: [n, n] unitary accumulated so far (from the Hessenberg reduction);
         rotations are accumulated onto it so the returned Z maps back to
         the original matrix.

    Returns (T, Z) with T upper triangular.
    """
    n = H.shape[-1]
    dtype = H.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    eps = jnp.asarray(_eps_of(dtype), rdtype)
    smlnum = jnp.asarray(_smlnum_of(dtype), rdtype)
    if n == 1:
        return H, Q
    idx = jnp.arange(n)
    max_iters = max_iter_factor * n

    def subdiag(H):
        return jnp.concatenate([jnp.diagonal(H, -1), jnp.zeros((1,), dtype)])

    def deflate(H):
        """Zero negligible subdiagonals (vectorized)."""
        d = jnp.abs(jnp.diagonal(H))
        thresh = eps * (d + jnp.concatenate([d[1:], d[-1:]]))
        thresh = jnp.maximum(thresh, smlnum)
        sub = jnp.diagonal(H, -1)
        keep = jnp.abs(sub) > thresh[:-1]
        row = idx[:, None]
        col = idx[None, :]
        on_sub = row == col + 1
        keep_full = jnp.concatenate([keep, jnp.zeros((1,), bool)])[col]
        return jnp.where(on_sub & ~keep_full, 0., H)

    def active_window(H, hi):
        """(lo, hi) of the active trailing unreduced block."""
        sub = jnp.abs(subdiag(H))  # sub[k] couples rows k, k+1 (last is 0)
        # shrink hi while the subdiagonal below it vanishes
        alive = sub > 0
        # hi_new = largest j <= hi with alive[j-1]; if none, 0
        def shrink(hi):
            def cond(h):
                return (h > 0) & ~alive[h - 1]
            def body(h):
                return h - 1
            return lax.while_loop(cond, body, hi)
        hi = shrink(hi)
        # lo = smallest k <= hi such that sub[lo-1] == 0 (block start)
        cand = jnp.where((idx <= hi) & jnp.concatenate(
            [jnp.ones((1,), bool), ~alive[:-1]]), idx, 0)
        lo = jnp.max(cand)
        return lo, hi

    def sweep(H, Z, lo, hi, sigma):
        """One implicit single-shift QR sweep on rows/cols [lo, hi]."""
        x0 = H[lo, lo] - sigma
        y0 = H[lo + 1, lo] if n > 1 else jnp.asarray(0., dtype)

        def body(k, state):
            H, Z, x, y = state
            active = (k >= lo) & (k < hi)
            c, s = _givens(x, y, dtype)
            c = jnp.where(active, c, 1.)
            s = jnp.where(active, s, 0.)
            cc = c.astype(dtype)

            # left rotation on rows k, k+1
            rk = H[k, :]
            rk1 = H[k + 1, :]
            new_rk = cc * rk + s * rk1
            new_rk1 = -jnp.conj(s) * rk + cc * rk1
            H = H.at[k, :].set(new_rk).at[k + 1, :].set(new_rk1)

            # right rotation on cols k, k+1 (by the adjoint)
            ck = H[:, k]
            ck1 = H[:, k + 1]
            new_ck = cc * ck + jnp.conj(s) * ck1
            new_ck1 = -s * ck + cc * ck1
            H = H.at[:, k].set(new_ck).at[:, k + 1].set(new_ck1)

            # The left rotation annihilated the bulge at (k+1, k-1) in exact
            # arithmetic; store the exact zero (LAPACK zlahqr does the same).
            # Otherwise eps-size junk below the subdiagonal is recycled into
            # the subdiagonal by later column rotations and convergence
            # plateaus ~100x above the deflation threshold.
            km1 = jnp.maximum(k - 1, 0)
            H = H.at[k + 1, km1].set(
                jnp.where(active & (k > lo), 0. + 0.j, H[k + 1, km1]))

            zk = Z[:, k]
            zk1 = Z[:, k + 1]
            Z = Z.at[:, k].set(cc * zk + jnp.conj(s) * zk1)
            Z = Z.at[:, k + 1].set(-s * zk + cc * zk1)

            # next bulge element
            nxt_ok = k + 2 <= hi
            x_n = H[k + 1, k]
            y_n = jnp.where(nxt_ok, H[jnp.minimum(k + 2, n - 1), k], 0.)
            x = jnp.where(active, x_n, x)
            y = jnp.where(active, y_n, y)
            return (H, Z, x, y)

        H, Z, _, _ = lax.fori_loop(0, n - 1, body, (H, Z, x0, y0))
        return H, Z

    def cond(state):
        H, Z, hi, it = state
        return (hi > 0) & (it < max_iters)

    def body(state):
        H, Z, hi, it = state
        H = deflate(H)
        lo, hi = active_window(H, hi)

        def do_sweep(args):
            H, Z = args
            # Wilkinson shift from the trailing 2x2 of the active block
            a = H[hi - 1, hi - 1]
            b = H[hi - 1, hi]
            c2 = H[hi, hi - 1]
            d = H[hi, hi]
            sigma = _wilkinson_shift(a, b, c2, d)
            # exceptional shift every 12 stalled iterations
            exc = (it % 13 == 12)
            sigma = jnp.where(exc, d + jnp.abs(c2).astype(dtype) * (0.75 + 0.j),
                              sigma)
            return sweep(H, Z, lo, hi, sigma)

        H, Z = lax.cond(hi > 0, do_sweep, lambda args: args, (H, Z))
        return (H, Z, hi, it + 1)

    T, Z, hi, _ = lax.while_loop(cond, body, (H, Q, n - 1, 0))
    T = deflate(T)
    # final clean: force strictly-lower to zero
    row = idx[:, None]
    col = idx[None, :]
    T = jnp.where(row > col, 0., T)
    return T, Z


# ---------------------------------------------------------------------------
# Eigenvectors of the triangular factor
# ---------------------------------------------------------------------------

def eig_tri_vectors(T, Z):
    """Right eigenvectors from the Schur form (T upper triangular).

    For each eigenvalue lambda_i = T[i,i], back-substitute
    (T[:i,:i] - lambda_i) y = -T[:i,i]; eigvec = Z @ [y; 1; 0...], then
    normalize to unit 2-norm (matching LAPACK/torch conventions up to
    phase).  Vectorized as one vmapped triangular solve.
    """
    n = T.shape[-1]
    dtype = T.dtype
    rdtype = jnp.zeros((), dtype).real.dtype
    idx = jnp.arange(n)
    eps = _eps_of(dtype)
    tnorm = jnp.max(jnp.sum(jnp.abs(T), axis=0))

    def one_vec(i):
        lam = T[i, i]
        row = idx[:, None]
        col = idx[None, :]
        # rows >= i replaced by identity rows; columns >= i zeroed in the
        # strict upper part (their contribution is moved to the rhs b)
        ident = (row == col).astype(dtype)
        body = jnp.where(col >= i, 0., T - lam * jnp.eye(n, dtype=dtype))
        B = jnp.where(row >= i, ident, body)
        # guard near-singular pivots (degenerate eigenvalues), LAPACK-style
        d = jnp.diagonal(B)
        dmin = jnp.maximum(eps * jnp.abs(lam), eps * tnorm)
        dmin = jnp.maximum(dmin, jnp.asarray(_smlnum_of(dtype), rdtype))
        absd = jnp.abs(d)
        safe = jnp.where(absd < dmin,
                         jnp.where(absd > 0, d * (dmin / jnp.where(absd > 0, absd, 1.)),
                                   dmin.astype(dtype)),
                         d)
        B = B - jnp.diag(d) + jnp.diag(safe)
        b = jnp.where(idx < i, -T[:, i], 0.)
        b = b.at[i].set(1.)
        y = jax.scipy.linalg.solve_triangular(B, b, lower=False)
        return y

    Y = jax.vmap(one_vec, out_axes=1)(idx)   # [n, n] columns
    X = Z @ Y
    nrm = jnp.sqrt(jnp.sum(jnp.abs(X) ** 2, axis=0))
    X = X / jnp.where(nrm > 0, nrm, 1.)[None, :]
    return X


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=())
def _eig_qr_single(A):
    H, Q = hessenberg(A)
    T, Z = schur_qr(H, Q)
    w = jnp.diagonal(T)
    V = eig_tri_vectors(T, Z)
    return w, V


def eig_qr(A):
    """Batched general complex eig: A [..., n, n] -> (w [..., n], V [..., n, n])."""
    A = jnp.asarray(A)
    if A.ndim == 2:
        return _eig_qr_single(A)
    batch_shape = A.shape[:-2]
    n = A.shape[-1]
    flat = A.reshape((-1, n, n))
    w, V = jax.vmap(_eig_qr_single)(flat)
    return w.reshape(batch_shape + (n,)), V.reshape(batch_shape + (n, n))
