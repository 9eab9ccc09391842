"""Functional RCWA core: pure, jit/vmap-friendly building blocks.

Everything here is a pure function of arrays + static config, so the whole
solve can be jit-compiled, vmapped over sweep axes, and differentiated.

Structure exploitation (TPU-first; exact math, not approximation):

* All "V matrices" (transverse-E -> transverse-H maps of homogeneous media,
  reference rcwa.py:1143-1147) are 2x2 block matrices whose blocks are
  diagonal.  The reference materializes them as dense 2N x 2N matrices and
  inverts them with LAPACK (rcwa.py:1157, 1174, 1266).  Here they are kept
  as (2, 2, N) "block-diagonal" (bd) tensors: products, sums and inverses
  are O(N) elementwise 2x2 algebra instead of O(N^3).

* The single-layer boundary-matching matrix (reference rcwa.py:1266-1268)
  has the symmetric form Ctmp = [[A, B@phi], [B@phi, A]] because the layer
  is referenced to free space on both sides.  Its inverse decomposes into
  two half-size inverses:  with M± = inv(A ± B@phi),
      inv(Ctmp) = 0.5 * [[M+ + M-, M+ - M-], [M+ - M-, M+ + M-]],
  so  Cf = 2*inv(Ctmp)[:, :2N] = [G; D]  and  Cb = [D; G]  with
  G = M+ + M-, D = M+ - M-.  It follows that S11 == S22 and S21 == S12
  (a symmetric layer), which the reference computes redundantly
  (rcwa.py:1276-1281).  We compute each once.
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .ops import fourier
from .ops.eig import eig

__all__ = [
    'bd_mul', 'bd_inv', 'bd_add', 'bd_sub', 'bd_apply', 'bd_dense',
    'bd_scale_cols', 'vmat', 'kvectors_1d', 'kz_conj_branch',
    'interface_smatrix_in', 'interface_smatrix_out',
    'pq_matrices', 'pq_homogeneous_bd', 'homogeneous_kz',
    'eigen_decomposition', 'layer_smatrix', 'layer_smatrix_homogeneous',
    'redheffer_product', 'redheffer_update_modes',
    'LayerSolution', 'matching_indices',
]


# ---------------------------------------------------------------------------
# Block-2x2-diagonal ("bd") algebra.  A bd tensor has shape (2, 2, N) and
# represents the 2N x 2N matrix  [[diag(a[0,0]), diag(a[0,1])],
#                                 [diag(a[1,0]), diag(a[1,1])]].
# ---------------------------------------------------------------------------

def bd_mul(a, b):
    """Product of two bd matrices."""
    return jnp.einsum('abn,bcn->acn', a, b)


def bd_inv(a):
    """Inverse of a bd matrix via the analytic 2x2 formula."""
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    row0 = jnp.stack([a[1, 1], -a[0, 1]])
    row1 = jnp.stack([-a[1, 0], a[0, 0]])
    return jnp.stack([row0, row1]) / det


def bd_add(a, b):
    return a + b


def bd_sub(a, b):
    return a - b


def bd_apply(a, x):
    """bd (2,2,N) applied to dense [2N, M] (or [2N] vector)."""
    n = a.shape[-1]
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    xt, xb = x[:n], x[n:]
    top = a[0, 0][:, None] * xt + a[0, 1][:, None] * xb
    bot = a[1, 0][:, None] * xt + a[1, 1][:, None] * xb
    out = jnp.concatenate([top, bot], axis=0)
    return out[:, 0] if squeeze else out


def bd_apply_right(x, a):
    """Dense [M, 2N] times bd (2,2,N)."""
    n = a.shape[-1]
    xl, xr = x[:, :n], x[:, n:]
    left = xl * a[0, 0][None, :] + xr * a[1, 0][None, :]
    right = xl * a[0, 1][None, :] + xr * a[1, 1][None, :]
    return jnp.concatenate([left, right], axis=1)


def bd_scale_cols(a, s):
    """bd times diag(s) where s is a length-2N vector (column scaling)."""
    n = a.shape[-1]
    st, sb = s[:n], s[n:]
    return jnp.stack([
        jnp.stack([a[0, 0] * st, a[0, 1] * sb]),
        jnp.stack([a[1, 0] * st, a[1, 1] * sb]),
    ])


def bd_dense(a):
    """Materialize a bd matrix as dense [2N, 2N]."""
    n = a.shape[-1]
    z = jnp.zeros((2 * n, 2 * n), a.dtype)
    idx = jnp.arange(n)
    z = z.at[idx, idx].set(a[0, 0])
    z = z.at[idx, idx + n].set(a[0, 1])
    z = z.at[idx + n, idx].set(a[1, 0])
    z = z.at[idx + n, idx + n].set(a[1, 1])
    return z


def bd_eye(n, dtype):
    one = jnp.ones((n,), dtype)
    zero = jnp.zeros((n,), dtype)
    return jnp.stack([jnp.stack([one, zero]), jnp.stack([zero, one])])


# ---------------------------------------------------------------------------
# k-vectors and V matrices
# ---------------------------------------------------------------------------

def kvectors_1d(kx0, ky0, order, Gx_norm, Gy_norm, dtype):
    """Per-order transverse wave-vector grids, flattened x-major.

    Mirrors rcwa.py:1133-1139.  Returns (Kx_dn, Ky_dn), each (N,) complex.
    """
    ox = jnp.arange(-order[0], order[0] + 1, dtype=dtype)
    oy = jnp.arange(-order[1], order[1] + 1, dtype=dtype)
    kx = kx0 + ox * Gx_norm
    ky = ky0 + oy * Gy_norm
    kxg, kyg = jnp.meshgrid(kx, ky, indexing='ij')
    return kxg.reshape(-1), kyg.reshape(-1)


def kz_conj_branch(eps_mu, kx, ky):
    """kz = sqrt(eps*mu - kx^2 - ky^2) with the Im(kz) >= 0 branch fix
    applied by conjugation (rcwa.py:1143-1144, 1151-1152, 1217-1218)."""
    kz = jnp.sqrt(eps_mu - kx ** 2 - ky ** 2)
    return jnp.where(jnp.imag(kz) < 0, jnp.conj(kz), kz)


def vmat(kx, ky, kz):
    """E->H map of a homogeneous medium as a bd tensor.

    Dense layout per rcwa.py:1145-1147:
        V = [[-Ky Kx / Kz,      -Kz - Ky^2 / Kz],
             [ Kz + Kx^2 / Kz,   Kx Ky / Kz    ]]
    """
    return jnp.stack([
        jnp.stack([-ky * kx / kz, -kz - ky ** 2 / kz]),
        jnp.stack([kz + kx ** 2 / kz, kx * ky / kz]),
    ])


def interface_smatrix_in(Vf, Vi):
    """Input-cladding interface S-matrix (rcwa.py:1157-1164), as bd blocks.

    Returns [S11, S21, S12, S22] each a (2,2,N) bd tensor.
    """
    t1 = bd_inv(bd_add(Vf, Vi))
    t2 = bd_sub(Vf, Vi)
    return [2 * bd_mul(t1, Vi), -bd_mul(t1, t2), bd_mul(t1, t2), 2 * bd_mul(t1, Vf)]


def interface_smatrix_out(Vf, Vo):
    """Output-cladding interface S-matrix (rcwa.py:1174-1181), as bd blocks."""
    t1 = bd_inv(bd_add(Vf, Vo))
    t2 = bd_sub(Vf, Vo)
    return [2 * bd_mul(t1, Vf), bd_mul(t1, t2), -bd_mul(t1, t2), 2 * bd_mul(t1, Vo)]


# ---------------------------------------------------------------------------
# Layer eigenmodes
# ---------------------------------------------------------------------------

def pq_matrices(eps_conv, mu_conv, kx, ky):
    """Wave matrices P (H->E) and Q (E->H) for a patterned layer.

    Dense equivalents of rcwa.py:1226-1232.  The reference forms
    [Kx; Ky] @ inv(eps_conv) @ [Ky, -Kx] with dense diagonal K matrices;
    since K are diagonal this is pure row/column scaling of inv(eps_conv),
    which is what we do (exact same matrix, O(N^2) instead of O(N^3)).
    """
    einv = jnp.linalg.inv(eps_conv)
    minv = jnp.linalg.inv(mu_conv)
    kxc, kxr = kx[:, None], kx[None, :]
    kyc, kyr = ky[:, None], ky[None, :]

    # constant part: hstack(vstack(0, -mu), vstack(mu, 0)) = [[0, mu], [-mu, 0]]
    p00 = kxc * einv * kyr
    p01 = mu_conv - kxc * einv * kxr
    p10 = -mu_conv + kyc * einv * kyr
    p11 = -(kyc * einv * kxr)
    P = jnp.block([[p00, p01], [p10, p11]])

    # constant part: hstack(vstack(0, eps), vstack(-eps, 0)) = [[0, -eps], [eps, 0]]
    q00 = -(kxc * minv * kyr)
    q01 = -eps_conv + kxc * minv * kxr
    q10 = eps_conv - kyc * minv * kyr
    q11 = kyc * minv * kxr
    Q = jnp.block([[q00, q01], [q10, q11]])
    return P, Q


def pq_homogeneous_bd(eps, mu, kx, ky, dtype):
    """P and Q of a homogeneous layer as bd tensors (rcwa.py:1208-1214).

    For scalar eps/mu the conv matrices are eps*I / mu*I, so every block of
    P and Q is diagonal — the dense 2N x 2N matrices the reference builds
    are bd.  Returns (P_bd, Q_bd).
    """
    eps = jnp.asarray(eps, dtype)
    mu = jnp.asarray(mu, dtype)
    P = jnp.stack([
        jnp.stack([kx * ky / eps, mu - kx * kx / eps]),
        jnp.stack([-mu + ky * ky / eps, -ky * kx / eps]),
    ])
    Q = jnp.stack([
        jnp.stack([-kx * ky / mu, -eps + kx * kx / mu]),
        jnp.stack([eps - ky * ky / mu, ky * kx / mu]),
    ])
    return P, Q


def homogeneous_kz(eps, mu, kx, ky):
    """kz of a homogeneous layer, duplicated over both polarization blocks
    (rcwa.py:1217-1219)."""
    kz = kz_conj_branch(eps * mu, kx, ky)
    return jnp.concatenate([kz, kz])


def eigen_decomposition(P, Q, broadening, backend, stable_grad=True):
    """Eigenmodes of a patterned layer (rcwa.py:1235-1241).

    Solves eig(P @ Q); kz = sqrt(lambda) with the Im(kz) >= 0 branch chosen
    by sign flip (note: sign flip, not conjugation — rcwa.py:1241).
    """
    if stable_grad:
        lam, E = eig(P @ Q, broadening, backend)
    else:
        lam, E = eig(P @ Q, 0.0, backend)
    kz = jnp.sqrt(lam)
    kz = jnp.where(jnp.imag(kz) < 0, -kz, kz)
    return kz, E


# ---------------------------------------------------------------------------
# Single-layer S-matrix
# ---------------------------------------------------------------------------

class LayerSolution(NamedTuple):
    """Everything solve/field-reconstruction needs about one layer.

    S11/S21 are the layer S-matrix blocks (S22 == S11, S12 == S21 by the
    free-space-referenced symmetry, see module docstring).  G/D are the
    mode-coupling blocks: Cf = [G; D], Cb = [D; G] in the reference's
    notation (rcwa.py:1271-1274).
    """
    S11: jnp.ndarray
    S21: jnp.ndarray
    G: jnp.ndarray
    D: jnp.ndarray
    kz: jnp.ndarray        # (2N,) eigenmode kz
    E_eigvec: jnp.ndarray  # [2N, 2N] (or bd identity marker for homogeneous)
    H_eigvec: jnp.ndarray  # [2N, 2N]


def layer_smatrix(E, kz, P, Q, Vf, omega, thickness,
                  avoid_pinv_instability=False, max_pinv_instability=0.005):
    """Layer S-matrix referenced to free space (rcwa.py:1244-1281).

    Args:
      E: [2N, 2N] E-field eigenvectors.  kz: (2N,).
      P, Q: wave matrices.  Vf: free-space V as bd.
      omega, thickness: scalars.

    Returns (LayerSolution, instability) where instability is
    (pinv_metric, qinv_metric) if avoid_pinv_instability else None.
    """
    n2 = E.shape[-1]
    dtype = E.dtype
    phase = jnp.exp(1j * omega * kz * thickness)  # (2N,)

    instability = None
    if avoid_pinv_instability:
        # Reference computes explicit inverses and an instability metric,
        # then switches to the Q-based H-eigvec formula if P is too
        # ill-conditioned (rcwa.py:1249-1262).
        Pinv = jnp.linalg.inv(P)
        eye = jnp.eye(n2, dtype=dtype)
        p_ins = jnp.maximum(jnp.max(jnp.abs(P @ Pinv - eye)),
                            jnp.max(jnp.abs(Pinv @ P - eye)))
        Qinv = jnp.linalg.inv(Q)
        q_ins = jnp.max(jnp.abs(Q @ Qinv - eye))
        H_p = Pinv @ (E * kz[None, :])
        H_q = Q @ (E / kz[None, :])
        H = jnp.where(p_ins < max_pinv_instability, H_p, H_q)
        instability = (jax.lax.stop_gradient(p_ins), jax.lax.stop_gradient(q_ins))
    else:
        # H = P^-1 E Kz (rcwa.py:1248,1264) via a solve.
        H = jnp.linalg.solve(P, E * kz[None, :])

    W = bd_apply(bd_inv(Vf), H)          # Vf^-1 H
    A = E + W
    B = E - W
    Bphi = B * phase[None, :]
    Mp = jnp.linalg.inv(A + Bphi)
    Mm = jnp.linalg.inv(A - Bphi)
    G = Mp + Mm
    D = Mp - Mm

    Ephi = E * phase[None, :]
    S11 = Ephi @ G + E @ D
    S21 = E @ G + Ephi @ D - jnp.eye(n2, dtype=dtype)

    return LayerSolution(S11=S11, S21=S21, G=G, D=D, kz=kz,
                         E_eigvec=E, H_eigvec=H), instability


def layer_smatrix_homogeneous(eps, mu, kx, ky, Vf, omega, thickness, dtype):
    """Homogeneous-layer S-matrix, entirely in bd algebra (O(N)).

    Follows the same math as :func:`layer_smatrix` with E = I and P, Q bd
    (reference computes this densely: rcwa.py:1206-1222 + 1244-1281).
    Returns a LayerSolution whose matrices are bd tensors.
    """
    n = kx.shape[0]
    P, _Q = pq_homogeneous_bd(eps, mu, kx, ky, dtype)
    kz = homogeneous_kz(jnp.asarray(eps, dtype), jnp.asarray(mu, dtype), kx, ky)
    phase = jnp.exp(1j * omega * kz * thickness)

    E = bd_eye(n, dtype)
    # H = P^-1 E Kz; E = I so this is P^-1 column-scaled by kz.
    H = bd_scale_cols(bd_inv(P), kz)
    W = bd_mul(bd_inv(Vf), H)
    A = bd_add(E, W)
    B = bd_sub(E, W)
    Bphi = bd_scale_cols(B, phase)
    Mp = bd_inv(bd_add(A, Bphi))
    Mm = bd_inv(bd_sub(A, Bphi))
    G = bd_add(Mp, Mm)
    D = bd_sub(Mp, Mm)

    Ephi = bd_scale_cols(E, phase)
    S11 = bd_add(bd_mul(Ephi, G), bd_mul(E, D))
    S21 = bd_sub(bd_add(bd_mul(E, G), bd_mul(Ephi, D)), bd_eye(n, dtype))

    return LayerSolution(S11=S11, S21=S21, G=G, D=D, kz=kz,
                         E_eigvec=E, H_eigvec=H)


# ---------------------------------------------------------------------------
# Redheffer star product
# ---------------------------------------------------------------------------

def redheffer_product(Sm, Sn):
    """Star product of two S-matrices [S11, S21, S12, S22] (rcwa.py:1287-1294).

    Returns the combined S plus the two resolvent factors
    (t1 = inv(I - S12m S21n), t2 = inv(I - S21n S12m)) needed for the
    mode-coupling updates.
    """
    S11m, S21m, S12m, S22m = Sm
    S11n, S21n, S12n, S22n = Sn
    n2 = S11m.shape[-1]
    eye = jnp.eye(n2, dtype=S11m.dtype)
    t1 = jnp.linalg.inv(eye - S12m @ S21n)
    t2 = jnp.linalg.inv(eye - S21n @ S12m)
    S11 = S11n @ (t1 @ S11m)
    S21 = S21m + S22m @ (t2 @ (S21n @ S11m))
    S12 = S12n + S11n @ (t1 @ (S12m @ S22n))
    S22 = S22m @ (t2 @ S22n)
    return [S11, S21, S12, S22], t1, t2


def redheffer_update_modes(Cm_list, Cn_list, Sm, Sn, t1, t2):
    """Propagate per-layer mode-coupling matrices through a star product.

    Mirrors rcwa.py:1296-1304.  Each C is a [4N, 2N] matrix split as
    (Cf, Cb) stacked: C = [Cf_rows; Cb_rows]?  No — the reference keeps two
    *lists* Cf (forward) and Cb (backward), each [4N, 2N].  Here each entry
    of the lists is the (Cf, Cb) tuple for one layer.
    """
    S11m, S21m, S12m, S22m = Sm
    S11n, S21n, S12n, S22n = Sn
    out = []
    zm = t2 @ (S21n @ S11m)
    zt = t2 @ S22n
    for (cf, cb) in Cm_list:
        out.append((cf + cb @ zm, cb @ zt))
    z1 = t1 @ S11m
    z2 = t1 @ (S12m @ S22n)
    for (cf, cb) in Cn_list:
        out.append((cf @ z1, cb + cf @ z2))
    return out


# ---------------------------------------------------------------------------
# Order bookkeeping
# ---------------------------------------------------------------------------

def matching_indices(orders, order):
    """Clamp requested (m, n) orders into range and flatten to indices.

    Functional version of rcwa.py:1115-1122 (the reference clamps its input
    array in place; we do not reproduce that side effect).
    """
    orders = np.asarray(orders, dtype=np.int64).reshape(-1, 2)
    m = np.clip(orders[:, 0], -order[0], order[0])
    n = np.clip(orders[:, 1], -order[1], order[1])
    return (2 * order[1] + 1) * (m + order[0]) + (n + order[1])
