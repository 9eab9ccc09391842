"""Functional RCWA core: pure, jit/vmap-friendly building blocks, split-real.

Everything here is a pure function of arrays + static config, so the whole
solve can be jit-compiled, vmapped over sweep axes, and differentiated.

All complex quantities are carried as (re, im) float pairs ("cpairs", see
ops/cplx.py).  This is the TPU-native layout — the runtime here does not
lower complex arrays (loop carries, scatters, even transfers), and split
real matmuls hit the MXU directly — and it is exactly equivalent math on
CPU, where the golden-parity suite runs in float64 pairs.

Structure exploitation (TPU-first; exact math, not approximation):

* All "V matrices" (transverse-E -> transverse-H maps of homogeneous media,
  reference rcwa.py:1143-1147) are 2x2 block matrices whose blocks are
  diagonal.  The reference materializes them as dense 2N x 2N matrices and
  inverts them with LAPACK (rcwa.py:1157, 1174, 1266).  Here they are kept
  as bdp tensors — pairs of (2, 2, N) arrays — so products, sums and
  inverses are O(N) elementwise 2x2 algebra instead of O(N^3).

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

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .ops import cplx
from .ops.cplx import (cadd, csub, cneg, cmul, cdiv_raw, cdivide, cmm,
                       csqrt, cwhere, scale_cols, ceye)
from .ops.eig import eig_pair

__all__ = [
    'bdp_mul', 'bdp_inv', 'bdp_apply', 'bdp_apply_right', 'bdp_dense',
    'bdp_eye', 'bdp_scale_cols', 'vmat', 'kz_conj_branch',
    'interface_smatrix_in', 'interface_smatrix_out',
    'pq_matrices', 'pq_homogeneous_bdp', 'homogeneous_kz',
    'eigen_decomposition', 'layer_smatrix', 'layer_smatrix_homogeneous',
    'redheffer_product', 'redheffer_update_modes',
    'LayerSolution', 'matching_indices',
]


# ---------------------------------------------------------------------------
# Block-2x2-diagonal pair ("bdp") algebra.  A bdp is a cpair of (2, 2, N)
# arrays representing the complex 2N x 2N matrix
#   [[diag(a[0,0]), diag(a[0,1])], [diag(a[1,0]), diag(a[1,1])]].
# ---------------------------------------------------------------------------

def bdp_mul(a, b):
    f = lambda x, y: jnp.einsum('abn,bcn->acn', x, y)
    return (f(a[0], b[0]) - f(a[1], b[1]), f(a[0], b[1]) + f(a[1], b[0]))


def bdp_inv(a):
    """Inverse via the analytic 2x2 formula.  Division is unguarded so a
    singular block (Wood anomaly) surfaces as inf/nan, like the reference's
    dense LAPACK inverse would."""
    det = csub(cmul((a[0][0, 0], a[1][0, 0]), (a[0][1, 1], a[1][1, 1])),
               cmul((a[0][0, 1], a[1][0, 1]), (a[0][1, 0], a[1][1, 0])))
    out_r = jnp.stack([jnp.stack([a[0][1, 1], -a[0][0, 1]]),
                       jnp.stack([-a[0][1, 0], a[0][0, 0]])])
    out_i = jnp.stack([jnp.stack([a[1][1, 1], -a[1][0, 1]]),
                       jnp.stack([-a[1][1, 0], a[1][0, 0]])])
    return cdiv_raw((out_r, out_i), (det[0][None, None], det[1][None, None]))


def bdp_apply(a, x):
    """bdp (2,2,N) applied to dense cpair [2N, M] (or [2N] vector)."""
    def app(ar, xr):
        n = ar.shape[-1]
        squeeze = xr.ndim == 1
        if squeeze:
            xr = xr[:, None]
        xt, xb = xr[:n], xr[n:]
        top = ar[0, 0][:, None] * xt + ar[0, 1][:, None] * xb
        bot = ar[1, 0][:, None] * xt + ar[1, 1][:, None] * xb
        out = jnp.concatenate([top, bot], axis=0)
        return out[:, 0] if squeeze else out
    return (app(a[0], x[0]) - app(a[1], x[1]),
            app(a[0], x[1]) + app(a[1], x[0]))


def bdp_apply_right(x, a):
    """Dense cpair [M, 2N] times bdp."""
    def app(xr, ar):
        n = ar.shape[-1]
        xl, xr_ = xr[:, :n], xr[:, n:]
        left = xl * ar[0, 0][None, :] + xr_ * ar[1, 0][None, :]
        right = xl * ar[0, 1][None, :] + xr_ * ar[1, 1][None, :]
        return jnp.concatenate([left, right], axis=1)
    return (app(x[0], a[0]) - app(x[1], a[1]),
            app(x[0], a[1]) + app(x[1], a[0]))


def bdp_scale_cols(a, s):
    """bdp times diag(s) for a cpair vector s of length 2N."""
    n = a[0].shape[-1]
    st = (s[0][:n], s[1][:n])
    sb = (s[0][n:], s[1][n:])
    c00 = cmul((a[0][0, 0], a[1][0, 0]), st)
    c01 = cmul((a[0][0, 1], a[1][0, 1]), sb)
    c10 = cmul((a[0][1, 0], a[1][1, 0]), st)
    c11 = cmul((a[0][1, 1], a[1][1, 1]), sb)
    return (jnp.stack([jnp.stack([c00[0], c01[0]]),
                       jnp.stack([c10[0], c11[0]])]),
            jnp.stack([jnp.stack([c00[1], c01[1]]),
                       jnp.stack([c10[1], c11[1]])]))


def bdp_dense(a):
    """Materialize a bdp as a dense cpair [2N, 2N]."""
    n = a[0].shape[-1]
    def dense(ar):
        z = jnp.zeros((2 * n, 2 * n), ar.dtype)
        idx = jnp.arange(n)
        z = z.at[idx, idx].set(ar[0, 0])
        z = z.at[idx, idx + n].set(ar[0, 1])
        z = z.at[idx + n, idx].set(ar[1, 0])
        z = z.at[idx + n, idx + n].set(ar[1, 1])
        return z
    return dense(a[0]), dense(a[1])


def bdp_eye(n, rdtype):
    one = jnp.ones((n,), rdtype)
    zero = jnp.zeros((n,), rdtype)
    re = jnp.stack([jnp.stack([one, zero]), jnp.stack([zero, one])])
    return re, jnp.zeros_like(re)


# ---------------------------------------------------------------------------
# k-vectors and V matrices
# ---------------------------------------------------------------------------

def kz_conj_branch(eps_mu, kx, ky):
    """kz = sqrt(eps*mu - kx^2 - ky^2) with the Im(kz) >= 0 branch fix
    applied by conjugation (rcwa.py:1143-1144, 1151-1152, 1217-1218).
    All arguments and the result are cpairs."""
    kz = csqrt(csub(eps_mu, cadd(cmul(kx, kx), cmul(ky, ky))))
    return kz[0], jnp.abs(kz[1])  # conj-if-Im<0 == abs on the imag part


def vmat(kx, ky, kz):
    """E->H map of a homogeneous medium as a bdp.

    Dense layout per rcwa.py:1145-1147:
        V = [[-Ky Kx / Kz,      -Kz - Ky^2 / Kz],
             [ Kz + Kx^2 / Kz,   Kx Ky / Kz    ]]
    Division is unguarded: kz == 0 (Wood anomaly) surfaces as inf/nan
    exactly like the reference."""
    v00 = cdiv_raw(cmul(cneg(ky), kx), kz)
    v01 = csub(cneg(kz), cdiv_raw(cmul(ky, ky), kz))
    v10 = cadd(kz, cdiv_raw(cmul(kx, kx), kz))
    v11 = cdiv_raw(cmul(kx, ky), kz)
    re = jnp.stack([jnp.stack([v00[0], v01[0]]), jnp.stack([v10[0], v11[0]])])
    im = jnp.stack([jnp.stack([v00[1], v01[1]]), jnp.stack([v10[1], v11[1]])])
    return re, im


def interface_smatrix_in(Vf, Vi):
    """Input-cladding interface S-matrix (rcwa.py:1157-1164), bdp blocks.

    Returns [S11, S21, S12, S22], each a bdp.
    """
    t1 = bdp_inv((Vf[0] + Vi[0], Vf[1] + Vi[1]))
    t2 = (Vf[0] - Vi[0], Vf[1] - Vi[1])
    s11 = bdp_mul(t1, Vi)
    s12 = bdp_mul(t1, t2)
    s22 = bdp_mul(t1, Vf)
    return [(2 * s11[0], 2 * s11[1]), (-s12[0], -s12[1]), s12,
            (2 * s22[0], 2 * s22[1])]


def interface_smatrix_out(Vf, Vo):
    """Output-cladding interface S-matrix (rcwa.py:1174-1181), bdp blocks."""
    t1 = bdp_inv((Vf[0] + Vo[0], Vf[1] + Vo[1]))
    t2 = (Vf[0] - Vo[0], Vf[1] - Vo[1])
    s11 = bdp_mul(t1, Vf)
    s12 = bdp_mul(t1, t2)
    s22 = bdp_mul(t1, Vo)
    return [(2 * s11[0], 2 * s11[1]), s12, (-s12[0], -s12[1]),
            (2 * s22[0], 2 * s22[1])]


# ---------------------------------------------------------------------------
# Layer eigenmodes
# ---------------------------------------------------------------------------

def pq_matrices(eps_conv, mu_conv, kx, ky):
    """Wave matrices P (H->E) and Q (E->H) for a patterned layer, cpairs.

    Dense equivalents of rcwa.py:1226-1232.  The reference forms
    [Kx; Ky] @ inv(eps_conv) @ [Ky, -Kx] with dense diagonal K matrices;
    since K are diagonal this is pure row/column scaling of inv(eps_conv)
    (exact same matrix, O(N^2) instead of O(N^3)).
    """
    einv = cplx.cinv(eps_conv)
    minv = cplx.cinv(mu_conv)

    def col(k):  # k as a column cpair for row scaling
        return (k[0][:, None], k[1][:, None])

    def row(k):  # k as a row cpair for column scaling
        return (k[0][None, :], k[1][None, :])

    kxc, kxr = col(kx), row(kx)
    kyc, kyr = col(ky), row(ky)

    def sandwich(m, left, right):
        # diag(left) @ m @ diag(right) elementwise on pairs
        return cmul(left, cmul(m, right))

    def blockmat(b00, b01, b10, b11):
        return (jnp.block([[b00[0], b01[0]], [b10[0], b11[0]]]),
                jnp.block([[b00[1], b01[1]], [b10[1], b11[1]]]))

    p00 = sandwich(einv, kxc, kyr)
    p01 = csub(mu_conv, sandwich(einv, kxc, kxr))
    p10 = cadd(cneg(mu_conv), sandwich(einv, kyc, kyr))
    p11 = cneg(sandwich(einv, kyc, kxr))
    P = blockmat(p00, p01, p10, p11)

    q00 = cneg(sandwich(minv, kxc, kyr))
    q01 = cadd(cneg(eps_conv), sandwich(minv, kxc, kxr))
    q10 = csub(eps_conv, sandwich(minv, kyc, kyr))
    q11 = sandwich(minv, kyc, kxr)
    Q = blockmat(q00, q01, q10, q11)
    return P, Q


def pq_homogeneous_bdp(eps, mu, kx, ky):
    """P and Q of a homogeneous layer as bdps (rcwa.py:1208-1214).

    eps, mu are scalar cpairs; kx, ky vector cpairs.  For scalar eps/mu the
    conv matrices are eps*I / mu*I, so every block of P and Q is diagonal.
    """
    kxky_e = cdiv_raw(cmul(kx, ky), eps)
    kx2_e = cdiv_raw(cmul(kx, kx), eps)
    ky2_e = cdiv_raw(cmul(ky, ky), eps)
    kxky_m = cdiv_raw(cmul(kx, ky), mu)
    kx2_m = cdiv_raw(cmul(kx, kx), mu)
    ky2_m = cdiv_raw(cmul(ky, ky), mu)

    def bc(s, like):  # broadcast scalar pair to vector pair
        return (jnp.broadcast_to(s[0], like[0].shape),
                jnp.broadcast_to(s[1], like[0].shape))

    mu_v, eps_v = bc(mu, kx), bc(eps, kx)
    p00 = kxky_e
    p01 = csub(mu_v, kx2_e)
    p10 = cadd(cneg(mu_v), ky2_e)
    p11 = cneg(kxky_e)
    q00 = cneg(kxky_m)
    q01 = cadd(cneg(eps_v), kx2_m)
    q10 = csub(eps_v, ky2_m)
    q11 = kxky_m

    def pack(b00, b01, b10, b11):
        return (jnp.stack([jnp.stack([b00[0], b01[0]]),
                           jnp.stack([b10[0], b11[0]])]),
                jnp.stack([jnp.stack([b00[1], b01[1]]),
                           jnp.stack([b10[1], b11[1]])]))

    return pack(p00, p01, p10, p11), pack(q00, q01, q10, q11)


def homogeneous_kz(eps, mu, kx, ky):
    """kz of a homogeneous layer, duplicated over both polarization blocks
    (rcwa.py:1217-1219).  Scalar cpairs eps/mu, vector cpairs kx/ky."""
    kz = kz_conj_branch(cmul(eps, mu), kx, ky)
    return (jnp.concatenate([kz[0], kz[0]]), jnp.concatenate([kz[1], kz[1]]))


def eigen_decomposition(P, Q, broadening, backend, stable_grad=True):
    """Eigenmodes of a patterned layer (rcwa.py:1235-1241), cpairs.

    Solves eig(P @ Q); kz = sqrt(lambda) with the Im(kz) >= 0 branch chosen
    by sign flip (note: sign flip, not conjugation — rcwa.py:1241).
    """
    A = cmm(P, Q)
    if not stable_grad:
        broadening = 0.0
    wr, wi, vr, vi = eig_pair(A[0], A[1], broadening, backend)
    kz = csqrt((wr, wi))
    flip = kz[1] < 0
    kz = (jnp.where(flip, -kz[0], kz[0]), jnp.where(flip, -kz[1], kz[1]))
    return kz, (vr, vi)


# ---------------------------------------------------------------------------
# Single-layer S-matrix
# ---------------------------------------------------------------------------

class LayerSolution(NamedTuple):
    """Everything solve/field-reconstruction needs about one layer.

    Every matrix field is a cpair; for homogeneous layers the matrices are
    bdps (the solver tracks which).  S11/S21 are the layer S-matrix blocks
    (S22 == S11, S12 == S21 by the free-space-referenced symmetry, see
    module docstring).  G/D are the mode-coupling blocks: Cf = [G; D],
    Cb = [D; G] in the reference's notation (rcwa.py:1271-1274).
    """
    S11: tuple
    S21: tuple
    G: tuple
    D: tuple
    kz: tuple        # (2N,) cpair of eigenmode kz
    E_eigvec: tuple  # [2N, 2N] cpair (or bdp identity for homogeneous)
    H_eigvec: tuple  # [2N, 2N] cpair (or bdp)


def _phase_of(kz, omega, thickness):
    """exp(1j * omega * kz * thickness) for a cpair kz, real omega/t."""
    return cplx.cexp_i((omega * thickness * kz[0], omega * thickness * kz[1]))


def layer_smatrix(E, kz, P, Q, Vf_inv, omega, thickness,
                  avoid_pinv_instability=False, max_pinv_instability=0.005):
    """Layer S-matrix referenced to free space (rcwa.py:1244-1281), cpairs.

    Args:
      E: [2N, 2N] cpair of E-field eigenvectors.  kz: (2N,) cpair.
      P, Q: wave-matrix cpairs.  Vf_inv: inverse free-space V as a bdp.
      omega, thickness: real scalars.

    Returns (LayerSolution, instability) where instability is the
    stop-gradient (pinv_metric, qinv_metric) if avoid_pinv_instability
    else None.
    """
    n2 = E[0].shape[-1]
    rdtype = E[0].dtype
    phase = _phase_of(kz, omega, thickness)

    instability = None
    if avoid_pinv_instability:
        # Reference computes explicit inverses and an instability metric,
        # then switches to the Q-based H-eigvec formula if P is too
        # ill-conditioned (rcwa.py:1249-1262).
        Pinv = cplx.cinv(P)
        eye = jnp.eye(n2, dtype=rdtype)
        PP = cmm(P, Pinv)
        PP2 = cmm(Pinv, P)
        def dev(M):
            return jnp.max(jnp.sqrt((M[0] - eye) ** 2 + M[1] ** 2))
        p_ins = jnp.maximum(dev(PP), dev(PP2))
        Qinv = cplx.cinv(Q)
        q_ins = dev(cmm(Q, Qinv))
        H_p = cmm(Pinv, scale_cols(E, kz))
        H_q = cmm(Q, scale_cols(E, cdiv_raw((jnp.ones_like(kz[0]),
                                             jnp.zeros_like(kz[1])), kz)))
        ok = p_ins < max_pinv_instability
        H = cwhere(ok, H_p, H_q)
        instability = (jax.lax.stop_gradient(p_ins),
                       jax.lax.stop_gradient(q_ins))
    else:
        # H = P^-1 E Kz (rcwa.py:1248,1264) via a solve.
        H = cplx.csolve(P, scale_cols(E, kz))

    W = bdp_apply(Vf_inv, H)
    A = cadd(E, W)
    B = csub(E, W)
    Bphi = scale_cols(B, phase)
    Mp = cplx.cinv(cadd(A, Bphi))
    Mm = cplx.cinv(csub(A, Bphi))
    G = cadd(Mp, Mm)
    D = csub(Mp, Mm)

    Ephi = scale_cols(E, phase)
    eye = ceye(n2, rdtype)
    S11 = cadd(cmm(Ephi, G), cmm(E, D))
    S21 = csub(cadd(cmm(E, G), cmm(Ephi, D)), eye)

    return LayerSolution(S11=S11, S21=S21, G=G, D=D, kz=kz,
                         E_eigvec=E, H_eigvec=H), instability


def layer_smatrix_homogeneous(eps, mu, kx, ky, Vf, omega, thickness):
    """Homogeneous-layer S-matrix, entirely in bdp algebra (O(N)).

    Follows the same math as :func:`layer_smatrix` with E = I and P, Q bdp
    (reference computes this densely: rcwa.py:1206-1222 + 1244-1281).
    Returns a LayerSolution whose matrices are bdps.
    """
    n = kx[0].shape[0]
    rdtype = kx[0].dtype
    P, _Q = pq_homogeneous_bdp(eps, mu, kx, ky)
    kz = homogeneous_kz(eps, mu, kx, ky)
    phase = _phase_of(kz, omega, thickness)

    E = bdp_eye(n, rdtype)
    # H = P^-1 E Kz; E = I so this is P^-1 column-scaled by kz.
    H = bdp_scale_cols(bdp_inv(P), kz)
    W = bdp_mul(bdp_inv(Vf), H)
    A = cadd(E, W)
    B = csub(E, W)
    Bphi = bdp_scale_cols(B, phase)
    Mp = bdp_inv(cadd(A, Bphi))
    Mm = bdp_inv(csub(A, Bphi))
    G = cadd(Mp, Mm)
    D = csub(Mp, Mm)

    Ephi = bdp_scale_cols(E, phase)
    S11 = cadd(bdp_mul(Ephi, G), bdp_mul(E, D))
    S21 = csub(cadd(bdp_mul(E, G), bdp_mul(Ephi, D)), bdp_eye(n, rdtype))

    return LayerSolution(S11=S11, S21=S21, G=G, D=D, kz=kz,
                         E_eigvec=E, H_eigvec=H)


# ---------------------------------------------------------------------------
# Redheffer star product
# ---------------------------------------------------------------------------

def redheffer_product(Sm, Sn):
    """Star product of two S-matrices [S11, S21, S12, S22] of dense cpairs
    (rcwa.py:1287-1294).

    Returns the combined S plus the two resolvent factors
    (t1 = inv(I - S12m S21n), t2 = inv(I - S21n S12m)) needed for the
    mode-coupling updates.
    """
    S11m, S21m, S12m, S22m = Sm
    S11n, S21n, S12n, S22n = Sn
    n2 = S11m[0].shape[-1]
    eye = ceye(n2, S11m[0].dtype)
    t1 = cplx.cinv(csub(eye, cmm(S12m, S21n)))
    t2 = cplx.cinv(csub(eye, cmm(S21n, S12m)))
    S11 = cmm(S11n, cmm(t1, S11m))
    S21 = cadd(S21m, cmm(S22m, cmm(t2, cmm(S21n, S11m))))
    S12 = cadd(S12n, cmm(S11n, cmm(t1, cmm(S12m, S22n))))
    S22 = cmm(S22m, cmm(t2, S22n))
    return [S11, S21, S12, S22], t1, t2


def redheffer_update_modes(Cm_list, Cn_list, Sm, Sn, t1, t2):
    """Propagate per-layer mode-coupling matrices through a star product.

    Mirrors rcwa.py:1296-1304.  Each entry of the lists is the (Cf, Cb)
    cpair tuple for one layer, Cf/Cb of shape [4N, 2N].
    """
    S11m, S21m, S12m, S22m = Sm
    S11n, S21n, S12n, S22n = Sn
    out = []
    zm = cmm(t2, cmm(S21n, S11m))
    zt = cmm(t2, S22n)
    for (cf, cb) in Cm_list:
        out.append((cadd(cf, cmm(cb, zm)), cmm(cb, zt)))
    z1 = cmm(t1, S11m)
    z2 = cmm(t1, cmm(S12m, S22n))
    for (cf, cb) in Cn_list:
        out.append((cmm(cf, z1), cadd(cb, cmm(cf, z2))))
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


def diffraction_angles(kx, ky, eps, mu, orders, order, unit='radian'):
    """Propagation angles (inclination, azimuth) of selected orders in a
    homogeneous cladding — functional twin of rcwa.diffraction_angle
    (rcwa.py:214-262), usable directly on the fmm path's (kx, ky) pairs.

    Args:
      kx, ky: normalized transverse k-vector cpairs, [N] each (the
        ``intr['kx'] / intr['ky']`` of solve_stack_pair).
      eps, mu: cladding permittivity/permeability scalar cpairs.
      orders: [[m, n], ...] diffraction orders.
      order: (ox, oy) truncation order.
    """
    idx = matching_indices(orders, order)
    if not isinstance(kx, tuple):          # fmm path: real k-vectors
        kx = (kx, jnp.zeros_like(kx))
    if not isinstance(ky, tuple):
        ky = (ky, jnp.zeros_like(ky))
    if not isinstance(eps, tuple):
        eps = (eps, jnp.zeros_like(jnp.asarray(eps)))
    if not isinstance(mu, tuple):
        mu = (mu, jnp.zeros_like(jnp.asarray(mu)))
    kxi = (kx[0][idx], kx[1][idx])
    kyi = (ky[0][idx], ky[1][idx])
    k2 = cadd(cmul(kxi, kxi), cmul(kyi, kyi))
    kt = csqrt(k2)
    kz = csqrt(csub(cmul(eps, mu), k2))
    inc = jnp.arctan2(kt[0], kz[0])
    azi = jnp.arctan2(kyi[0], kxi[0])
    if unit in ('d', 'deg', 'degree'):
        rad2deg = 180. / np.pi
        inc = rad2deg * inc
        azi = rad2deg * azi
    return inc, azi


def conv_to_grid(conv, order, nx=100, ny=100):
    """Recover a layer's spatial distribution from its truncated Fourier
    conv-matrix — functional twin of rcwa.return_layer (rcwa.py:264-298).

    The reference scatters conv coefficients into an [nx, ny] spectrum and
    ifft2s it; here the inverse DFT is two real matmuls on the (re, im)
    pair — identical values, no complex FFT (which this TPU runtime cannot
    hold).  ``conv`` is one [N, N] cpair; returns an [nx, ny] cpair.
    """
    ox, oy = order
    noy = 2 * oy + 1
    rdtype = conv[0].dtype
    ii, jj, src_r, src_c = [], [], [], []
    for i in range(-2 * ox, 2 * ox + 1):
        for j in range(-2 * oy, 2 * oy + 1):
            ii.append(i % nx)
            jj.append(j % ny)
            if i >= 0 and j >= 0:
                src_r.append(i * noy + j); src_c.append(0)
            elif i >= 0 and j < 0:
                src_r.append(i * noy); src_c.append(-j)
            elif i < 0 and j >= 0:
                src_r.append(j); src_c.append(-i * noy)
            else:
                src_r.append(0); src_c.append(-i * noy - j)
    ii, jj = np.array(ii), np.array(jj)
    src_r, src_c = np.array(src_r), np.array(src_c)

    phx = 2 * np.pi * np.outer(np.arange(nx), np.arange(nx)) / nx
    phy = 2 * np.pi * np.outer(np.arange(ny), np.arange(ny)) / ny
    Wx = (jnp.asarray(np.cos(phx), rdtype), jnp.asarray(np.sin(phx), rdtype))
    Wy = (jnp.asarray(np.cos(phy).T, rdtype),
          jnp.asarray(np.sin(phy).T, rdtype))

    F = (jnp.zeros((nx, ny), rdtype).at[ii, jj].set(conv[0][src_r, src_c]),
         jnp.zeros((nx, ny), rdtype).at[ii, jj].set(conv[1][src_r, src_c]))
    return cmm(Wx, cmm(F, Wy))
