"""Functional, split-real RCWA solve: the TPU execution path.

The class API (:mod:`torcwa_tpu.solver`) mirrors the reference and uses
complex arrays — ideal on CPU.  This module is the TPU-first pipeline: a
pure function of real float tensors (complex values carried as (re, im)
pairs) that jits, vmaps over sweep axes (wavelength/geometry), shards over
device meshes, and differentiates — with **zero complex arrays on device**
(this TPU runtime does not reliably lower complex64; see eig_qr_real.py).

Highlights vs the reference's eager object
(/root/reference/torcwa/rcwa.py):

* conv matrices via a real DFT-matmul pair (MXU) instead of full fft2 +
  gather — mathematically identical to rcwa.py:1183-1204 restricted to the
  needed order differences;
* one batched split-real eig across all patterned layers / sweep points;
* the 4N x 4N boundary inverse replaced by two 2N x 2N inverses using the
  symmetric-layer factorization (see core.py docstring), with S22 == S11
  and S12 == S21 never materialized twice;
* cladding interface S-matrices kept in O(N) block-2x2-diagonal form.

Conventions match the reference exactly: Lorentz-Heaviside units,
exp(-j w t), Laurent-rule factorization, kz branch rules per layer type.
Magnetic materials (mu != 1 claddings, scalar and patterned layer mu) and
homogeneous fast-path layers are supported end to end (mu_* / eps_scalars
arguments + StackSpec.homogeneous); with mu unset the mu = 1 structure is
exploited for cheaper P/Q assembly.
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name as _ckpt_name
from ._constants import PI_REF
from .core import (bdp_mul as _bdp_mul, bdp_inv as _bdp_inv,
                   bdp_apply as _bdp_apply, bdp_dense as _bdp_dense,
                   vmat as _core_vmat, interface_smatrix_in,
                   interface_smatrix_out)
# functional diagnostics twins of rcwa.diffraction_angle / return_layer
# (rcwa.py:214-298) for the split-real path: angles from intr['kx'/'ky'],
# layer synthesis from intr['conv'] slices
from .core import (diffraction_angles as diffraction_angle_pair,
                   conv_to_grid as return_layer_pair)
from .ops import cplx
from .ops.eig import eig_pair
from .ops.fourier import order_vectors, material_conv_pair

__all__ = ['StackSpec', 'solve_stack_pair', 'sparam_xy_pair',
           'sparam_ps_pair', 'simulate_txx', 'diffraction_angle_pair',
           'return_layer_pair', 'source_fourier_pair',
           'source_planewave_pair']


class StackSpec(NamedTuple):
    """Static description of the layer stack (hashable, drives tracing)."""
    order: tuple          # (order_x, order_y)
    L: tuple              # (Lx, Ly)
    n_layers: int
    has_input: bool = True
    has_output: bool = False
    # Per-layer static flags; () means all patterned.  Homogeneous layers
    # skip the dense 2Nx2N eig entirely and assemble their S-matrix in
    # O(N) block-2x2-diagonal algebra (the class API's fast path,
    # reference rcwa.py:156-168 dispatch), reading scalars from
    # eps_scalars/mu_scalars instead of grid slices.
    homogeneous: tuple = ()


# ---------------------------------------------------------------------------
# Block-2x2-diagonal pair algebra now lives in core.py (shared with the
# class API); imported above under the historical local names.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------

def dft_conv_pair(grid, order, nx, ny):
    """Toeplitz convolution matrix of a material grid via real DFT matmuls.

    Thin shim over ops.fourier.material_conv_pair (nx/ny kept in the
    signature for backward compatibility; they must match grid.shape).
    Identical to the reference's fft2 + order-difference gather
    (rcwa.py:1183-1204) restricted to the needed order differences.
    """
    return material_conv_pair(grid, order)


def kvectors_real(freq, inc_ang, azi_ang, n_ref, order, L, rdtype):
    """Real transverse k-grids (real angles; mirrors rcwa.py:1124-1141).

    n_ref = Re(sqrt(eps_ref * mu_ref)) of the angle-reference cladding.
    """
    kx0 = n_ref * jnp.sin(inc_ang) * jnp.cos(azi_ang)
    ky0 = n_ref * jnp.sin(inc_ang) * jnp.sin(azi_ang)
    ox = jnp.arange(-order[0], order[0] + 1, dtype=rdtype)
    oy = jnp.arange(-order[1], order[1] + 1, dtype=rdtype)
    kx = kx0 + ox / (L[0] * freq)
    ky = ky0 + oy / (L[1] * freq)
    kxg, kyg = jnp.meshgrid(kx, ky, indexing='ij')
    return kxg.reshape(-1), kyg.reshape(-1)


def _kz_pair(eps_mu, kx, ky):
    """kz = sqrt(eps*mu - kx^2 - ky^2) with Im >= 0 via conj branch fix."""
    kz = cplx.csqrt((eps_mu[0] - kx ** 2 - ky ** 2,
                     eps_mu[1] + jnp.zeros_like(kx)))
    return kz[0], jnp.abs(kz[1])  # conj-if-negative == abs on imag


def vmat_pair(kx, ky, kz):
    """Homogeneous-medium E->H map as a bd pair (rcwa.py:1145-1147).

    kx, ky are real arrays on this functional path (real incidence angles);
    kz is a cpair.  Delegates to core.vmat on pairs.
    """
    return _core_vmat((kx, jnp.zeros_like(kx)), (ky, jnp.zeros_like(ky)), kz)


def interface_in_pair(Vf, Vi):
    """Input cladding S-matrix blocks as bd pairs (rcwa.py:1157-1164)."""
    return interface_smatrix_in(Vf, Vi)


def interface_out_pair(Vf, Vo):
    """Output cladding S-matrix blocks as bd pairs (rcwa.py:1174-1181)."""
    return interface_smatrix_out(Vf, Vo)


def pq_pair(eps_conv, kx, ky, mu_conv=None):
    """P, Q of a patterned layer (split-real rcwa.py:1226-1232).

    With ``mu_conv=None`` the mu = 1 structure is exploited (constant
    blocks stay diagonal); otherwise delegates to core.pq_matrices for
    the general magnetic case."""
    if mu_conv is not None:
        kxp = (kx, jnp.zeros_like(kx))
        kyp = (ky, jnp.zeros_like(ky))
        from .core import pq_matrices
        return pq_matrices(eps_conv, mu_conv, kxp, kyp)
    n = kx.shape[0]
    rdtype = kx.dtype
    einv = cplx.cinv(eps_conv)
    eye = jnp.eye(n, dtype=rdtype)
    kxc, kxr = kx[:, None], kx[None, :]
    kyc, kyr = ky[:, None], ky[None, :]

    def blocks(m, c0, c1):
        # returns one component (re or im) of P given einv component m and
        # the identity coefficients of the constant part
        p00 = kxc * m * kyr
        p01 = c0 * eye - kxc * m * kxr
        p10 = -c0 * eye + kyc * m * kyr
        p11 = -(kyc * m * kxr)
        return jnp.block([[p00, p01], [p10, p11]])

    Pr = blocks(einv[0], 1., 0.)
    Pi = blocks(einv[1], 0., 0.)

    # Q with mu=1: [[ -diag(kx ky), eye*kx^2 - eps], [eps - diag(ky^2), diag(ky kx)]]
    d_kxky = jnp.diag(kx * ky)
    d_kx2 = jnp.diag(kx * kx)
    d_ky2 = jnp.diag(ky * ky)
    Qr = jnp.block([[-d_kxky, d_kx2 - eps_conv[0]],
                    [eps_conv[0] - d_ky2, d_kxky]])
    Qi = jnp.block([[jnp.zeros((n, n), rdtype), -eps_conv[1]],
                    [eps_conv[1], jnp.zeros((n, n), rdtype)]])
    return (Pr, Pi), (Qr, Qi)


# Above this 2N, layer/Redheffer algebra is rematerialized in the
# backward: storing every augmented-LU residual (417 MB each at order
# 25) of ~7 solves per solve overflows HBM, while the eig residuals
# (V, w — the expensive part to recompute) stay stored.
_REMAT_MIN_2N = 4000


def _layer_H(P, E, kz, Q=None, max_pinv=0.005, solve=None):
    """H-field eigenvectors H = P^-1 E Kz, optionally with the reference's
    Pinv-instability fallback (rcwa.py:1249-1262): when ``Q`` is given, P is
    inverted explicitly, the deviation metric max|P P^-1 - I| (and P^-1 P)
    is measured, and a too-ill-conditioned P (Wood anomaly) switches to the
    equivalent H = Q E Kz^-1 formula — matching core.layer_smatrix exactly.

    Returns (H, instability) where instability is the stop-gradient
    (pinv_metric, qinv_metric) pair when the fallback is armed, else None.
    """
    if Q is None:
        solve = solve or cplx.csolve
        return solve(P, cplx.scale_cols(E, kz)), None
    n2 = E[0].shape[-1]
    rdtype = E[0].dtype
    Pinv = cplx.cinv(P)
    eye = jnp.eye(n2, dtype=rdtype)

    def dev(M):
        return jnp.max(jnp.sqrt((M[0] - eye) ** 2 + M[1] ** 2))

    p_ins = jnp.maximum(dev(cplx.cmm(P, Pinv)), dev(cplx.cmm(Pinv, P)))
    q_ins = dev(cplx.cmm(Q, cplx.cinv(Q)))
    H_p = cplx.cmm(Pinv, cplx.scale_cols(E, kz))
    kz_inv = cplx.cdiv_raw((jnp.ones_like(kz[0]), jnp.zeros_like(kz[1])), kz)
    H_q = cplx.cmm(Q, cplx.scale_cols(E, kz_inv))
    H = cplx.cwhere(p_ins < max_pinv, H_p, H_q)
    return H, (jax.lax.stop_gradient(p_ins), jax.lax.stop_gradient(q_ins))


def _layer_smatrix_tail(P, E, kz, Vf_inv, omega, thickness,
                        Q=None, max_pinv=0.005):
    """S-matrix assembly from the layer eigenmodes (the LU-heavy part)."""
    n2 = E[0].shape[-1]
    rdtype = E[0].dtype
    # H = P^-1 E Kz (Q arms the Pinv-instability fallback)
    H, instability = _layer_H(P, E, kz, Q, max_pinv)
    W = _bdp_apply(Vf_inv, H)
    Apl = cplx.cadd(E, W)
    Bmn = cplx.csub(E, W)
    phase = cplx.cexp_i((omega * thickness * kz[0], omega * thickness * kz[1]))
    Bphi = cplx.scale_cols(Bmn, phase)
    Mp = cplx.cinv(cplx.cadd(Apl, Bphi))
    Mm = cplx.cinv(cplx.csub(Apl, Bphi))
    G = cplx.cadd(Mp, Mm)
    D = cplx.csub(Mp, Mm)
    Ephi = cplx.scale_cols(E, phase)
    eye = (jnp.eye(n2, dtype=rdtype), jnp.zeros((n2, n2), rdtype))
    S11 = cplx.cadd(cplx.cmm(Ephi, G), cplx.cmm(E, D))
    S21 = cplx.csub(cplx.cadd(cplx.cmm(E, G), cplx.cmm(Ephi, D)), eye)
    return S11, S21, G, D, H, instability


def _layer_smatrix_tail_nomodes(P, E, kz, Vf_inv, omega, thickness,
                                Q=None, max_pinv=0.005):
    """S-matrix assembly without the mode-coupling matrices G, D.

    With Mp = (Apl+Bphi)^-1 and Mm = (Apl-Bphi)^-1 the reference's
    blocks (rcwa.py:1276-1281) regroup as
      S11 = Ephi(Mp+Mm) + E(Mp-Mm) = (Ephi+E) Mp + (Ephi-E) Mm
      S21 = E(Mp+Mm) + Ephi(Mp-Mm) - I = (Ephi+E) Mp - (Ephi-E) Mm - I
    so two right-solves replace two dense inverses plus four complex
    GEMMs.  Mp/Mm/G/D never materialize; at order 25 that is the
    difference between the fwd+grad graph fitting HBM and not.  Each
    large solve is additionally checkpointed so the backward holds one
    augmented-LU region at a time (417 MB each at order 25).
    """
    n2 = E[0].shape[-1]
    rdtype = E[0].dtype
    big = n2 >= _REMAT_MIN_2N
    solve = jax.checkpoint(cplx.csolve) if big else cplx.csolve
    rsolve = jax.checkpoint(cplx.crsolve) if big else cplx.crsolve
    H, instability = _layer_H(P, E, kz, Q, max_pinv, solve=solve)
    W = _bdp_apply(Vf_inv, H)
    Apl = cplx.cadd(E, W)
    Bmn = cplx.csub(E, W)
    phase = cplx.cexp_i((omega * thickness * kz[0], omega * thickness * kz[1]))
    Bphi = cplx.scale_cols(Bmn, phase)
    Ephi = cplx.scale_cols(E, phase)
    U = cplx.cadd(Ephi, E)
    V = cplx.csub(Ephi, E)
    X1 = rsolve(cplx.cadd(Apl, Bphi), U)
    X2 = rsolve(cplx.csub(Apl, Bphi), V)
    S11 = cplx.cadd(X1, X2)
    eye = (jnp.eye(n2, dtype=rdtype), jnp.zeros((n2, n2), rdtype))
    S21 = cplx.csub(cplx.csub(X1, X2), eye)
    return S11, S21, H, instability


def _layer_smatrix_body(eps_conv, kx, ky, Vf_inv, omega, thickness,
                        broadening, backend, mu_conv=None, need_modes=True,
                        avoid_pinv=False, max_pinv=0.005):
    P, Q = pq_pair(eps_conv, kx, ky, mu_conv)
    A = cplx.cmm(P, Q)
    wr, wi, vr, vi = eig_pair(A[0], A[1], broadening, backend)
    # under the large-2N remat policy these four arrays are the ONLY
    # saved intermediates of the layer: the backward recomputes the
    # cheap P/Q/solve algebra but never the eigendecomposition
    wr = _ckpt_name(wr, 'eig')
    wi = _ckpt_name(wi, 'eig')
    vr = _ckpt_name(vr, 'eig')
    vi = _ckpt_name(vi, 'eig')
    kz = cplx.csqrt((wr, wi))
    flip = kz[1] < 0
    kz = (jnp.where(flip, -kz[0], kz[0]), jnp.where(flip, -kz[1], kz[1]))
    E = (vr, vi)
    big = E[0].shape[-1] >= _REMAT_MIN_2N
    Qarg = Q if avoid_pinv else None
    if need_modes:
        tail = jax.checkpoint(_layer_smatrix_tail) if big \
            else _layer_smatrix_tail
        S11, S21, G, D, H, ins = tail(P, E, kz, Vf_inv, omega, thickness,
                                      Qarg, max_pinv)
        if avoid_pinv:
            return S11, S21, G, D, kz, E, H, ins
        return S11, S21, G, D, kz, E, H
    tail = jax.checkpoint(_layer_smatrix_tail_nomodes) if big \
        else _layer_smatrix_tail_nomodes
    S11, S21, H, ins = tail(P, E, kz, Vf_inv, omega, thickness, Qarg, max_pinv)
    if avoid_pinv:
        return S11, S21, kz, E, H, ins
    return S11, S21, kz, E, H


def layer_smatrix_pair(eps_conv, kx, ky, Vf_inv, omega, thickness,
                       broadening, backend, mu_conv=None, need_modes=True,
                       avoid_pinv=False, max_pinv=0.005):
    """Patterned-layer S-matrix, split-real (rcwa.py:1224-1281 pipeline).

    Returns (S11, S21, G, D, kz, E, H) pairs when ``need_modes``, else
    (S11, S21, kz, E, H) via the cheaper no-modes tail.  S22 == S11,
    S12 == S21 (symmetric free-space-referenced layer).

    Above _REMAT_MIN_2N the whole layer is rematerialized in the
    backward except the eig outputs (checkpoint_name policy): storing
    P/Q/E/kz plus every augmented-LU factor (417 MB each at order 25)
    overflows HBM, while recomputing the algebra costs a few extra
    GEMM/LU passes.
    """
    # measured on the order-25 fwd+grad graph: checkpointing only the
    # tail (16.04G planned) beats a save-only-eig policy over the whole
    # body (16.37G) — the scheduler overlaps the longer remat chains
    return _layer_smatrix_body(eps_conv, kx, ky, Vf_inv, omega, thickness,
                               broadening, backend, mu_conv, need_modes,
                               avoid_pinv, max_pinv)


def redheffer_pair(Sm, Sn):
    """Star product on dense pairs (rcwa.py:1287-1294).

    At large 2N the resolvent LUs are rematerialized in the backward
    (same rationale as the layer tail).
    """
    if Sm[0][0].shape[-1] >= _REMAT_MIN_2N:
        return jax.checkpoint(_redheffer_impl)(Sm, Sn)
    return _redheffer_impl(Sm, Sn)


def _redheffer_impl(Sm, Sn):
    S11m, S21m, S12m, S22m = Sm
    S11n, S21n, S12n, S22n = Sn
    n2 = S11m[0].shape[-1]
    eye = (jnp.eye(n2, dtype=S11m[0].dtype),
           jnp.zeros((n2, n2), S11m[0].dtype))
    t1 = cplx.cinv(cplx.csub(eye, cplx.cmm(S12m, S21n)))
    t2 = cplx.cinv(cplx.csub(eye, cplx.cmm(S21n, S12m)))
    S11 = cplx.cmm(S11n, cplx.cmm(t1, S11m))
    S21 = cplx.cadd(S21m, cplx.cmm(S22m, cplx.cmm(t2, cplx.cmm(S21n, S11m))))
    S12 = cplx.cadd(S12n, cplx.cmm(S11n, cplx.cmm(t1, cplx.cmm(S12m, S22n))))
    S22 = cplx.cmm(S22m, cplx.cmm(t2, S22n))
    return [S11, S21, S12, S22], t1, t2


def _stacked_modes_m(Cstk, Sm, Sn, t1, t2):
    """Batched redheffer_update_modes for entries on the *m* (left) side:
    cf <- cf + cb zm, cb <- cb zt applied to [L, 4N, 2N] stacks with one
    broadcasted GEMM each (rcwa.py:1296-1299 over every prior layer)."""
    CF, CB = Cstk
    S11m = Sm[0]
    S21n, S22n = Sn[1], Sn[3]
    zm = cplx.cmm(t2, cplx.cmm(S21n, S11m))
    zt = cplx.cmm(t2, S22n)
    return (cplx.cadd(CF, cplx.cmm(CB, zm)), cplx.cmm(CB, zt))


def _stacked_modes_n(Cstk, Sm, Sn, t1, t2):
    """Batched redheffer_update_modes for entries on the *n* (right) side:
    cf <- cf z1, cb <- cb + cf z2 (rcwa.py:1301-1304)."""
    CF, CB = Cstk
    S11m, S12m = Sm[0], Sm[2]
    S22n = Sn[3]
    z1 = cplx.cmm(t1, S11m)
    z2 = cplx.cmm(t1, cplx.cmm(S12m, S22n))
    return (cplx.cmm(CF, z1), cplx.cadd(CB, cplx.cmm(CF, z2)))


def _fold_layers_scan(S11s, S21s, GDs=None):
    """Redheffer fold over a stacked layer axis via lax.scan.

    Numerically the same star-product recursion as the unrolled per-layer
    fold (reference rcwa.py:173-211, 1283-1306) but the compiled graph is
    independent of layer count: the star product is the scan body and,
    with modes, the per-layer mode-coupling matrices ride the carry as
    [L, 4N, 2N] stacks — prior entries updated by one broadcasted GEMM
    under an ``arange(L) < i`` mask, the new entry finalized with a
    dynamic index update.  Deep stacks (tens of layers) compile in the
    same time as two-layer ones.

    Args:
      S11s, S21s: [L, 2N, 2N] cpairs of per-layer S blocks (stack order).
      GDs: optional ([L,2N,2N] G cpair, [L,2N,2N] D cpair) to also
        propagate the mode-coupling matrices.

    Returns (S, Cstk) where S is the folded [S11,S21,S12,S22] and Cstk is
    the ([L,4N,2N] CF cpair, [L,4N,2N] CB cpair) stack or None.
    """
    L = S11s[0].shape[0]
    take = lambda s, i: (s[0][i], s[1][i])
    sl = lambda s: (s[0][1:], s[1][1:])
    S0 = [take(S11s, 0), take(S21s, 0), take(S21s, 0), take(S11s, 0)]
    with_modes = GDs is not None

    if with_modes:
        Gs, Ds = GDs
        # Cf = [G; D], Cb = [D; G] raw per-layer stacks (rcwa.py:1271-1274)
        CFs = (jnp.concatenate([Gs[0], Ds[0]], axis=-2),
               jnp.concatenate([Gs[1], Ds[1]], axis=-2))
        CBs = (jnp.concatenate([Ds[0], Gs[0]], axis=-2),
               jnp.concatenate([Ds[1], Gs[1]], axis=-2))
        # carry stacks hold *processed* entries; slot j is live once step j
        # has run, so only slot 0 starts initialized
        zero = lambda a: jnp.zeros_like(a).at[0].set(a[0])
        CF0 = (zero(CFs[0]), zero(CFs[1]))
        CB0 = (zero(CBs[0]), zero(CBs[1]))
        xs = (sl(S11s), sl(S21s), sl(CFs), sl(CBs), jnp.arange(1, L))

        def body(carry, x):
            S, CF, CB = carry
            s11, s21, cf_raw, cb_raw, i = x
            Sn = [s11, s21, s21, s11]
            S_new, t1, t2 = redheffer_pair(S, Sn)
            CF_upd, CB_upd = _stacked_modes_m((CF, CB), S, Sn, t1, t2)
            mask = (jnp.arange(L) < i)[:, None, None]
            CF = (jnp.where(mask, CF_upd[0], CF[0]),
                  jnp.where(mask, CF_upd[1], CF[1]))
            CB = (jnp.where(mask, CB_upd[0], CB[0]),
                  jnp.where(mask, CB_upd[1], CB[1]))
            cf_i, cb_i = _stacked_modes_n((cf_raw, cb_raw), S, Sn, t1, t2)
            CF = (CF[0].at[i].set(cf_i[0]), CF[1].at[i].set(cf_i[1]))
            CB = (CB[0].at[i].set(cb_i[0]), CB[1].at[i].set(cb_i[1]))
            return (S_new, CF, CB), None

        (S, CF, CB), _ = jax.lax.scan(body, (S0, CF0, CB0), xs)
        return S, (CF, CB)

    xs = (sl(S11s), sl(S21s))

    def body(S, x):
        s11, s21 = x
        S_new, _, _ = redheffer_pair(S, [s11, s21, s21, s11])
        return S_new, None

    S, _ = jax.lax.scan(body, S0, xs)
    return S, None


# ---------------------------------------------------------------------------
# Full solve
# ---------------------------------------------------------------------------

def solve_stack_pair(spec: StackSpec, freq, inc_ang, azi_ang,
                     eps_grids, thicknesses, eps_in=None, eps_out=None,
                     broadening='auto', eig_backend='auto',
                     mu_grids=None, eps_scalars=None, mu_scalars=None,
                     mu_in=None, mu_out=None, with_modes=False,
                     avoid_pinv_instability=False,
                     max_pinv_instability=0.005, fold='auto'):
    """Global S-matrix of a layer stack, all split-real.

    Args:
      spec: static StackSpec.  ``spec.homogeneous`` flags layers that are
        uniform media: they read scalars from ``eps_scalars``/
        ``mu_scalars`` (in stack order) and skip the dense eig entirely
        (O(N) bdp assembly, class-API fast path; rcwa.py:156-168).
      freq: real scalar (1/length).
      inc_ang, azi_ang: real scalars (radians).
      eps_grids: pair of [n_patterned, nx, ny] real arrays (re, im parts
        of the patterned layers' permittivity rasters, in stack order).
      thicknesses: [n_layers] real (ALL layers).
      eps_in / eps_out: cladding permittivity pairs (re, im) scalars, if
        spec.has_input / has_output.
      mu_grids: optional pair of [n_patterned, nx, ny] permeability
        rasters (None -> mu = 1 structure exploited, rcwa.py:146-170).
      eps_scalars / mu_scalars: pairs of [n_homogeneous] scalars for the
        homogeneous layers (mu_scalars None -> mu = 1).
      mu_in / mu_out: cladding permeability pairs (None -> 1).
      with_modes: also propagate the per-layer mode-coupling matrices C
        through the Redheffer fold (rcwa.py:1296-1304) so internal fields
        can be reconstructed (fields.field_plane_pair); costs extra GEMMs
        per fold step.
      avoid_pinv_instability / max_pinv_instability: arm the reference's
        runtime fallback (rcwa.py:1249-1262) on every patterned layer —
        when max|P P^-1 - I| exceeds the threshold (near-singular P at a
        Wood anomaly) the H eigenvectors switch to the equivalent
        H = Q E Kz^-1 formula.  The stop-gradient per-layer metrics are
        returned in ``internals['pinv_instability']``.
      fold: 'unroll' | 'scan' | 'auto' — how the Redheffer fold over
        layers is built.  'scan' compiles one lax.scan star-product body
        regardless of layer count (deep stacks); 'auto' picks scan at
        >= 8 layers.  Both produce identical results.

    Returns:
      S blocks [S11, S21, S12, S22] as dense pairs, plus a dict of
      layer internals for field reconstruction / diagnostics.
    """
    # S-matrix algebra is precision-critical (repeated inverses of nearly
    # unitary blocks); TPU's default f32 matmul runs in bf16 passes, so pin
    # full float32 accumulation for everything traced here.
    with jax.default_matmul_precision('highest'):
        return _solve_stack_pair_impl(spec, freq, inc_ang, azi_ang, eps_grids,
                                      thicknesses, eps_in, eps_out, broadening,
                                      eig_backend, mu_grids, eps_scalars,
                                      mu_scalars, mu_in, mu_out, with_modes,
                                      avoid_pinv_instability,
                                      max_pinv_instability, fold)


def _solve_stack_pair_impl(spec, freq, inc_ang, azi_ang, eps_grids,
                           thicknesses, eps_in, eps_out, broadening,
                           eig_backend, mu_grids=None, eps_scalars=None,
                           mu_scalars=None, mu_in=None, mu_out=None,
                           with_modes=False, avoid_pinv=False,
                           max_pinv=0.005, fold='auto'):
    order, L = spec.order, spec.L
    rdtype = (eps_grids[0].dtype if eps_grids is not None
              and np.size(eps_grids[0]) else eps_scalars[0].dtype)
    N = (2 * order[0] + 1) * (2 * order[1] + 1)
    omega = 2 * PI_REF * freq
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    if mu_in is None:
        mu_in = one
    if mu_out is None:
        mu_out = one

    hmask = spec.homogeneous if spec.homogeneous else (
        (False,) * spec.n_layers)
    if len(hmask) != spec.n_layers:
        raise ValueError('spec.homogeneous length != n_layers')

    if spec.has_input:
        n_ref = cplx.csqrt(cplx.cmul(eps_in, mu_in))[0]
    else:
        n_ref = jnp.asarray(1., rdtype)
    kx, ky = kvectors_real(freq, inc_ang, azi_ang, n_ref, order, L, rdtype)
    kxp = (kx, jnp.zeros_like(kx))
    kyp = (ky, jnp.zeros_like(ky))

    kz_f = _kz_pair(one, kx, ky)
    Vf = vmat_pair(kx, ky, kz_f)
    Vf_inv = _bdp_inv(Vf)

    n_pat = int(np.sum(~np.asarray(hmask, bool))) if spec.n_layers else 0
    n_hom = spec.n_layers - n_pat

    # ---- patterned layers: vmapped conv + one batched eig ---------------
    pat_sols = None
    conv = None
    mu_conv = None
    if n_pat:
        nx, ny = eps_grids[0].shape[-2:]
        conv = jax.vmap(lambda gr, gi: dft_conv_pair((gr, gi), order,
                                                     nx, ny))(
            eps_grids[0], eps_grids[1])
        t_pat = thicknesses[np.flatnonzero(~np.asarray(hmask, bool))]
        if mu_grids is not None:
            mu_conv = jax.vmap(
                lambda gr, gi: dft_conv_pair((gr, gi), order, nx, ny))(
                mu_grids[0], mu_grids[1])

            def one_layer(cr, ci, mr, mi, t):
                return layer_smatrix_pair((cr, ci), kx, ky, Vf_inv, omega,
                                          t, broadening, eig_backend,
                                          mu_conv=(mr, mi),
                                          need_modes=with_modes,
                                          avoid_pinv=avoid_pinv,
                                          max_pinv=max_pinv)
            args = (conv[0], conv[1], mu_conv[0], mu_conv[1], t_pat)
        else:
            def one_layer(cr, ci, t):
                return layer_smatrix_pair((cr, ci), kx, ky, Vf_inv, omega,
                                          t, broadening, eig_backend,
                                          need_modes=with_modes,
                                          avoid_pinv=avoid_pinv,
                                          max_pinv=max_pinv)
            args = (conv[0], conv[1], t_pat)
        if n_pat > 1:
            pat_sols = jax.vmap(one_layer)(*args)
        else:
            pat_sols = jax.tree.map(
                lambda x: x[None], one_layer(*(a[0] for a in args)))
        if avoid_pinv:
            # split the per-layer stop-gradient metrics off the field tuple
            # so the downstream stack/index bookkeeping stays uniform with
            # the homogeneous layers (which have no Pinv fallback)
            pat_ins = pat_sols[-1]
            pat_sols = pat_sols[:-1]

    # ---- homogeneous layers: O(N) bdp assembly, densified for the fold --
    hom_sols = None
    if n_hom:
        from .core import layer_smatrix_homogeneous
        t_hom = thicknesses[np.flatnonzero(np.asarray(hmask, bool))]
        if mu_scalars is None:
            mu_scalars = (jnp.ones((n_hom,), rdtype),
                          jnp.zeros((n_hom,), rdtype))

        def one_hom(er, ei, mr, mi, t):
            sol = layer_smatrix_homogeneous((er, ei), (mr, mi), kxp, kyp,
                                            Vf, omega, t)
            mode_part = (_bdp_dense(sol.G), _bdp_dense(sol.D)) \
                if with_modes else ()
            return (_bdp_dense(sol.S11), _bdp_dense(sol.S21)) + mode_part + (
                sol.kz, _bdp_dense(sol.E_eigvec), _bdp_dense(sol.H_eigvec))

        hom_sols = jax.vmap(one_hom)(eps_scalars[0], eps_scalars[1],
                                     mu_scalars[0], mu_scalars[1], t_hom)

    # ---- interleave into stack order ------------------------------------
    def layer_fields(i):
        """Dense pairs of stack layer i: (S11, S21[, G, D], kz, E, H) —
        the G, D slots are present only when ``with_modes``."""
        if hmask[i]:
            j = int(np.sum(np.asarray(hmask[:i], bool)))
            return jax.tree.map(lambda x: x[j], hom_sols)
        j = int(np.sum(~np.asarray(hmask[:i], bool)))
        return jax.tree.map(lambda x: x[j], pat_sols)

    # the per-layer sliced views are only needed by the unrolled fold and
    # by mixed (patterned+homogeneous) stack interleaving; building them on
    # the scanned uniform path would add O(L) slice eqns to the graph
    use_scan = spec.n_layers > 1 and (
        fold == 'scan' or (fold == 'auto' and spec.n_layers >= 8))
    mixed = n_pat > 0 and n_hom > 0
    per_layer = ([layer_fields(i) for i in range(spec.n_layers)]
                 if (not use_scan or mixed) else None)

    def stack_leaf(k):
        # uniform stacks are already stacked by the vmap — reuse directly
        # so graph size stays independent of layer count
        if n_hom == 0 and pat_sols is not None:
            return pat_sols[k]
        if n_pat == 0 and hom_sols is not None:
            return hom_sols[k]
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[pl[k] for pl in per_layer])

    internals = dict(kx=kx, ky=ky, kz_f=kz_f, Vf=Vf)
    if avoid_pinv and n_pat:
        internals['pinv_instability'] = pat_ins
    if spec.n_layers:
        base = 4 if with_modes else 2
        if with_modes:
            internals.update(G=stack_leaf(2), D=stack_leaf(3))
        internals.update(kz=stack_leaf(base), E=stack_leaf(base + 1),
                         H=stack_leaf(base + 2))
        # eps conv matrices of ALL layers in stack order (homogeneous ->
        # eps * I), for diagnostics / field reconstruction
        eye = jnp.eye(N, dtype=rdtype)
        if n_hom == 0:
            internals['conv'] = conv
            if mu_conv is not None:
                internals['mu_conv'] = mu_conv
            else:
                internals['mu_conv'] = (
                    jnp.broadcast_to(eye, (spec.n_layers, N, N)),
                    jnp.zeros((spec.n_layers, N, N), rdtype))
        else:
            conv_all_r, conv_all_i = [], []
            mu_all_r, mu_all_i = [], []
            for i in range(spec.n_layers):
                if hmask[i]:
                    j = int(np.sum(np.asarray(hmask[:i], bool)))
                    conv_all_r.append(eps_scalars[0][j] * eye)
                    conv_all_i.append(eps_scalars[1][j] * eye)
                    mu_all_r.append(mu_scalars[0][j] * eye)
                    mu_all_i.append(mu_scalars[1][j] * eye)
                else:
                    j = int(np.sum(~np.asarray(hmask[:i], bool)))
                    conv_all_r.append(conv[0][j])
                    conv_all_i.append(conv[1][j])
                    if mu_conv is not None:
                        mu_all_r.append(mu_conv[0][j])
                        mu_all_i.append(mu_conv[1][j])
                    else:
                        mu_all_r.append(eye)
                        mu_all_i.append(jnp.zeros_like(eye))
            internals['conv'] = (jnp.stack(conv_all_r),
                                 jnp.stack(conv_all_i))
            internals['mu_conv'] = (jnp.stack(mu_all_r),
                                    jnp.stack(mu_all_i))

    def dense_C(pl):
        """(Cf, Cb) = ([G; D], [D; G]) dense [4N, 2N] pairs."""
        G_, D_ = pl[2], pl[3]
        cat = lambda a, b: (jnp.concatenate([a[0], b[0]], axis=0),
                            jnp.concatenate([a[1], b[1]], axis=0))
        return (cat(G_, D_), cat(D_, G_))

    from .core import redheffer_update_modes

    # ---- Redheffer fold over layers (+ optional C propagation) ----------
    # 'auto' switched to the lax.scan fold for deep stacks above: the
    # unrolled fold's graph (and with_modes C updates, O(L^2) nodes) grows
    # with layer count while the scan fold compiles one star-product body
    Cstk = None
    if use_scan:
        GDs = (internals['G'], internals['D']) if with_modes else None
        S, Cstk = _fold_layers_scan(stack_leaf(0), stack_leaf(1), GDs)
        C = []
    elif spec.n_layers:
        S = [per_layer[0][0], per_layer[0][1],
             per_layer[0][1], per_layer[0][0]]
        C = [dense_C(per_layer[0])] if with_modes else []
        for i in range(1, spec.n_layers):
            pl_i = per_layer[i]
            Sn = [pl_i[0], pl_i[1], pl_i[1], pl_i[0]]
            S_new, t1, t2 = redheffer_pair(S, Sn)
            if with_modes:
                C = redheffer_update_modes(C, [dense_C(pl_i)], S, Sn, t1, t2)
            S = S_new
    else:
        eyep = (jnp.eye(2 * N, dtype=rdtype),
                jnp.zeros((2 * N, 2 * N), rdtype))
        zerop = (jnp.zeros((2 * N, 2 * N), rdtype),
                 jnp.zeros((2 * N, 2 * N), rdtype))
        S = [eyep, zerop, zerop, eyep]
        C = []

    if spec.has_input:
        kz_i = _kz_pair(cplx.cmul(eps_in, mu_in), kx, ky)
        Vi = vmat_pair(kx, ky, kz_i)
        internals['Vi'] = Vi
        Sin = [_bdp_dense(b) for b in interface_in_pair(Vf, Vi)]
        S_new, t1, t2 = redheffer_pair(Sin, S)
        if with_modes:
            if Cstk is not None:
                Cstk = _stacked_modes_n(Cstk, Sin, S, t1, t2)
            else:
                C = redheffer_update_modes([], C, Sin, S, t1, t2)
        S = S_new

    if spec.has_output:
        kz_o = _kz_pair(cplx.cmul(eps_out, mu_out), kx, ky)
        Vo = vmat_pair(kx, ky, kz_o)
        internals['Vo'] = Vo
        Sout = [_bdp_dense(b) for b in interface_out_pair(Vf, Vo)]
        S_new, t1, t2 = redheffer_pair(S, Sout)
        if with_modes:
            if Cstk is not None:
                Cstk = _stacked_modes_m(Cstk, S, Sout, t1, t2)
            else:
                C = redheffer_update_modes(C, [], S, Sout, t1, t2)
        S = S_new

    if with_modes:
        if Cstk is not None:
            CF, CB = Cstk
            C = [((CF[0][i], CF[1][i]), (CB[0][i], CB[1][i]))
                 for i in range(spec.n_layers)]
        internals['C'] = C

    return S, internals


def source_fourier_pair(order, amplitude, orders, direction='forward',
                        notation='xy', kx=None, ky=None, eps_in=None,
                        mu_in=None, eps_out=None, mu_out=None,
                        rdtype=jnp.float32):
    """Incident Fourier amplitude vector for the functional path
    (split-real twin of rcwa.py:539-596 / solver.source_fourier).

    Args:
      order: (order_x, order_y).
      amplitude: [n_orders, 2] complex-like array (or (re, im) pair) of
        per-order (x, y) — or (p, s) — amplitudes.
      orders: [[m, n], ...] diffraction orders.
      notation: 'xy' or 'ps'; 'ps' needs kx/ky (real arrays from
        solve_stack_pair internals) + the relevant cladding eps/mu pairs.

    Returns an E_i cpair of shape [2N].
    """
    N = (2 * order[0] + 1) * (2 * order[1] + 1)
    if isinstance(amplitude, tuple):
        amp = (jnp.asarray(amplitude[0], rdtype).reshape(-1, 2),
               jnp.asarray(amplitude[1], rdtype).reshape(-1, 2))
    else:
        a = np.asarray(amplitude, dtype=np.complex128).reshape(-1, 2)
        amp = (jnp.asarray(a.real, rdtype), jnp.asarray(a.imag, rdtype))
    idx = _match(orders, order)

    def scatter(comp):
        v = jnp.zeros((2 * N,), rdtype)
        v = v.at[idx].set(comp[:, 0])
        return v.at[idx + N].set(comp[:, 1])

    E_i = (scatter(amp[0]), scatter(amp[1]))
    if notation == 'ps':
        one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
        if direction == 'forward':
            eps = eps_in if eps_in is not None else one
            mu = mu_in if mu_in is not None else one
            sign = 1.
        else:
            eps = eps_out if eps_out is not None else one
            mu = mu_out if mu_out is not None else one
            sign = -1.
        em = cplx.cmul(eps, mu)
        kt = jnp.sqrt(kx ** 2 + ky ** 2)
        kzc = cplx.csqrt((em[0] - kx ** 2 - ky ** 2,
                          em[1] + jnp.zeros_like(kx)))
        kz = sign * jnp.abs(kzc[0])
        inc = jnp.arctan2(kt, kz)
        azi = jnp.arctan2(ky, kx)
        # ps->xy block-diagonal conversion (rcwa.py:589-594); real-valued
        ex = jnp.cos(inc) * jnp.cos(azi) * E_i[0][:N] - jnp.sin(azi) * E_i[0][N:]
        ey = jnp.cos(inc) * jnp.sin(azi) * E_i[0][:N] + jnp.cos(azi) * E_i[0][N:]
        exi = jnp.cos(inc) * jnp.cos(azi) * E_i[1][:N] - jnp.sin(azi) * E_i[1][N:]
        eyi = jnp.cos(inc) * jnp.sin(azi) * E_i[1][:N] + jnp.cos(azi) * E_i[1][N:]
        E_i = (jnp.concatenate([ex, ey]), jnp.concatenate([exi, eyi]))
    return E_i


def source_planewave_pair(order, amplitude=(1., 0.), direction='forward',
                          notation='xy', **kw):
    """Planewave source = Fourier source at order (0, 0) (rcwa.py:526-537)."""
    return source_fourier_pair(order, np.asarray(amplitude).reshape(1, 2),
                               [[0, 0]], direction, notation, **kw)


def sparam_xy_pair(S, kx, ky, eps_in, eps_out, order, orders, ref_order,
                   polarization='xx', direction='forward',
                   port='transmission', evanescent=1e-3,
                   mu_in=None, mu_out=None):
    """xy-polarization S-parameter extraction, split-real
    (rcwa.py:346-408 with power_norm=True).  Cladding kz uses
    eps*mu when mu_in/mu_out are given (solver.py parity)."""
    if mu_in is not None:
        eps_in = cplx.cmul(eps_in, mu_in)
    if mu_out is not None:
        eps_out = cplx.cmul(eps_out, mu_out)
    N = (2 * order[0] + 1) * (2 * order[1] + 1)
    oi = _match(orders, order)
    ri = _match(np.asarray(ref_order).reshape(1, 2), order)
    oi_p = oi + (N if polarization in ('yx', 'yy') else 0)
    ri_p = ri + (N if polarization in ('xy', 'yy') else 0)

    def kz_real(eps):
        kzc = cplx.csqrt((eps[0] - kx ** 2 - ky ** 2,
                          eps[1] + jnp.zeros_like(kx)))
        ev = jnp.abs(kzc[0] / kzc[1]) < evanescent
        v = jnp.where(ev, 0., kzc[0])
        return jnp.concatenate([v, v])

    kz_in = kz_real(eps_in)
    kz_out = kz_real(eps_out)
    kxr = jnp.concatenate([kx, kx])
    kyr = jnp.concatenate([ky, ky])
    pol_map = {'xx': (kxr, kxr), 'xy': (kxr, kyr),
               'yx': (kyr, kxr), 'yy': (kyr, kyr)}
    num_pol, den_pol = pol_map[polarization]
    sel = {('forward', 'transmission'): (kz_out, kz_in, 0),
           ('forward', 'reflection'): (kz_in, kz_in, 1),
           ('backward', 'reflection'): (kz_out, kz_out, 2),
           ('backward', 'transmission'): (kz_in, kz_out, 3)}
    num_kz, den_kz, blk = sel[(direction, port)]
    norm = jnp.sqrt((1 + (num_pol[oi_p] / num_kz[oi_p]) ** 2)
                    / (1 + (den_pol[ri_p] / den_kz[ri_p]) ** 2))
    norm = norm * jnp.sqrt(num_kz[oi_p] / den_kz[ri_p])
    sr = S[blk][0][oi_p, ri_p] * norm
    si = S[blk][1][oi_p, ri_p] * norm
    bad = ~jnp.isfinite(sr) | ~jnp.isfinite(si)
    return jnp.where(bad, 0., sr), jnp.where(bad, 0., si)


def _match(orders, order):
    orders = np.asarray(orders, dtype=np.int64).reshape(-1, 2)
    m = np.clip(orders[:, 0], -order[0], order[0])
    n = np.clip(orders[:, 1], -order[1], order[1])
    return (2 * order[1] + 1) * (m + order[0]) + (n + order[1])


# ---------------------------------------------------------------------------
# Convenience: Example1-shaped forward (the benchmark workload)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('spec', 'eig_backend'))
def simulate_txx(spec: StackSpec, freq, eps_grid_re, eps_grid_im,
                 thickness, eps_in_re, eig_backend='auto'):
    """|t_xx|^2 of the (0,0) order for one patterned layer on a substrate —
    the Example1 per-wavelength workload (fwd path of the benchmark)."""
    eps_in = (eps_in_re, jnp.asarray(0., eps_grid_re.dtype))
    S, internals = solve_stack_pair(
        spec, freq, jnp.asarray(0., eps_grid_re.dtype),
        jnp.asarray(0., eps_grid_re.dtype),
        (eps_grid_re[None], eps_grid_im[None]), thickness[None],
        eps_in=eps_in, eig_backend=eig_backend)
    one = (jnp.asarray(1., eps_grid_re.dtype), jnp.asarray(0., eps_grid_re.dtype))
    tr, ti = sparam_xy_pair(S, internals['kx'], internals['ky'], eps_in, one,
                            spec.order, [0, 0], [0, 0], 'xx')
    return (tr ** 2 + ti ** 2)[0]


def sparam_ps_pair(S, kx, ky, eps_in, eps_out, order, orders, ref_order,
                   polarization='pp', direction='forward',
                   port='transmission', evanescent=1e-3,
                   mu_in=None, mu_out=None):
    """ps-polarization S-parameter extraction, split-real
    (rcwa.py:410-521): gather xx/xy/yx/yy, recombine with per-order
    inclination/azimuth cosines, power-normalize.

    eps_in / eps_out: cladding permittivity pairs (re, im).  Cladding
    kz uses eps*mu when mu_in/mu_out are given.
    Returns (re, im) of the ps-basis amplitude at the selected orders.
    """
    if mu_in is not None:
        eps_in = cplx.cmul(eps_in, mu_in)
    if mu_out is not None:
        eps_out = cplx.cmul(eps_out, mu_out)
    N = (2 * order[0] + 1) * (2 * order[1] + 1)
    oi = _match(orders, order)
    ri = _match(np.asarray(ref_order).reshape(1, 2), order)

    cfg = {('forward', 'transmission'): (0, 1., 1., 'out', 'in'),
           ('forward', 'reflection'): (1, -1., 1., 'in', 'in'),
           ('backward', 'reflection'): (2, 1., -1., 'out', 'out'),
           ('backward', 'transmission'): (3, -1., -1., 'in', 'out')}
    idx, o_sign, r_sign, o_side, r_side = cfg[(direction, port)]
    eps_side = {'in': eps_in, 'out': eps_out}

    def kz_angles(sel, k2_pair, sign):
        kxs, kys = kx[sel], ky[sel]
        kt = jnp.sqrt(kxs ** 2 + kys ** 2)
        kzc = cplx.csqrt((k2_pair[0] - kxs ** 2 - kys ** 2,
                          k2_pair[1] + jnp.zeros_like(kxs)))
        kz = sign * jnp.abs(kzc[0])
        evan = jnp.abs(kzc[0] / kzc[1]) < evanescent
        inc = jnp.arctan2(kt, kz)
        azi = jnp.arctan2(kys, kxs)
        return inc, azi, evan

    o_inc, o_azi, o_evan = kz_angles(oi, eps_side[o_side], o_sign)
    r_inc, r_azi, r_evan = kz_angles(ri, eps_side[r_side], r_sign)

    def gather(block, a, b):
        return block[0][a, b], block[1][a, b]

    xx = gather(S[idx], oi, ri)
    xy = gather(S[idx], oi, ri + N)
    yx = gather(S[idx], oi + N, ri)
    yy = gather(S[idx], oi + N, ri + N)
    zero = lambda p: (jnp.where(o_evan, 0., p[0]), jnp.where(o_evan, 0., p[1]))
    xx, xy, yx, yy = map(zero, (xx, xy, yx, yy))

    co, so = jnp.cos(o_azi), jnp.sin(o_azi)
    ci = jnp.cos(o_inc)
    cr, sr = jnp.cos(r_azi), jnp.sin(r_azi)
    cri = jnp.cos(r_inc)
    # real coefficient recombination (angles are real; rcwa.py:466-485)
    coeff = {
        'pp': (co / ci * cri * cr, so / ci * cri * cr,
               co / ci * cri * sr, so / ci * cri * sr),
        'ps': (co / ci * (-sr), so / ci * (-sr),
               co / ci * cr, so / ci * cr),
        'sp': (-so * cri * cr, co * cri * cr,
               -so * cri * sr, co * cri * sr),
        'ss': (-so * (-sr), co * (-sr), -so * cr, co * cr),
    }[polarization]
    Sr = (coeff[0] * xx[0] + coeff[1] * yx[0]
          + coeff[2] * xy[0] + coeff[3] * yy[0])
    Si = (coeff[0] * xx[1] + coeff[1] * yx[1]
          + coeff[2] * xy[1] + coeff[3] * yy[1])

    def kz_real(eps, keep_abs_for_evan):
        kzc = cplx.csqrt((eps[0] - kx ** 2 - ky ** 2,
                          eps[1] + jnp.zeros_like(kx)))
        ev = jnp.abs(kzc[0] / kzc[1]) < evanescent
        if keep_abs_for_evan:
            # the reference's ps branch keeps |Re kz| for evanescent
            # OUTPUT orders instead of zeroing (rcwa.py:495)
            v = jnp.where(ev, jnp.abs(kzc[0]), kzc[0])
        else:
            v = jnp.where(ev, 0., kzc[0])
        return v

    kz_in = kz_real(eps_in, False)
    kz_out = kz_real(eps_out, True)
    sel = {('forward', 'transmission'): (kz_out, kz_in),
           ('forward', 'reflection'): (kz_in, kz_in),
           ('backward', 'reflection'): (kz_out, kz_out),
           ('backward', 'transmission'): (kz_in, kz_out)}
    num_kz, den_kz = sel[(direction, port)]
    norm = jnp.sqrt(num_kz[oi] / den_kz[ri])
    Sr = Sr * norm
    Si = Si * norm
    bad = ~jnp.isfinite(Sr) | ~jnp.isfinite(Si) | r_evan
    return jnp.where(bad, 0., Sr), jnp.where(bad, 0., Si)
