"""Batched AED + multishift Schur QR kernel (eig_qr_pallas_baed):
correctness in the Pallas interpreter against LAPACK, per-lane window
independence, real/complex spectra, and the non-convergence NaN contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops import eig_qr_real as eqr
from torcwa_tpu.ops.eig_qr_pallas import eig_tri_vectors_pallas
from torcwa_tpu.ops.attic.eig_qr_pallas_baed import schur_qr_pallas_baed

pytestmark = pytest.mark.slow


def _run(Ar, Ai, m, kw, **kw_):
    Hr, Hi, Qr, Qi = jax.vmap(jax.jit(eqr.hessenberg_real))(Ar, Ai)
    return schur_qr_pallas_baed(Hr, Hi, Qr, Qi, m=m, kw=kw,
                                interpret=True, **kw_)


def _eig_err(w, w0):
    """Greedy nearest matching (sort_complex misorders conjugate pairs
    whose real parts differ only at f32 roundoff)."""
    w = np.asarray(w).copy()
    errs = []
    for v in w0:
        i = np.argmin(np.abs(w - v))
        errs.append(abs(w[i] - v))
        w[i] = 1e30
    return max(errs) / max(np.abs(w0).max(), 1e-30)


def _check(Ar, Ai, Tr, Ti, Zr, Zi, tol=1e-4):
    b, n = Ar.shape[0], Ar.shape[-1]
    for l in range(b):
        A = np.asarray(Ar[l]) + 1j * np.asarray(Ai[l])
        Z = np.asarray(Zr[l]) + 1j * np.asarray(Zi[l])
        T = np.asarray(Tr[l]) + 1j * np.asarray(Ti[l])
        # unitary Z + small Schur residual + triangular T => backward-stable
        assert np.linalg.norm(Z.conj().T @ Z - np.eye(n)) < 5e-4, l
        nrm = max(np.linalg.norm(A), 1e-30)
        assert np.linalg.norm(Z.conj().T @ A @ Z - T) / nrm < 5e-5, l
        assert np.all(np.tril(T, -1) == 0), l
        w0 = np.linalg.eigvals(A.astype(np.complex128))
        assert _eig_err(np.diagonal(T), w0) < tol, l


@pytest.mark.parametrize('n,b,m,kw', [(48, 2, 4, 32), (96, 2, 8, 32)])
def test_random_spectra(n, b, m, kw):
    rng = np.random.default_rng(n + b)
    Ar = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
    Tr, Ti, Zr, Zi, (hi_f, sweeps) = _run(Ar, Ai, m, kw, return_stats=True)
    assert np.all(np.asarray(hi_f) == 0), 'did not converge'
    _check(Ar, Ai, Tr, Ti, Zr, Zi)
    # AED + multishift must need far fewer sweeps than ~1.1n single-shift
    assert np.max(np.asarray(sweeps)) < n, np.asarray(sweeps)


def test_real_and_antisymmetric_lanes():
    """Exactly-real input (conjugate-pair spectra) alongside an
    antisymmetric lane (pure-imaginary spectrum, the historical stall
    case) — per-lane windows at different positions in one batch."""
    n, m, kw = 64, 4, 32
    rng = np.random.default_rng(3)
    A0 = rng.standard_normal((n, n)).astype(np.float32)
    B = rng.standard_normal((n, n)).astype(np.float32)
    A1 = B - B.T
    Ar = jnp.asarray(np.stack([A0, A1]))
    Ai = jnp.zeros_like(Ar)
    Tr, Ti, Zr, Zi, (hi_f, _) = _run(Ar, Ai, m, kw, return_stats=True)
    assert np.all(np.asarray(hi_f) == 0)
    _check(Ar, Ai, Tr, Ti, Zr, Zi)


def test_full_eig_with_vectors():
    n, b, m, kw = 64, 2, 8, 32
    rng = np.random.default_rng(0)
    Ar = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
    Tr, Ti, Zr, Zi = _run(Ar, Ai, m, kw)
    Vr, Vi = eig_tri_vectors_pallas(Tr, Ti, Zr, Zi, interpret=True)
    for l in range(b):
        A = np.asarray(Ar[l]) + 1j * np.asarray(Ai[l])
        w = (np.asarray(jnp.diagonal(Tr[l]))
             + 1j * np.asarray(jnp.diagonal(Ti[l])))
        V = np.asarray(Vr[l]) + 1j * np.asarray(Vi[l])
        res = np.linalg.norm(A @ V - V * w[None, :], axis=0).max()
        assert res < 5e-4 * np.abs(w).max(), (l, res)


def test_nonconvergence_nan_contract():
    n, m, kw = 48, 4, 32
    rng = np.random.default_rng(1)
    Ar = jnp.asarray(rng.standard_normal((2, n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((2, n, n)), jnp.float32)
    Tr, Ti, _, _, (hi_f, _) = _run(Ar, Ai, m, kw, max_iter_factor=-100,
                                   return_stats=True)
    assert np.all(np.asarray(hi_f) > 0)
    assert np.all(np.isnan(np.asarray(jnp.diagonal(Tr, axis1=1, axis2=2))))


def test_small_n_raises():
    with pytest.raises(ValueError):
        schur_qr_pallas_baed(jnp.zeros((1, 32, 32)), jnp.zeros((1, 32, 32)),
                             jnp.zeros((1, 32, 32)), jnp.zeros((1, 32, 32)),
                             kw=64)
