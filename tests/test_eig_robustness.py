"""Eigensolver robustness: non-convergence must surface, hard spectra
must still converge.

The reference gets LAPACK/MAGMA zgeev semantics for free (nonzero INFO
raises, /root/reference/torcwa/rcwa.py:1236 via torch.linalg.eig); our
QR kernels run a bounded iteration under jit and historically exited
silently.  These tests pin the NaN-poisoning contract (VERDICT r1 weak
item 4) and exercise adversarial spectra: defective/Jordan-ish blocks
and tightly clustered eigenvalues at n >= 256.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops import eig_qr_real as eqr
from torcwa_tpu.ops.eig_qr_pallas import schur_qr_pallas_acc


def _eig_pallas_interp(Ar, Ai, max_iter_factor=40, return_stats=False):
    Hr, Hi, Qr, Qi = jax.jit(eqr.hessenberg_real)(Ar, Ai)
    out = schur_qr_pallas_acc(Hr[None], Hi[None], Qr[None], Qi[None],
                              max_iter_factor=max_iter_factor,
                              interpret=True, return_stats=return_stats)
    return out


@pytest.mark.slow
def test_nonconvergence_poisons_with_nan_pallas():
    """A starved iteration budget must yield NaN eigenvalues + a nonzero
    window stat, not silent garbage."""
    rng = np.random.default_rng(3)
    n = 24
    Ar = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Tr, Ti, Zr, Zi, (hi_f, sweeps) = _eig_pallas_interp(
        Ar, Ai, max_iter_factor=0, return_stats=True)
    assert int(hi_f[0]) > 0
    assert np.isnan(np.asarray(jnp.diagonal(Tr[0]))).all()

    # with the normal budget the same matrix converges, stat reads 0
    Tr, Ti, Zr, Zi, (hi_f, sweeps) = _eig_pallas_interp(
        Ar, Ai, return_stats=True)
    assert int(hi_f[0]) == 0
    assert int(sweeps[0]) > 0
    assert np.isfinite(np.asarray(jnp.diagonal(Tr[0]))).all()


def test_antisymmetric_real_converges_batched():
    """A real antisymmetric matrix (pure-imaginary spectrum) through the
    BATCHED kernel: the exactly-real iteration must take the complex
    discriminant branch once the stall gate opens (eig_qr_pallas
    _CPLX_STALL) — with jnp.sign(0) semantics it never converged at all,
    and with an ungated complex branch real-spectrum lanes pay ~15% more
    sweeps (the round-2 order-6 bench regression)."""
    rng = np.random.default_rng(3)
    n = 24
    B = rng.standard_normal((n, n))
    A = B - B.T
    Ar = jnp.asarray(A, jnp.float32)
    Ai = jnp.zeros_like(Ar)
    Tr, Ti, _, _, (hi_f, sweeps) = _eig_pallas_interp(
        Ar, Ai, return_stats=True)
    assert int(hi_f[0]) == 0
    w = (np.asarray(jnp.diagonal(Tr[0]))
         + 1j * np.asarray(jnp.diagonal(Ti[0])))
    assert np.isfinite(w).all()
    _check_eigvals(A, w, 1e-4)


@pytest.mark.slow
def test_nonconvergence_poisons_with_nan_xla():
    rng = np.random.default_rng(5)
    n = 16
    Ar = jnp.asarray(rng.standard_normal((n, n)), jnp.float64)
    Ai = jnp.asarray(rng.standard_normal((n, n)), jnp.float64)
    Hr, Hi, Qr, Qi = eqr.hessenberg_real(Ar, Ai)
    Tr, Ti, _, _ = eqr.schur_qr_real(Hr, Hi, Qr, Qi, max_iter_factor=0)
    assert np.isnan(np.asarray(jnp.diagonal(Tr))).all()
    Tr, Ti, _, _ = eqr.schur_qr_real(Hr, Hi, Qr, Qi)
    assert np.isfinite(np.asarray(jnp.diagonal(Tr))).all()


def _check_eigvals(A, w, tol):
    w0 = np.linalg.eigvals(np.asarray(A).astype(np.complex128))
    # match greedily (spectra may be permuted)
    w = np.asarray(w).copy()
    for wi in w0:
        j = np.argmin(np.abs(w - wi))
        assert np.abs(w[j] - wi) < tol, (wi, w[j])
        w[j] = np.inf


@pytest.mark.parametrize('kind', ['jordan', 'clustered', 'defective_mix'])
def test_adversarial_spectra_small(kind):
    """Defective/Jordan-ish and clustered spectra: eigenvalues stay
    accurate (eigenvectors of defective matrices are ill-posed; only the
    spectrum is pinned, as LAPACK does)."""
    n = 24
    rng = np.random.default_rng(7)
    if kind == 'jordan':
        A = np.eye(n, dtype=np.complex128) * (1.5 + 0.5j)
        A += np.diag(np.ones(n - 1), 1)          # one big Jordan block
    elif kind == 'clustered':
        lam = 2.0 + 1e-4 * rng.standard_normal(n) \
            + 1j * 1e-4 * rng.standard_normal(n)
        X = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        A = X @ np.diag(lam) @ np.linalg.inv(X)
    else:
        # two Jordan blocks + a cluster, similarity-transformed
        d = np.ones(n, dtype=np.complex128)
        d[: n // 2] = -0.7 + 0.2j
        A = np.diag(d) + np.diag(np.r_[np.ones(n // 2 - 1), 0,
                                       np.ones(n - n // 2 - 1)] * 0.5, 1)
        X = np.eye(n) + 0.1 * rng.standard_normal((n, n))
        A = np.linalg.solve(X, A @ X)

    Ar = jnp.asarray(A.real, jnp.float32)
    Ai = jnp.asarray(A.imag, jnp.float32)
    Tr, Ti, _, _ = _eig_pallas_interp(Ar, Ai)
    w = (np.asarray(jnp.diagonal(Tr[0]))
         + 1j * np.asarray(jnp.diagonal(Ti[0])))
    assert np.isfinite(w).all()
    # Jordan blocks perturb eigenvalues as eps^(1/k): float32 eps^(1/24)
    # is O(0.5), so pin against LAPACK-at-f32-input instead of exact values
    w0 = np.linalg.eigvals((Ar.astype(np.float64)
                            + 1j * np.asarray(Ai, np.float64)))
    tol = {'jordan': 0.35, 'clustered': 5e-3, 'defective_mix': 0.25}[kind]
    _check_eigvals(np.asarray(A), w0, 10 * tol)   # sanity on the oracle
    w_sorted = np.sort_complex(w)
    w0_sorted = np.sort_complex(w0)
    assert np.max(np.abs(w_sorted - w0_sorted)) < tol


@pytest.mark.slow
def test_clustered_spectrum_n256_xla():
    """Clustered spectrum at production scale (n=256), float64 XLA path."""
    n = 256
    rng = np.random.default_rng(11)
    lam = np.concatenate([
        np.full(n // 2, 1.0 + 0.3j) + 1e-6 * rng.standard_normal(n // 2),
        3.0 * rng.standard_normal(n // 2) + 1j * rng.standard_normal(n // 2),
    ])
    X = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = X @ np.diag(lam) @ np.linalg.inv(X)
    Ar = jnp.asarray(A.real, jnp.float64)
    Ai = jnp.asarray(A.imag, jnp.float64)
    wr, wi, Vr, Vi = eqr.eig_qr_real(Ar, Ai)
    w = np.asarray(wr) + 1j * np.asarray(wi)
    assert np.isfinite(w).all()
    V = np.asarray(Vr) + 1j * np.asarray(Vi)
    res = np.linalg.norm(A @ V - V * w[None, :], axis=0).max()
    assert res < 1e-8 * np.abs(w).max(), res
