"""Multishift Schur QR kernel (eig_qr_pallas_ms): correctness in the
Pallas interpreter against LAPACK, including shifted-window spectra and
the non-convergence NaN contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops import eig_qr_real as eqr
from torcwa_tpu.ops.eig_qr_pallas import eig_tri_vectors_pallas
from torcwa_tpu.ops.eig_qr_pallas_ms import schur_qr_pallas_ms

pytestmark = pytest.mark.slow


def _run(Ar, Ai, m, **kw):
    Hr, Hi, Qr, Qi = jax.jit(eqr.hessenberg_real)(Ar, Ai)
    return schur_qr_pallas_ms(Hr, Hi, Qr, Qi, m=m, interpret=True, **kw)


@pytest.mark.parametrize('n,m', [(16, 2), (32, 4), (96, 8)])
def test_random_spectra(n, m):
    rng = np.random.default_rng(n + m)
    Ar = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Tr, Ti, Zr, Zi, (hi_f, sweeps) = _run(Ar, Ai, m, return_stats=True)
    assert int(hi_f) == 0, 'did not converge'
    A = np.asarray(Ar) + 1j * np.asarray(Ai)
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    w0 = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    assert np.max(np.abs(np.sort_complex(w) - w0)) < 1e-4 * np.abs(w0).max()
    # Schur residual: Z^H A Z == T (upper triangular)
    Z = np.asarray(Zr) + 1j * np.asarray(Zi)
    T = np.asarray(Tr) + 1j * np.asarray(Ti)
    res = np.linalg.norm(Z.conj().T @ A @ Z - T) / np.linalg.norm(A)
    assert res < 5e-5, res
    # multishift must beat the single-shift sweep count materially
    assert int(sweeps) < 2 * n, int(sweeps)


def test_full_eig_via_multishift_plus_vectors():
    n, m = 64, 8
    rng = np.random.default_rng(0)
    Ar = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Tr, Ti, Zr, Zi = _run(Ar, Ai, m)
    Vr, Vi = eig_tri_vectors_pallas(Tr[None], Ti[None], Zr[None], Zi[None],
                                    interpret=True)
    A = np.asarray(Ar) + 1j * np.asarray(Ai)
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    V = np.asarray(Vr[0]) + 1j * np.asarray(Vi[0])
    res = np.linalg.norm(A @ V - V * w[None, :], axis=0).max()
    assert res < 5e-4 * np.abs(w).max(), res


def test_nonconvergence_nan_contract():
    n, m = 24, 4
    rng = np.random.default_rng(1)
    Ar = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Tr, Ti, _, _, (hi_f, _) = _run(Ar, Ai, m, max_iter_factor=-100,
                                   return_stats=True)
    assert int(hi_f) > 0
    assert np.isnan(np.asarray(jnp.diagonal(Tr))).all()
