"""Packed re|im lane-layout batched Schur QR (eig_qr_pallas_packed):
interpreter-mode correctness against LAPACK.

The kernel is a measured NEGATIVE result for routing (chip A/B at the
order-6 bench workload, b=8 n=338: acc 174 ms vs packed 206 ms at
comparable sweep counts 508-520 vs 484-503 — the per-op halving is
outweighed by 2x wider vregs plus the half-swap rolls and sign
multiplies; see NOTES_NEXT_ROUND.md).  It stays tested but unrouted,
like the batched-AED kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp

from torcwa_tpu.ops import eig_qr_real as eqr
from torcwa_tpu.ops.attic.eig_qr_pallas_packed import schur_qr_pallas_packed
import pytest


def _eig_err(w, w0):
    w = np.asarray(w).copy()
    errs = []
    for v in w0:
        i = np.argmin(np.abs(w - v))
        errs.append(abs(w[i] - v))
        w[i] = 1e30
    return max(errs) / max(np.abs(w0).max(), 1e-30)


@pytest.mark.slow
def test_packed_random_spectra():
    for n, b in [(16, 3), (48, 2), (96, 2)]:
        rng = np.random.default_rng(n)
        Ar = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
        Ai = jnp.asarray(rng.standard_normal((b, n, n)), jnp.float32)
        Hr, Hi, Qr, Qi = jax.vmap(jax.jit(eqr.hessenberg_real))(Ar, Ai)
        Tr, Ti, Zr, Zi, (hif, sw) = schur_qr_pallas_packed(
            Hr, Hi, Qr, Qi, interpret=True, return_stats=True)
        Vr, Vi = jax.vmap(eqr.eig_tri_vectors_real)(Tr, Ti, Zr, Zi)
        w = (np.asarray(jnp.diagonal(Tr, axis1=-2, axis2=-1))
             + 1j * np.asarray(jnp.diagonal(Ti, axis1=-2, axis2=-1)))
        V = np.asarray(Vr) + 1j * np.asarray(Vi)
        An = np.asarray(Ar) + 1j * np.asarray(Ai)
        for lane in range(b):
            assert int(hif[lane]) == 0, (n, lane)
            res = np.linalg.norm(An[lane] @ V[lane]
                                 - V[lane] * w[lane][None, :], axis=0).max()
            assert res < 5e-4 * np.abs(w[lane]).max(), (n, lane)
            w0 = np.linalg.eig(An[lane].astype(np.complex128))[0]
            assert _eig_err(w[lane], w0) < 2e-4, (n, lane)


@pytest.mark.slow
def test_packed_real_spectrum_and_repeated():
    """Real-eigenvalue and clustered matrices (the stall-gated complex
    shift path) converge and match LAPACK."""
    rng = np.random.default_rng(7)
    n, b = 32, 2
    # symmetric (real spectrum) in lane 0; clustered eigenvalues lane 1
    S = rng.standard_normal((n, n)).astype(np.float32)
    A0 = (S + S.T) / 2
    d = np.concatenate([np.full(n // 2, 2.0), np.full(n - n // 2, -1.0)])
    X = rng.standard_normal((n, n)).astype(np.float64)
    A1 = (X @ np.diag(d) @ np.linalg.inv(X)).astype(np.float32)
    Ar = jnp.asarray(np.stack([A0, A1]))
    Ai = jnp.zeros_like(Ar)
    Hr, Hi, Qr, Qi = jax.vmap(jax.jit(eqr.hessenberg_real))(Ar, Ai)
    Tr, Ti, Zr, Zi, (hif, _) = schur_qr_pallas_packed(
        Hr, Hi, Qr, Qi, interpret=True, return_stats=True)
    assert np.all(np.asarray(hif) == 0)
    w = (np.asarray(jnp.diagonal(Tr, axis1=-2, axis2=-1))
         + 1j * np.asarray(jnp.diagonal(Ti, axis1=-2, axis2=-1)))
    for lane, A in enumerate([A0, A1]):
        w0 = np.linalg.eigvals(A.astype(np.complex128))
        assert _eig_err(w[lane], w0) < 5e-4, lane
