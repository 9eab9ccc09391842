"""HBM-resident large-n eig pipeline (interpret mode) + the shift-sort
regression that stalled both multishift kernels.

The HBM kernel is the production eigensolver above the VMEM ceiling
(eig_qr_real._HBM_MIN_N); these tests run its multi-window path — windows
smaller than the matrix, slab updates, parked bulges — which no single
window configuration exercises.  Reference semantics: LAPACK zgeev behind
/root/reference/torcwa/rcwa.py:1236.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops.eig_qr_real import hessenberg_real
from torcwa_tpu.ops.eig_qr_hbm import schur_qr_hbm
from torcwa_tpu.ops.vec_blocked import eig_tri_vectors_blocked


def _random_pair(n, seed, scale=0.3):
    rng = np.random.default_rng(seed)
    Ar = jnp.asarray(rng.standard_normal((n, n)) * scale, jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)) * scale, jnp.float32)
    return Ar, Ai


@pytest.mark.slow
def test_hbm_multiwindow_full_pipeline():
    """n padded past wb forces >= 2 overlapping chase windows per sweep."""
    n = 260                       # pads to 384 > wb=256 -> multi-window
    Ar, Ai = _random_pair(n, 3)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        Tr, Ti, Zr, Zi, (hi_f, sweeps, aed_d, skipped, multi) = schur_qr_hbm(
            Hr, Hi, Qr, Qi, m=8, wb=256, interpret=True, return_stats=True)
        Vr, Vi = eig_tri_vectors_blocked(Tr, Ti, Zr, Zi, block=128,
                                         interpret=True)
    assert int(hi_f) == 0, f'not converged: hi_f={int(hi_f)}'
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    A = np.asarray(Ar) + 1j * np.asarray(Ai)
    w_ref = np.sort_complex(np.linalg.eigvals(A))
    assert np.isfinite(w).all()
    assert np.max(np.abs(np.sort_complex(w) - w_ref)) < 1e-3
    # Schur factorization residual: Z T Z^H = A (Hessenberg-similar)
    Z = (np.asarray(Zr) + 1j * np.asarray(Zi))
    T = (np.asarray(Tr) + 1j * np.asarray(Ti))
    H = (np.asarray(Hr) + 1j * np.asarray(Hi))
    # eigenvector residual on sampled columns
    V = np.asarray(Vr) + 1j * np.asarray(Vi)
    cols = [0, 1, n // 2, n - 2, n - 1]
    res = np.abs(A @ V[:, cols] - V[:, cols] * w[None, cols]).max()
    assert res < 5e-3, f'eigenvector residual {res}'


@pytest.mark.slow
def test_ms_zero_diagonal_endgame():
    """Shift-sort regression: an antisymmetric real matrix has a zero
    diagonal in Hessenberg form, so the Wilkinson anchor M[hi, hi] is ~0
    and the padding lanes of the trailing shift block (eigenvalue 0) used
    to sort ahead of every true shift — the final 2x2 windows (eigenvalues
    +-i lambda) then cycled forever on zero shifts."""
    from torcwa_tpu.ops.eig_qr_pallas_ms import schur_qr_pallas_ms
    n = 64
    rng = np.random.default_rng(0)
    M = rng.standard_normal((n, n)).astype(np.float32)
    A = (M - M.T) / 2.            # spectrum: conjugate pairs +- i lambda
    Ar = jnp.asarray(A, jnp.float32)
    Ai = jnp.zeros_like(Ar)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        Tr, Ti, Zr, Zi = schur_qr_pallas_ms(Hr, Hi, Qr, Qi, m=16,
                                            interpret=True)
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    assert np.isfinite(w).all(), 'NaN-poisoned: endgame did not converge'
    w_ref = np.linalg.eigvals(A.astype(np.complex128))
    # spectrum is +-i lambda: compare imag parts sorted (sort_complex
    # would shuffle pair members through noise-level real parts)
    assert np.abs(w.real).max() < 1e-3
    assert np.max(np.abs(np.sort(w.imag) - np.sort(w_ref.imag))) < 1e-3


@pytest.mark.slow
def test_hbm_zero_diagonal_endgame():
    """Same regression through the HBM kernel."""
    n = 96
    rng = np.random.default_rng(1)
    M = rng.standard_normal((n, n)).astype(np.float32)
    A = (M - M.T) / 2.
    Ar = jnp.asarray(A, jnp.float32)
    Ai = jnp.zeros_like(Ar)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        Tr, Ti, Zr, Zi, (hi_f, _, _aed, _sk, _mr) = schur_qr_hbm(
            Hr, Hi, Qr, Qi, m=8, wb=256, interpret=True, return_stats=True)
    assert int(hi_f) == 0
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    assert np.isfinite(w).all()
    w_ref = np.linalg.eigvals(A.astype(np.complex128))
    assert np.abs(w.real).max() < 1e-3
    assert np.max(np.abs(np.sort(w.imag) - np.sort(w_ref.imag))) < 1e-3


@pytest.mark.slow
def test_aed_deflates_and_matches():
    """In-kernel AED (window Schur + spike deflation + masked Householder
    re-Hessenberg): >=3x fewer sweeps than the plain multishift path on
    the same matrix, same eigensystem.  The AED window (64) exceeds the
    active block near the endgame, so this also exercises the
    small-window / converged-tail masking."""
    n = 300
    Ar, Ai = _random_pair(n, 3)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        stats = {}
        ws = {}
        for aed in (True, False):
            Tr, Ti, Zr, Zi, (hi_f, sweeps, aed_d, skipped, multi) = schur_qr_hbm(
                Hr, Hi, Qr, Qi, m=8, wb=256, interpret=True,
                return_stats=True, aed=aed)
            assert int(hi_f) == 0
            stats[aed] = (int(sweeps), int(aed_d))
            ws[aed] = (np.asarray(jnp.diagonal(Tr))
                       + 1j * np.asarray(jnp.diagonal(Ti)))
    A = np.asarray(Ar) + 1j * np.asarray(Ai)
    wref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    for aed in (True, False):
        assert np.max(np.abs(np.sort_complex(ws[aed]) - wref)) < 1e-3
    sw_aed, defl = stats[True]
    sw_plain, _ = stats[False]
    assert defl > n // 2, f'AED deflated only {defl} of {n}'
    assert sw_aed * 3 <= sw_plain, \
        f'AED sweeps {sw_aed} not <3x plain {sw_plain}'


def test_hbm_small_block_fast():
    """Fast-gate coverage of schur_qr_hbm (interpret mode, small n):
    AED window larger than the active block, nibble rule's effective-
    window denominator, and the converged-tail masking all exercise in
    seconds — kernel regressions surface in the default `pytest -q`
    without waiting for `make check-all`."""
    n = 48
    Ar, Ai = _random_pair(n, 11)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        Tr, Ti, Zr, Zi, (hi_f, sweeps, aed_d, skipped, multi) = schur_qr_hbm(
            Hr, Hi, Qr, Qi, m=4, wb=256, kw=24, interpret=True,
            return_stats=True)
    assert int(hi_f) == 0, f'not converged: hi_f={int(hi_f)}'
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    assert np.isfinite(w).all()
    A = np.asarray(Ar) + 1j * np.asarray(Ai)
    w_ref = np.sort_complex(np.linalg.eigvals(A.astype(np.complex128)))
    assert np.max(np.abs(np.sort_complex(w) - w_ref)) < 1e-3
    # AED must carry most of the convergence and the nibble rule (with
    # its effective-window denominator) must actually skip some chases
    assert int(aed_d) > n // 2
    assert int(skipped) > 0


def test_hbm_window_too_small_raises():
    Ar, Ai = _random_pair(64, 0)
    with pytest.raises(ValueError):
        schur_qr_hbm(Ar, Ai, Ar, Ai, m=64, wb=128, interpret=True)


@pytest.mark.slow
def test_vec_blocked_matches_resident():
    """Blocked eigenvector solve == the VMEM-resident kernel's result."""
    from torcwa_tpu.ops.eig_qr_real import schur_qr_real, eig_tri_vectors_real
    n = 160
    Ar, Ai = _random_pair(n, 7)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        Tr, Ti, Zr, Zi = schur_qr_real(Hr, Hi, Qr, Qi)
        Vr_ref, Vi_ref = eig_tri_vectors_real(Tr, Ti, Zr, Zi)
        Vr, Vi = eig_tri_vectors_blocked(Tr, Ti, Zr, Zi, block=64,
                                         interpret=True)
    V = np.asarray(Vr) + 1j * np.asarray(Vi)
    Vref = np.asarray(Vr_ref) + 1j * np.asarray(Vi_ref)
    # columns agree up to a unit phase; compare |<v, v_ref>| / (|v||v_ref|)
    num = np.abs(np.sum(np.conj(V) * Vref, axis=0))
    den = np.linalg.norm(V, axis=0) * np.linalg.norm(Vref, axis=0)
    assert np.min(num / den) > 1 - 1e-3
