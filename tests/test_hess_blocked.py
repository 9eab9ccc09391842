"""Blocked Hessenberg (compact WY): parity with the unblocked reduction
and round-trip unitarity, including short tail panels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops.hess_blocked import hessenberg_blocked


@pytest.mark.parametrize('n,panel', [(8, 4), (33, 8), (96, 32), (130, 64)])
def test_hessenberg_blocked_roundtrip(n, panel):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Hr, Hi, Qr, Qi = hessenberg_blocked(
        jnp.asarray(A.real, jnp.float64), jnp.asarray(A.imag, jnp.float64),
        panel=panel)
    H = np.asarray(Hr) + 1j * np.asarray(Hi)
    Q = np.asarray(Qr) + 1j * np.asarray(Qi)
    # unitary
    assert np.linalg.norm(Q.conj().T @ Q - np.eye(n)) < 1e-12 * n
    # Hessenberg structure
    assert np.abs(np.tril(H, -2)).max() == 0.
    # similarity: Q H Q^H == A
    assert np.linalg.norm(Q @ H @ Q.conj().T - A) < 1e-11 * np.linalg.norm(A)


def test_matches_unblocked_spectrum():
    from torcwa_tpu.ops.eig_qr_real import hessenberg_real
    n = 48
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Ar = jnp.asarray(A.real, jnp.float64)
    Ai = jnp.asarray(A.imag, jnp.float64)
    Hb = hessenberg_blocked(Ar, Ai, panel=16)
    Hu = hessenberg_real(Ar, Ai)
    wb = np.sort_complex(np.linalg.eigvals(
        np.asarray(Hb[0]) + 1j * np.asarray(Hb[1])))
    wu = np.sort_complex(np.linalg.eigvals(
        np.asarray(Hu[0]) + 1j * np.asarray(Hu[1])))
    assert np.max(np.abs(wb - wu)) < 1e-10 * np.abs(wu).max()


def test_f32_large_panelled():
    n = 300
    rng = np.random.default_rng(3)
    A = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    Hr, Hi, Qr, Qi = hessenberg_blocked(
        jnp.asarray(A.real), jnp.asarray(A.imag), panel=128)
    H = np.asarray(Hr) + 1j * np.asarray(Hi)
    Q = np.asarray(Qr) + 1j * np.asarray(Qi)
    assert np.linalg.norm(Q.conj().T @ Q - np.eye(n)) < 1e-4
    assert np.linalg.norm(Q @ H @ Q.conj().T - A) < 1e-4 * np.linalg.norm(A)
