"""Unit tests for the TPU-native QR eigensolver vs numpy LAPACK."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops import eig_qr


def _check_eig(A, w, V, tol):
    """Residual check ||A v - w v|| and eigenvalue-set match vs numpy."""
    A, w, V = np.asarray(A), np.asarray(w), np.asarray(V)
    res = np.abs(A @ V - V * w[None, :]).max()
    scale = max(np.abs(A).max(), 1.)
    assert res < tol * scale, f'residual {res} vs scale {scale}'
    w_np = np.linalg.eigvals(A)
    # compare as multisets via sorted (real, imag)
    a = np.sort_complex(w)
    b = np.sort_complex(w_np)
    assert np.allclose(a, b, atol=tol * scale), \
        f'eigvalue mismatch {np.abs(a - b).max()}'


@pytest.mark.parametrize('n', [1, 2, 3, 5, 16, 40])
def test_random_complex(n):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = jnp.asarray(A, jnp.complex128)
    w, V = eig_qr.eig_qr(A)
    _check_eig(A, w, V, 1e-10)


def test_complex64():
    rng = np.random.default_rng(7)
    n = 24
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = jnp.asarray(A, jnp.complex64)
    w, V = eig_qr.eig_qr(A)
    _check_eig(A, w, V, 5e-5)


def test_real_spectrum_matrix():
    """Hermitian-as-general: known real spectrum."""
    rng = np.random.default_rng(3)
    n = 12
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = jnp.asarray(B @ B.conj().T, jnp.complex128)
    w, V = eig_qr.eig_qr(A)
    assert np.abs(np.asarray(w).imag).max() < 1e-9
    _check_eig(A, w, V, 1e-10)


def test_defective_ish_repeated_eigvalues():
    """Nearly repeated eigenvalues (jordan-ish block + perturbation)."""
    n = 8
    A = np.diag(np.ones(n, complex) * 2.0)
    A += np.diag(np.ones(n - 1), 1)  # jordan chain
    A += 1e-6 * (np.arange(n)[:, None] + 1j * np.arange(n)[None, :])
    A = jnp.asarray(A, jnp.complex128)
    w, V = eig_qr.eig_qr(A)
    w_np = np.linalg.eigvals(np.asarray(A))
    assert np.allclose(np.sort_complex(np.asarray(w)), np.sort_complex(w_np),
                       atol=1e-6)


def test_batched_vmap():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((4, 10, 10)) + 1j * rng.standard_normal((4, 10, 10))
    A = jnp.asarray(A, jnp.complex128)
    w, V = eig_qr.eig_qr(A)
    for i in range(4):
        _check_eig(A[i], w[i], V[i], 1e-9)


@pytest.mark.slow
def test_rcwa_pq_matrix():
    """The actual workload: eig of P@Q from a patterned RCWA layer."""
    import torcwa_tpu as tt
    from torcwa_tpu import core

    L = [300., 300.]
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=128, ny=128, edge_sharpness=1000.)
    geom = g.rectangle(180., 100., 150., 150.)
    eps = jnp.asarray(geom) * (4.0 + 0.3j) + (1. - jnp.asarray(geom))
    sim = tt.rcwa(freq=1 / 532., order=[3, 3], L=L, dtype=jnp.complex64)
    sim.add_input_layer(eps=1.46 ** 2)
    sim.set_incident_angle(inc_ang=0.1, azi_ang=0.2)
    from torcwa_tpu.ops.fourier import material_conv
    from torcwa_tpu.ops import cplx
    eps_c = material_conv(eps, (3, 3), jnp.complex64)
    mu_c = jnp.eye(49, dtype=jnp.complex64)
    P, Q = core.pq_matrices(cplx.split(eps_c), cplx.split(mu_c),
                            sim.Kx_norm_dn, sim.Ky_norm_dn)
    A = cplx.fuse(P) @ cplx.fuse(Q)
    w, V = eig_qr.eig_qr(A)
    _check_eig(A, w, V, 2e-4)


@pytest.mark.slow
def test_matches_solver_end_to_end():
    """Full solve with backend='qr' vs backend='callback'."""
    import torcwa_tpu as tt

    L = [300., 300.]
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=128, ny=128, edge_sharpness=1000.)
    geom = g.rectangle(180., 100., 150., 150.)
    eps = jnp.asarray(geom) * (4.0 + 0.3j) + (1. - jnp.asarray(geom))

    def solve(backend):
        sim = tt.rcwa(freq=1 / 532., order=[3, 3], L=L, dtype=jnp.complex64,
                      eig_backend=backend)
        sim.add_input_layer(eps=1.46 ** 2)
        sim.set_incident_angle(inc_ang=0., azi_ang=0.)
        sim.add_layer(thickness=300., eps=eps)
        sim.solve_global_smatrix()
        return np.asarray(sim.S_parameters(
            orders=[[0, 0], [1, 0], [0, 1]], direction='forward',
            port='transmission', polarization='xx', ref_order=[0, 0]))

    t_qr = solve('qr')
    t_cb = solve('callback')
    assert np.allclose(t_qr, t_cb, atol=2e-3), (t_qr, t_cb)
