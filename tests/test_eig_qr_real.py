"""Unit tests for the split-real TPU eigensolver vs numpy LAPACK."""

import numpy as np
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops.eig_qr_real import eig_qr_split


def _check(A, tol):
    w, V = eig_qr_split(A)
    A, w, V = np.asarray(A), np.asarray(w), np.asarray(V)
    scale = max(np.abs(A).max(), 1.)
    res = np.abs(A @ V - V * w[None, :]).max()
    assert res < tol * scale, f'residual {res}'
    w_np = np.linalg.eigvals(A)
    assert np.allclose(np.sort_complex(w), np.sort_complex(w_np),
                       atol=tol * scale)


@pytest.mark.parametrize('n', [1, 2, 3, 8, 24, 48])
def test_random_f64(n):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    _check(jnp.asarray(A, jnp.complex128), 1e-10)


@pytest.mark.slow
def test_random_f32():
    rng = np.random.default_rng(5)
    n = 32
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    _check(jnp.asarray(A, jnp.complex64), 1e-4)


@pytest.mark.slow
def test_batched():
    rng = np.random.default_rng(11)
    A = rng.standard_normal((4, 10, 10)) + 1j * rng.standard_normal((4, 10, 10))
    A = jnp.asarray(A, jnp.complex128)
    w, V = eig_qr_split(A)
    for i in range(4):
        res = np.abs(np.asarray(A[i]) @ np.asarray(V[i])
                     - np.asarray(V[i]) * np.asarray(w[i])[None, :]).max()
        assert res < 1e-9


def test_near_defective():
    n = 8
    A = np.diag(np.ones(n, complex) * 2.0) + np.diag(np.ones(n - 1), 1)
    A += 1e-6 * (np.arange(n)[:, None] + 1j * np.arange(n)[None, :])
    A = jnp.asarray(A, jnp.complex128)
    w, _ = eig_qr_split(A)
    w_np = np.linalg.eigvals(np.asarray(A))
    assert np.allclose(np.sort_complex(np.asarray(w)), np.sort_complex(w_np),
                       atol=1e-6)


@pytest.mark.slow
def test_rcwa_end_to_end_qr_backend():
    """Full patterned-layer solve with the split-real backend vs callback."""
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

    assert np.allclose(solve('qr'), solve('callback'), atol=2e-3)


@pytest.mark.slow
def test_grad_through_qr_backend():
    """jax.grad flows through the split-real forward (VJP uses the custom
    broadened formula, backend-independent)."""
    import jax
    import torcwa_tpu as tt

    def T_of_R(R):
        g = tt.geometry(Lx=300., Ly=300., nx=128, ny=128, edge_sharpness=500.,
                        dtype=jnp.float64)
        geom = g.circle(R, 150., 150.)
        eps = geom * 4.2 + (1. - geom)
        sim = tt.rcwa(freq=1 / 473., order=[2, 2], L=[300., 300.],
                      dtype=jnp.complex128, eig_backend='qr')
        sim.add_input_layer(eps=1.46 ** 2)
        sim.set_incident_angle(inc_ang=0., azi_ang=0.)
        sim.add_layer(thickness=600., eps=eps)
        sim.solve_global_smatrix()
        t = sim.S_parameters(orders=[0, 0], direction='forward',
                             port='transmission', polarization='xx',
                             ref_order=[0, 0])
        return (jnp.abs(t) ** 2)[0]

    dR = 0.01
    fd = (float(T_of_R(95. + dR)) - float(T_of_R(95. - dR))) / (2 * dR)
    ad = float(jax.grad(T_of_R)(95.))
    assert np.isclose(ad, fd, rtol=2e-3), (ad, fd)
