"""Gradient tests (Example4 pattern): jax.grad through the full solve vs
finite differences and vs the reference's torch autograd goldens.

This is the acceptance test for the custom eig VJP (the broadened backward
of ops/eig.py) — the reference validates it the same way
(/root/reference/example/Example4.ipynb: numerical vs exact vs stabilized)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torcwa_tpu as tt

L = [300., 300.]
LAMB0 = 473.
SUBSTRATE_EPS = 1.46 ** 2
SIN_EPS = 2.0709 ** 2
ORDER = [4, 4]


def _T_of_R(R, stable, broadening=1e-10):
    """|txx|^2 of a cylindrical SiN meta-atom vs radius (complex128)."""
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=400, ny=400, edge_sharpness=500.,
                    dtype=jnp.float64)
    geom = g.circle(R, L[0] / 2., L[1] / 2.)
    eps = geom * SIN_EPS + (1. - geom)
    tt.Eig.broadening_parameter = broadening
    sim = tt.rcwa(freq=1 / LAMB0, order=ORDER, L=L, dtype=jnp.complex128,
                  stable_eig_grad=stable)
    sim.add_input_layer(eps=SUBSTRATE_EPS)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    sim.add_layer(thickness=600., eps=eps)
    sim.solve_global_smatrix()
    txx = sim.S_parameters(orders=[0, 0], direction='forward',
                           port='transmission', polarization='xx',
                           ref_order=[0, 0])
    return (jnp.abs(txx) ** 2)[0]


@pytest.mark.parametrize('R', [pytest.param(88., marks=pytest.mark.slow),
                               pytest.param(95., marks=pytest.mark.slow),
                               102.])
def test_grad_vs_finite_difference(R):
    dR = 0.01
    fd = (float(_T_of_R(R + dR, stable=False))
          - float(_T_of_R(R - dR, stable=False))) / (2 * dR)
    ad = float(jax.grad(_T_of_R)(R, stable=False))
    assert np.isclose(ad, fd, rtol=2e-3), (ad, fd)
    # broadened backward should agree closely away from degeneracies
    ad_b = float(jax.grad(_T_of_R)(R, stable=True, broadening=1e-10))
    assert np.isclose(ad_b, fd, rtol=2e-3), (ad_b, fd)


def test_grad_vs_reference_golden(golden):
    g = golden('example4')
    for i, R in enumerate(g['R']):
        T = float(_T_of_R(float(R), stable=False))
        assert np.isclose(T, g['T_exact'][i], rtol=1e-4), (R, T, g['T_exact'][i])
        ad = float(jax.grad(_T_of_R)(float(R), stable=False))
        assert np.isclose(ad, g['dTdR_exact'][i], rtol=1e-3), (R, ad)
        ad_b = float(jax.grad(_T_of_R)(float(R), stable=True, broadening=1e-10))
        assert np.isclose(ad_b, g['dTdR_broad'][i], rtol=1e-3), (R, ad_b)
        assert np.isclose(ad, g['dTdR_fd'][i], rtol=5e-3), (R, ad, g['dTdR_fd'][i])


@pytest.mark.slow
def test_grad_none_broadening():
    """broadening=None falls back to the dtype-tiny denominator
    (torch_eig.py:30-33) and still yields finite gradients."""
    ad = float(jax.grad(_T_of_R)(95., stable=True, broadening=None))
    assert np.isfinite(ad)


@pytest.mark.slow
def test_eig_vjp_unit():
    """Unit test of the eig VJP against numerical JVP on a small matrix."""
    rng = np.random.default_rng(0)
    n = 6
    A0 = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    dA = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A0 = jnp.asarray(A0, jnp.complex128)
    dA = jnp.asarray(dA, jnp.complex128)

    def loss(t):
        w, v = tt.eig(A0 + t * dA, 0.0, 'callback')
        # real, gauge-invariant: eigvalues + projector-based eigvec probe
        return (jnp.sum(jnp.abs(w) ** 2)
                + jnp.sum(jnp.abs(v @ jnp.diag(w) @ jnp.linalg.inv(v)) ** 2))

    eps = 1e-6
    fd = (float(loss(eps)) - float(loss(-eps))) / (2 * eps)
    ad = float(jax.grad(loss)(0.0))
    assert np.isclose(ad, fd, rtol=1e-5), (ad, fd)


@pytest.mark.slow
def test_grad_lossy_material():
    """Gradient through a genuinely complex (lossy) structure — pins the
    VJP conjugation convention (a lossless structure has a numerically
    real P@Q, which masks conjugation errors)."""
    import jax

    def T_of_R(R, backend):
        g = tt.geometry(Lx=L[0], Ly=L[1], nx=256, ny=256, edge_sharpness=500.,
                        dtype=jnp.float64)
        geom = g.circle(R, L[0] / 2., L[1] / 2.)
        eps = geom * (4.767 + 0.598j) + (1. - geom)  # lossy a-Si-like
        sim = tt.rcwa(freq=1 / LAMB0, order=[3, 3], L=L, dtype=jnp.complex128,
                      eig_backend=backend)
        sim.add_input_layer(eps=SUBSTRATE_EPS)
        sim.set_incident_angle(inc_ang=0.05, azi_ang=0.1)
        sim.add_layer(thickness=400., eps=eps)
        sim.solve_global_smatrix()
        txx = sim.S_parameters(orders=[0, 0], direction='forward',
                               port='transmission', polarization='xx',
                               ref_order=[0, 0])
        return (jnp.abs(txx) ** 2)[0]

    dR = 0.01
    for backend in ['callback', 'qr']:
        fd = (float(T_of_R(95. + dR, backend))
              - float(T_of_R(95. - dR, backend))) / (2 * dR)
        ad = float(jax.grad(T_of_R)(95., backend))
        assert np.isclose(ad, fd, rtol=2e-3), (backend, ad, fd)


@pytest.mark.slow
def test_eig_vjp_general_loss():
    """VJP correctness for a loss involving V and inv(V) with a fully
    complex matrix, both backends."""
    import jax

    rng = np.random.default_rng(0)
    n = 8
    A0 = jnp.asarray(rng.standard_normal((n, n))
                     + 1j * rng.standard_normal((n, n)), jnp.complex128)
    dA = jnp.asarray(rng.standard_normal((n, n))
                     + 1j * rng.standard_normal((n, n)), jnp.complex128)

    for backend in ['callback', 'qr']:
        def loss(t):
            w, V = tt.eig(A0 + t * dA, 1e-10, backend)
            M = V @ jnp.diag(jnp.exp(1j * w)) @ jnp.linalg.inv(V)
            return jnp.sum(jnp.abs(M) ** 2)

        eps = 1e-6
        fd = (float(loss(eps)) - float(loss(-eps))) / (2 * eps)
        ad = float(jax.grad(loss)(0.0))
        assert np.isclose(ad, fd, rtol=1e-5), (backend, ad, fd)
