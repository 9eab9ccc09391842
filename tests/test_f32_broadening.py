"""float32 gradient fidelity at degenerate eigenvalues (VERDICT r1 item 7).

The eig backward's Lorentzian broadening F = conj(s)/(|s|^2 + eps)
regularizes the eigenvector-perturbation formula.  At float32 a symmetry-
degenerate RCWA eigenpair (square cell, normal incidence) is split by
eigensolver noise delta ~ 1e-4..1e-6; with the reference default
eps = 1e-10 the factor |F| ~ 1/delta amplifies that noise (measured ~100x
gradient inflation on the TPU kernels), while the dtype-aware 'auto'
default (1e-6 at f32, ops/eig.py) bounds it.  CPU eigensolvers produce
cleaner degenerate pairs, so the inflation is reproduced here by
*injecting* a representative noise split directly into the backward pass;
the full-solve test then pins f32-vs-f64 gradient parity at the same
degenerate configuration (the reference validates gradients the same way,
Example4.ipynb's three-way comparison).
"""

import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu.ops.eig import _eig_pair_bwd, _AUTO_BROADENING
import pytest


def _bwd_with(w, V, gv, eps):
    """Run the eig VJP directly with an injected forward result."""
    res = (jnp.real(w).astype(jnp.float32), jnp.imag(w).astype(jnp.float32),
           jnp.real(V).astype(jnp.float32), jnp.imag(V).astype(jnp.float32))
    cts = (jnp.zeros_like(res[0]), jnp.zeros_like(res[1]),
           jnp.real(gv).astype(jnp.float32), jnp.imag(gv).astype(jnp.float32))
    gr, gi = _eig_pair_bwd(eps, 'callback', res, cts)
    return np.asarray(gr) + 1j * np.asarray(gi)


def test_auto_broadening_bounds_degenerate_noise_amplification():
    """Encodes the 100x-inflation case: a degenerate pair split by f32
    eigensolver noise must not blow up the gradient at broadening='auto',
    while the reference default 1e-10 does."""
    rng = np.random.default_rng(0)
    n = 8
    # eigenvalues with one exactly degenerate pair; delta = injected noise
    w_exact = np.array([1.0, 1.0, 2.0, -0.7, 0.3, 1.5, -1.2, 0.9],
                       dtype=np.complex64)
    delta = 3e-5                   # representative f32 eigensolver split
    w_noisy = w_exact.copy()
    w_noisy[1] += delta

    V, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    V = V.astype(np.complex64)
    gv = (rng.standard_normal((n, n))
          + 1j * rng.standard_normal((n, n))).astype(np.complex64)

    # clean reference: exactly degenerate pair -> s = 0 -> F = 0 on it
    g_ref = _bwd_with(jnp.asarray(w_exact), jnp.asarray(V), jnp.asarray(gv),
                      1e-10)
    g_tiny = _bwd_with(jnp.asarray(w_noisy), jnp.asarray(V), jnp.asarray(gv),
                       1e-10)
    g_auto = _bwd_with(jnp.asarray(w_noisy), jnp.asarray(V), jnp.asarray(gv),
                       _AUTO_BROADENING[np.dtype(np.float32)])

    err_tiny = np.linalg.norm(g_tiny - g_ref)
    err_auto = np.linalg.norm(g_auto - g_ref)
    scale = np.linalg.norm(g_ref)
    # 1e-10: |F| ~ 1/delta ~ 3e4 -> noise amplified far above the signal
    assert err_tiny > 100 * scale, (err_tiny, scale)
    # auto: |F| ~ delta/(delta^2 + 1e-6) ~ 30 -> error bounded at the
    # signal's order of magnitude instead of 1000x above it
    assert err_auto < 5 * scale, (err_auto, scale)
    assert err_tiny > 100 * err_auto, (err_tiny, err_auto)


@pytest.mark.slow
def test_f32_grad_parity_at_degenerate_config():
    """Full-solve f32 gradient vs f64 truth at the symmetry-degenerate
    configuration (square cell, normal incidence) with broadening='auto',
    through the same split-real QR backend the TPU uses."""
    from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair

    L = (300., 300.)
    spec = StackSpec(order=(3, 3), L=L, n_layers=1, has_input=True)

    def T_of_W(W, rd, broadening, backend):
        g = tt.geometry(Lx=L[0], Ly=L[1], nx=128, ny=128,
                        edge_sharpness=500., dtype=rd)
        geom = g.rectangle(W, W, L[0] / 2., L[1] / 2.)
        eps = geom * (2.0709 ** 2) + (1. - geom)
        S, intr = solve_stack_pair(
            spec, jnp.asarray(1 / 473., rd), jnp.asarray(0., rd),
            jnp.asarray(0., rd), (eps[None], jnp.zeros_like(eps)[None]),
            jnp.asarray([600.], rd),
            eps_in=(jnp.asarray(1.46 ** 2, rd), jnp.asarray(0., rd)),
            broadening=broadening, eig_backend=backend)
        one = (jnp.asarray(1., rd), jnp.asarray(0., rd))
        tr, ti = sparam_xy_pair(
            S, intr['kx'], intr['ky'],
            (jnp.asarray(1.46 ** 2, rd), jnp.asarray(0., rd)), one,
            spec.order, [0, 0], [0, 0], 'xx')
        return (tr ** 2 + ti ** 2)[0]

    for W in [160.]:
        g64 = float(jax.grad(T_of_W)(W, jnp.float64, 1e-10, 'callback'))
        g32 = float(jax.grad(T_of_W)(jnp.asarray(W, jnp.float32),
                                     jnp.float32, 'auto', 'qr'))
        assert np.isfinite(g32)
        assert abs(g32 - g64) < 0.05 * abs(g64), (g32, g64)
