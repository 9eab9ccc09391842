"""lax.scan Redheffer fold (deep stacks) + functional-path Pinv fallback.

Covers the reference's layer fold (rcwa.py:173-211, 1283-1306) scanned
over a stacked layer axis, and the avoid_Pinv_instability runtime
fallback (rcwa.py:1249-1262) on the split-real functional path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torcwa_tpu as tt
from torcwa_tpu import fmm

L = (300., 300.)
SUB = 1.46 ** 2
SI = 4.767 + 0.598j
R64 = jnp.float64


def _grids(n_layers, nx=64):
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=nx, ny=nx, edge_sharpness=1000.)
    shapes = [np.asarray(g.rectangle(180., 100., 150., 150.), np.float64),
              np.asarray(g.circle(70., 140., 160.), np.float64),
              np.asarray(g.rectangle(120., 160., 150., 150., theta=0.4),
                         np.float64)]
    grids = np.stack([shapes[i % 3] * SI + (1. - shapes[i % 3])
                      for i in range(n_layers)])
    ths = np.asarray([150. + 10. * (i % 4) for i in range(n_layers)])
    return grids, ths


def _solve(spec, grids, ths, **extra):
    return fmm.solve_stack_pair(
        spec, jnp.asarray(1 / 532., R64), jnp.asarray(0., R64),
        jnp.asarray(0., R64),
        (jnp.asarray(grids.real), jnp.asarray(grids.imag)),
        jnp.asarray(ths),
        eps_in=(jnp.asarray(SUB, R64), jnp.asarray(0., R64)), **extra)


@pytest.mark.slow
def test_scan_fold_matches_unroll_24_layers():
    """24-layer patterned stack: fold='scan' must reproduce the unrolled
    fold bit-for-bit — global S blocks and every propagated C entry."""
    n_layers = 24
    grids, ths = _grids(n_layers, nx=32)
    spec = fmm.StackSpec(order=(1, 1), L=L, n_layers=n_layers,
                         has_input=True)
    S_u, i_u = _solve(spec, grids, ths, with_modes=True, fold='unroll')
    S_s, i_s = _solve(spec, grids, ths, with_modes=True, fold='scan')
    for a, b in zip(S_u, S_s):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert len(i_u['C']) == len(i_s['C']) == n_layers
    for (cfu, cbu), (cfs, cbs) in zip(i_u['C'], i_s['C']):
        np.testing.assert_array_equal(np.asarray(cfu[0]), np.asarray(cfs[0]))
        np.testing.assert_array_equal(np.asarray(cbu[1]), np.asarray(cbs[1]))


@pytest.mark.slow
def test_scan_fold_under_jit_grad():
    """The scan fold must differentiate: d|t_xx|^2/d(grids) finite and
    matching the unrolled fold on a 9-layer stack (auto picks scan)."""
    n_layers = 9
    grids, ths = _grids(n_layers, nx=32)
    spec = fmm.StackSpec(order=(1, 1), L=L, n_layers=n_layers,
                         has_input=True)
    one = (jnp.asarray(1., R64), jnp.asarray(0., R64))

    def txx(gr, fold):
        S, intr = fmm.solve_stack_pair(
            spec, jnp.asarray(1 / 532., R64), jnp.asarray(0., R64),
            jnp.asarray(0., R64), (gr, jnp.asarray(grids.imag)),
            jnp.asarray(ths),
            eps_in=(jnp.asarray(SUB, R64), jnp.asarray(0., R64)),
            fold=fold)
        tr, ti = fmm.sparam_xy_pair(S, intr['kx'], intr['ky'],
                                    (jnp.asarray(SUB, R64),
                                     jnp.asarray(0., R64)), one,
                                    spec.order, [0, 0], [0, 0], 'xx')
        return (tr ** 2 + ti ** 2)[0]

    gr = jnp.asarray(grids.real)
    v_s, g_s = jax.value_and_grad(lambda g: txx(g, 'scan'))(gr)
    v_u, g_u = jax.value_and_grad(lambda g: txx(g, 'unroll'))(gr)
    assert np.isfinite(float(v_s))
    assert np.isclose(float(v_s), float(v_u), rtol=1e-12)
    rel = np.abs(np.asarray(g_s) - np.asarray(g_u)).max() / \
        max(np.abs(np.asarray(g_u)).max(), 1e-300)
    assert rel < 1e-9, rel


@pytest.mark.slow
def test_scan_fold_graph_flat_vs_layer_count():
    """The scanned fold's jaxpr must not grow with layer count the way
    the unrolled fold does (compile time flat for deep stacks)."""
    def eqns(n_layers, fold):
        grids, ths = _grids(n_layers, nx=16)
        spec = fmm.StackSpec(order=(1, 1), L=L, n_layers=n_layers,
                             has_input=True)
        jaxpr = jax.make_jaxpr(
            lambda gr, gi, t: fmm.solve_stack_pair(
                spec, jnp.asarray(1 / 532., R64), jnp.asarray(0., R64),
                jnp.asarray(0., R64), (gr, gi), t,
                eps_in=(jnp.asarray(SUB, R64), jnp.asarray(0., R64)),
                with_modes=True, fold=fold)[0])(
            jnp.asarray(grids.real), jnp.asarray(grids.imag),
            jnp.asarray(ths))
        return len(jaxpr.jaxpr.eqns)

    scan_growth = eqns(24, 'scan') - eqns(8, 'scan')
    unroll_growth = eqns(24, 'unroll') - eqns(8, 'unroll')
    # unrolled with_modes growth is O(L^2) star-product GEMM eqns; the
    # scanned fold only adds the API-compat C unstack (8 zero-cost slice
    # eqns per layer, no compute)
    assert scan_growth <= 8 * 16, scan_growth
    assert unroll_growth > 20 * max(scan_growth, 1), (scan_growth,
                                                      unroll_growth)


def _class_txx_pinv(grids, ths, order, max_pinv):
    sim = tt.rcwa(freq=1 / 532., order=list(order), L=list(L),
                  dtype=jnp.complex128, avoid_Pinv_instability=True,
                  max_Pinv_instability=max_pinv)
    sim.add_input_layer(eps=SUB)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    for gg, t in zip(grids, ths):
        sim.add_layer(thickness=float(t), eps=jnp.asarray(gg, jnp.complex128))
    sim.solve_global_smatrix()
    t = sim.S_parameters(orders=[0, 0], direction='forward',
                         port='transmission', polarization='xx',
                         ref_order=[0, 0])
    return complex(t[0])


@pytest.mark.parametrize('with_modes', [False, True])
@pytest.mark.slow
def test_pinv_fallback_matches_class(with_modes):
    """Force the H = Q E Kz^-1 fallback on every layer (threshold -1,
    so `p_ins < max` is always false) and check the functional path
    reproduces the class API's fallback output (rcwa.py:1249-1262)."""
    grids, ths = _grids(2, nx=64)
    spec = fmm.StackSpec(order=(2, 2), L=L, n_layers=2, has_input=True)
    S, intr = _solve(spec, grids, ths, with_modes=with_modes,
                     avoid_pinv_instability=True,
                     max_pinv_instability=-1.0)
    one = (jnp.asarray(1., R64), jnp.asarray(0., R64))
    tr, ti = fmm.sparam_xy_pair(S, intr['kx'], intr['ky'],
                                (jnp.asarray(SUB, R64),
                                 jnp.asarray(0., R64)), one,
                                spec.order, [0, 0], [0, 0], 'xx')
    t_fn = complex(float(tr[0]), float(ti[0]))
    t_cl = _class_txx_pinv(grids, ths, (2, 2), max_pinv=-1.0)
    assert abs(t_fn - t_cl) < 1e-8, (t_fn, t_cl)
    # metrics exposed per patterned layer, stop-gradient, finite
    p_ins, q_ins = intr['pinv_instability']
    assert p_ins.shape == (2,) and q_ins.shape == (2,)
    assert np.all(np.isfinite(np.asarray(p_ins)))


@pytest.mark.slow
def test_pinv_fallback_noop_when_well_conditioned():
    """With the reference's default threshold the solve is unchanged on a
    well-conditioned stack (P-solve branch selected everywhere)."""
    grids, ths = _grids(1, nx=64)
    spec = fmm.StackSpec(order=(2, 2), L=L, n_layers=1, has_input=True)
    S0, _ = _solve(spec, grids, ths)
    S1, intr = _solve(spec, grids, ths, avoid_pinv_instability=True)
    p_ins, _ = intr['pinv_instability']
    assert float(p_ins.max()) < 0.005   # branch not taken
    for a, b in zip(S0, S1):
        # H via LU-solve vs explicit-inverse GEMM: same math, different
        # rounding — agreement to f64 algebra noise
        assert float(jnp.abs(a[0] - b[0]).max()) < 1e-10
        assert float(jnp.abs(a[1] - b[1]).max()) < 1e-10


@pytest.mark.slow
def test_pinv_fallback_grad_finite():
    """Gradients flow through the armed fallback (metrics are
    stop-gradient; cwhere select is differentiable)."""
    grids, ths = _grids(1, nx=32)
    spec = fmm.StackSpec(order=(1, 1), L=L, n_layers=1, has_input=True)
    one = (jnp.asarray(1., R64), jnp.asarray(0., R64))

    def txx(gr):
        S, intr = fmm.solve_stack_pair(
            spec, jnp.asarray(1 / 532., R64), jnp.asarray(0., R64),
            jnp.asarray(0., R64), (gr, jnp.asarray(grids.imag)),
            jnp.asarray(ths),
            eps_in=(jnp.asarray(SUB, R64), jnp.asarray(0., R64)),
            avoid_pinv_instability=True, max_pinv_instability=-1.0)
        tr, ti = fmm.sparam_xy_pair(S, intr['kx'], intr['ky'],
                                    (jnp.asarray(SUB, R64),
                                     jnp.asarray(0., R64)), one,
                                    spec.order, [0, 0], [0, 0], 'xx')
        return (tr ** 2 + ti ** 2)[0]

    v, g = jax.value_and_grad(txx)(jnp.asarray(grids.real))
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
