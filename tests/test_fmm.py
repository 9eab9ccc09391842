"""Functional split-real solve (fmm.py) vs the complex class solver."""

import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu import fmm
import pytest

L = (300., 300.)
SUB = 1.46 ** 2
SI = 4.767 + 0.598j


def _geom():
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=128, ny=128, edge_sharpness=1000.)
    return np.asarray(g.rectangle(180., 100., 150., 150.), np.float64)


def _class_txx(lamb0, geom, order):
    eps = jnp.asarray(geom * SI + (1. - geom), jnp.complex128)
    sim = tt.rcwa(freq=1 / lamb0, order=list(order), L=list(L),
                  dtype=jnp.complex128)
    sim.add_input_layer(eps=SUB)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    sim.add_layer(thickness=300., eps=eps)
    sim.solve_global_smatrix()
    t = sim.S_parameters(orders=[0, 0], direction='forward',
                         port='transmission', polarization='xx',
                         ref_order=[0, 0])
    return float(jnp.abs(t[0]) ** 2)


def test_dft_conv_matches_fft():
    from torcwa_tpu.ops.fourier import material_conv
    geom = _geom()
    grid = geom * SI + (1. - geom)
    ref = np.asarray(material_conv(jnp.asarray(grid), (3, 3), jnp.complex128))
    cr, ci = fmm.dft_conv_pair((jnp.asarray(grid.real), jnp.asarray(grid.imag)),
                               (3, 3), 128, 128)
    assert np.allclose(np.asarray(cr) + 1j * np.asarray(ci), ref, atol=1e-10)


@pytest.mark.slow
def test_simulate_txx_matches_class():
    geom = _geom()
    spec = fmm.StackSpec(order=(3, 3), L=L, n_layers=1, has_input=True)
    grid = geom * SI + (1. - geom)
    for lamb0 in [450., 532., 650.]:
        T_fn = float(fmm.simulate_txx(
            spec, jnp.asarray(1 / lamb0, jnp.float64),
            jnp.asarray(grid.real), jnp.asarray(grid.imag),
            jnp.asarray(300., jnp.float64), jnp.asarray(SUB, jnp.float64)))
        T_cl = _class_txx(lamb0, geom, (3, 3))
        assert np.isclose(T_fn, T_cl, rtol=1e-6), (lamb0, T_fn, T_cl)


@pytest.mark.slow
def test_simulate_vmap_over_wavelength():
    geom = _geom()
    spec = fmm.StackSpec(order=(2, 2), L=L, n_layers=1, has_input=True)
    grid = geom * SI + (1. - geom)
    lambs = np.array([450., 500., 550., 600.])

    f = jax.vmap(lambda fr: fmm.simulate_txx(
        spec, fr, jnp.asarray(grid.real), jnp.asarray(grid.imag),
        jnp.asarray(300., jnp.float64), jnp.asarray(SUB, jnp.float64)))
    Ts = np.asarray(f(jnp.asarray(1 / lambs)))
    for i, lamb0 in enumerate(lambs):
        T_cl = _class_txx(float(lamb0), geom, (2, 2))
        assert np.isclose(Ts[i], T_cl, rtol=1e-6), (lamb0, Ts[i], T_cl)


@pytest.mark.slow
def test_simulate_grad():
    """d|txx|^2/d(thickness) via the functional path vs FD."""
    geom = _geom()
    spec = fmm.StackSpec(order=(2, 2), L=L, n_layers=1, has_input=True)
    grid = geom * SI + (1. - geom)

    def T(th):
        return fmm.simulate_txx(
            spec, jnp.asarray(1 / 532., jnp.float64),
            jnp.asarray(grid.real), jnp.asarray(grid.imag),
            th, jnp.asarray(SUB, jnp.float64))

    th0 = jnp.asarray(300., jnp.float64)
    dt = 1e-3
    fd = (float(T(th0 + dt)) - float(T(th0 - dt))) / (2 * dt)
    ad = float(jax.grad(T)(th0))
    assert np.isclose(ad, fd, rtol=1e-5), (ad, fd)


@pytest.mark.slow
def test_multilayer_stack():
    """3 patterned layers through the functional fold vs the class solver."""
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=128, ny=128, edge_sharpness=1000.)
    g0 = np.asarray(g.rectangle(180., 100., 150., 150.), np.float64)
    g1 = np.asarray(g.rectangle(120., 160., 150., 150., theta=0.5), np.float64)
    g2 = np.asarray(g.circle(80., 150., 150.), np.float64)
    grids = np.stack([gg * SI + (1. - gg) for gg in [g0, g1, g2]])
    ths = np.array([200., 100., 150.])

    spec = fmm.StackSpec(order=(2, 2), L=L, n_layers=3, has_input=True)
    S, internals = fmm.solve_stack_pair(
        spec, jnp.asarray(1 / 532., jnp.float64),
        jnp.asarray(0., jnp.float64), jnp.asarray(0., jnp.float64),
        (jnp.asarray(grids.real), jnp.asarray(grids.imag)),
        jnp.asarray(ths),
        eps_in=(jnp.asarray(SUB, jnp.float64), jnp.asarray(0., jnp.float64)))
    one = (jnp.asarray(1., jnp.float64), jnp.asarray(0., jnp.float64))
    tr, ti = fmm.sparam_xy_pair(
        S, internals['kx'], internals['ky'],
        (jnp.asarray(SUB, jnp.float64), jnp.asarray(0., jnp.float64)), one,
        (2, 2), [0, 0], [0, 0], 'xx')
    T_fn = float(tr[0] ** 2 + ti[0] ** 2)

    sim = tt.rcwa(freq=1 / 532., order=[2, 2], L=list(L), dtype=jnp.complex128)
    sim.add_input_layer(eps=SUB)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    for gg, t in zip(grids, ths):
        sim.add_layer(thickness=float(t), eps=jnp.asarray(gg, jnp.complex128))
    sim.solve_global_smatrix()
    t = sim.S_parameters(orders=[0, 0], direction='forward',
                         port='transmission', polarization='xx',
                         ref_order=[0, 0])
    T_cl = float(jnp.abs(t[0]) ** 2)
    assert np.isclose(T_fn, T_cl, rtol=1e-6), (T_fn, T_cl)


@pytest.mark.slow
def test_sparam_ps_matches_class_api():
    """fmm.sparam_ps_pair agrees with the class API's ps branch for all
    four polarizations and both ports (oblique incidence, real claddings)."""
    import numpy as np
    import jax.numpy as jnp
    import torcwa_tpu as tt
    from torcwa_tpu import fmm

    L = (400., 400.)
    order = (2, 2)
    rdtype = jnp.float64
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=64, ny=64, edge_sharpness=500.,
                    dtype=rdtype)
    geom = g.circle(120., L[0] / 2., L[1] / 2.)
    eps = jnp.asarray(geom * 4.2 + (1. - geom), rdtype)

    sim = tt.rcwa(freq=1 / 600., order=list(order), L=list(L),
                  dtype=jnp.complex128)
    sim.add_input_layer(eps=1.46 ** 2)
    sim.add_output_layer(eps=2.25)
    sim.set_incident_angle(inc_ang=0.3, azi_ang=0.4)
    sim.add_layer(thickness=300., eps=eps)
    sim.solve_global_smatrix()

    spec = fmm.StackSpec(order=order, L=L, n_layers=1, has_input=True,
                         has_output=True)
    eps_in = (jnp.asarray(1.46 ** 2, rdtype), jnp.asarray(0., rdtype))
    eps_out = (jnp.asarray(2.25, rdtype), jnp.asarray(0., rdtype))
    S, intr = fmm.solve_stack_pair(
        spec, jnp.asarray(1 / 600., rdtype), jnp.asarray(0.3, rdtype),
        jnp.asarray(0.4, rdtype), (eps[None], jnp.zeros_like(eps)[None]),
        jnp.asarray([300.], rdtype), eps_in=eps_in, eps_out=eps_out)

    for pol in ['pp', 'ps', 'sp', 'ss']:
        for port in ['transmission', 'reflection']:
            ref = np.asarray(sim.S_parameters(
                orders=[[0, 0], [1, 0]], direction='forward', port=port,
                polarization=pol, ref_order=[0, 0]))
            pr, pi = fmm.sparam_ps_pair(
                S, intr['kx'], intr['ky'], eps_in, eps_out, order,
                [[0, 0], [1, 0]], [0, 0], pol, 'forward', port)
            got = np.asarray(pr) + 1j * np.asarray(pi)
            assert np.allclose(got, ref, rtol=2e-4, atol=1e-7), (
                pol, port, got, ref)


@pytest.mark.slow
def test_fmm_diagnostics_twins():
    """diffraction_angle_pair / return_layer_pair on solve_stack_pair
    outputs (functional twins of rcwa.py:214-298, shared with the class
    API whose golden tests pin the numerics)."""
    import numpy as np
    from torcwa_tpu.fmm import (StackSpec, solve_stack_pair,
                                diffraction_angle_pair, return_layer_pair)
    rdtype = jnp.float64
    order = (3, 3)
    L = (700., 700.)
    nx = ny = 64
    x = np.arange(nx) / nx
    y = np.arange(ny) / ny
    ras = ((x[:, None] > 0.3) & (x[:, None] < 0.7)
           & (y[None, :] > 0.3) & (y[None, :] < 0.7))
    eps = jnp.asarray(np.where(ras, 4.0, 1.0), rdtype)
    spec = StackSpec(order=order, L=L, n_layers=1, has_input=True)
    zero = jnp.asarray(0., rdtype)
    S, intr = solve_stack_pair(
        spec, jnp.asarray(1. / 532., rdtype), zero, zero,
        (eps[None], jnp.zeros_like(eps)[None]),
        jnp.asarray([300.], rdtype),
        eps_in=(jnp.asarray(2.0, rdtype), zero))
    one = (jnp.asarray(1., rdtype), zero)
    inc, azi = diffraction_angle_pair(
        intr['kx'], intr['ky'], one, one,
        [[0, 0], [1, 0], [0, 1]], order, unit='degree')
    assert np.isfinite(np.asarray(inc)).all()
    assert abs(float(inc[0])) < 1e-6          # normal incidence 0th order
    # (1,0) order angle: sin(theta) = lambda / (n L) = 532/700
    th = np.degrees(np.arcsin(532. / 700.))
    assert abs(float(inc[1]) - th) < 1e-3
    # layer synthesis: mean preserved, pattern recovered at low order
    conv0 = (intr['conv'][0][0], intr['conv'][1][0])
    grid = return_layer_pair(conv0, order, 64, 64)
    g = np.asarray(grid[0])
    assert abs(g.mean() - np.asarray(eps).mean()) < 1e-2
    assert g[32, 32] > 3.0 and g[2, 2] < 2.0


@pytest.mark.slow
def test_modes_vs_nomodes_smatrix_and_grad():
    """with_modes=False routes the layer tail through right-solves
    (S11=(Ephi+E)Mp+(Ephi-E)Mm); the S blocks and gradients must match
    the with_modes=True inverse+GEMM algebra."""
    geom = _geom()
    spec = fmm.StackSpec(order=(3, 3), L=L, n_layers=1, has_input=True)
    grid = geom * SI + (1. - geom)
    r64 = jnp.float64
    er = jnp.asarray(grid.real)
    ei = jnp.asarray(grid.imag)

    def txx(er_, wm):
        S, intr = fmm.solve_stack_pair(
            spec, jnp.asarray(1 / 532., r64), jnp.asarray(0., r64),
            jnp.asarray(0., r64), (er_[None], ei[None]),
            jnp.asarray([300.], r64),
            eps_in=(jnp.asarray(SUB, r64), jnp.asarray(0., r64)),
            with_modes=wm)
        one = (jnp.asarray(1., r64), jnp.asarray(0., r64))
        tr, ti = fmm.sparam_xy_pair(S, intr['kx'], intr['ky'],
                                    (jnp.asarray(SUB, r64),
                                     jnp.asarray(0., r64)), one,
                                    spec.order, [0, 0], [0, 0], 'xx')
        return (tr ** 2 + ti ** 2)[0]

    v1, g1 = jax.value_and_grad(lambda e: txx(e, True))(er)
    v0, g0 = jax.value_and_grad(lambda e: txx(e, False))(er)
    assert np.isclose(float(v1), float(v0), rtol=1e-9), (v1, v0)
    rel = np.abs(np.asarray(g1) - np.asarray(g0)).max() / \
        np.abs(np.asarray(g1)).max()
    assert rel < 1e-7, rel


@pytest.mark.slow
def test_twisted_multilayer_homogeneous_fast_path():
    """Example1-1 configuration at order 2: three rotated patterned
    layers interleaved with homogeneous spacers routed through the
    O(N) bdp fast path must match the class API (which densifies every
    layer) on all four polarization transfer elements."""
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=96, ny=96, edge_sharpness=1000.)
    rects = [np.asarray(g.rectangle(180., 100., 150., 150., theta=th),
                        np.float64)
             for th in (0., np.pi / 6., np.pi / 3.)]
    si = 4.2 + 0.3j
    su8 = 1.6 ** 2
    r64 = jnp.float64

    # class API: every layer added explicitly (spacers become eps*I)
    sim = tt.rcwa(freq=1 / 650., order=[2, 2], L=list(L),
                  dtype=jnp.complex128)
    sim.add_input_layer(eps=1.46 ** 2)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    for r in rects:
        eps = jnp.asarray(r * si + (1. - r) * su8, jnp.complex128)
        sim.add_layer(thickness=200., eps=eps)
        sim.add_layer(thickness=100., eps=su8)
    sim.solve_global_smatrix()
    t_cl = {}
    for pol in ('xx', 'yx', 'xy', 'yy'):
        t_cl[pol] = complex(sim.S_parameters(
            orders=[0, 0], direction='forward', port='transmission',
            polarization=pol, ref_order=[0, 0])[0])

    # functional path: spacers via StackSpec.homogeneous (no dense eig)
    spec = fmm.StackSpec(order=(2, 2), L=L, n_layers=6, has_input=True,
                         homogeneous=(False, True) * 3)
    eps_r = jnp.stack([jnp.asarray(r * si.real + (1. - r) * su8)
                       for r in rects])
    eps_i = jnp.stack([jnp.asarray(r * si.imag) for r in rects])
    zero = jnp.asarray(0., r64)
    S, intr = fmm.solve_stack_pair(
        spec, jnp.asarray(1 / 650., r64), zero, zero, (eps_r, eps_i),
        jnp.asarray([200., 100.] * 3, r64),
        eps_in=(jnp.asarray(1.46 ** 2, r64), zero),
        eps_scalars=(jnp.full((3,), su8, r64), jnp.zeros(3, r64)))
    one = (jnp.asarray(1., r64), zero)
    for pol in ('xx', 'yx', 'xy', 'yy'):
        tr, ti = fmm.sparam_xy_pair(S, intr['kx'], intr['ky'],
                                    (jnp.asarray(1.46 ** 2, r64), zero),
                                    one, spec.order, [0, 0], [0, 0], pol)
        t_fn = complex(float(tr[0]), float(ti[0]))
        assert abs(t_fn - t_cl[pol]) < 1e-8, (pol, t_fn, t_cl[pol])
