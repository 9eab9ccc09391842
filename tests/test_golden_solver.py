"""Golden parity tests: patterned layers, multilayer stacks, oblique
incidence and field reconstruction vs the PyTorch reference (complex64)."""

import numpy as np
import jax.numpy as jnp
import pytest

import torcwa_tpu as tt

L = [300., 300.]
SUBSTRATE_EPS = 1.46 ** 2
SU8_EPS = 1.6 ** 2
ORDERS6 = [[0, 0], [1, 0], [0, 1], [-1, 0], [1, 1], [2, 0]]

# a-Si:H eps at the golden wavelengths: derived once from the reference's
# measured table with the reference's own interpolation (scipy cubic at
# float32 wavelength, /root/reference/example/Materials.py:19-45) and
# recorded here, exactly like the golden .npz outputs themselves — so
# the parity suite runs with no reference checkout mounted.
SI_EPS = {
    400.: 16.24464604339499 + 3.9697033465479983j,
    532.: 12.011610263133004 + 0.5259120147560001j,
    650.: 10.362267239174999 + 0.15362360819199997j,
    700.: 9.985966439994998 + 0.11010441325199999j,
}


def _si_eps(lamb0):
    """a-Si:H eps at a golden wavelength (recorded input, see SI_EPS)."""
    if lamb0 in SI_EPS:
        return SI_EPS[lamb0]
    import os
    path = '/root/reference/example/Materials_data/aSiH.txt'
    if not os.path.exists(path):
        pytest.skip('wavelength not in SI_EPS and reference table '
                    'unavailable')
    data = np.loadtxt(path)
    from scipy.interpolate import interp1d
    n_i = interp1d(data[:, 0], data[:, 1], kind='cubic')
    k_i = interp1d(data[:, 0], data[:, 2], kind='cubic')
    lam = np.float32(lamb0)  # match the reference's float32 wavelength
    return complex(n_i(lam) + 1j * k_i(lam)) ** 2


def _rect_sim(lamb0, geom, order=(5, 5), thickness=300.):
    si = _si_eps(lamb0)
    eps = jnp.asarray(geom) * si + (1. - jnp.asarray(geom))
    sim = tt.rcwa(freq=1 / lamb0, order=list(order), L=L, dtype=jnp.complex64)
    sim.add_input_layer(eps=SUBSTRATE_EPS)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    sim.add_layer(thickness=thickness, eps=eps)
    sim.solve_global_smatrix()
    return sim


@pytest.fixture(scope='module')
def ex1(golden):
    return golden('example1')


@pytest.fixture(scope='module')
def sim532(ex1):
    return _rect_sim(532., ex1['geom'])


def test_sparams_all_pols(ex1, sim532):
    for il, lamb0 in enumerate(ex1['lambs']):
        sim = sim532 if il == 1 else _rect_sim(float(lamb0), ex1['geom'])
        for pol in ['xx', 'yy', 'xy', 'yx']:
            for port, pre in [('transmission', 't'), ('reflection', 'r')]:
                ours = np.asarray(sim.S_parameters(
                    orders=ORDERS6, direction='forward', port=port,
                    polarization=pol, ref_order=[0, 0]))
                ref = ex1[f'{pre}{pol}_{il}']
                assert np.allclose(ours, ref, atol=4e-3), (il, pol, port)
        for key, direction, port in [(f'tb_xx_{il}', 'backward', 'transmission'),
                                     (f'rb_xx_{il}', 'backward', 'reflection')]:
            ours = np.asarray(sim.S_parameters(
                orders=ORDERS6, direction=direction, port=port,
                polarization='xx', ref_order=[0, 0]))
            assert np.allclose(ours, ex1[key], atol=4e-3), key


def test_diffraction_angle(ex1, sim532):
    inc, azi = sim532.diffraction_angle(ORDERS6, layer='output', unit='radian')
    assert np.allclose(np.asarray(inc), ex1['diff_inc'], atol=1e-5)
    assert np.allclose(np.asarray(azi), ex1['diff_azi'], atol=1e-5)


def test_return_layer(ex1, sim532):
    eps_rec, _ = sim532.return_layer(0, nx=64, ny=64)
    assert np.allclose(np.asarray(eps_rec), ex1['eps_recover'], atol=2e-3)


def _field_close(ours, ref, atol):
    ours = np.stack([np.asarray(c) for c in ours])
    scale = np.abs(ref).max()
    assert np.allclose(ours, ref, atol=atol * scale), \
        f'max err {np.abs(ours - ref).max()} vs scale {scale}'


def test_fields_xz(ex1, sim532):
    sim532.source_planewave(amplitude=[1., 0.], direction='forward')
    x = np.linspace(0., L[0], 24)
    z = np.linspace(-200., 500., 29)
    E, H = sim532.field_xz(x, z, L[1] / 2)
    _field_close(E, ex1['fxz_E'], 2e-3)
    _field_close(H, ex1['fxz_H'], 2e-3)


def test_fields_yz(ex1, sim532):
    sim532.source_planewave(amplitude=[1., 0.], direction='forward')
    y = np.linspace(0., L[1], 20)
    z = np.linspace(-200., 500., 29)
    E, H = sim532.field_yz(y, z, L[0] / 2)
    _field_close(E, ex1['fyz_E'], 2e-3)
    _field_close(H, ex1['fyz_H'], 2e-3)


def test_fields_xy(ex1, sim532):
    sim532.source_planewave(amplitude=[1., 0.], direction='forward')
    x = np.linspace(0., L[0], 24)
    y = np.linspace(0., L[1], 20)
    E, _ = sim532.field_xy(0, x, y, z_prop=150.)
    _field_close(E, ex1['fxy_E'], 2e-3)
    E, _ = sim532.field_xy(-1, x, y, z_prop=-50.)
    _field_close(E, ex1['fxy_in_E'], 2e-3)
    E, _ = sim532.field_xy(1, x, y, z_prop=100.)
    _field_close(E, ex1['fxy_out_E'], 2e-3)


def test_fields_backward_source(ex1, sim532):
    sim532.source_planewave(amplitude=[0., 1.], direction='backward')
    x = np.linspace(0., L[0], 24)
    z = np.linspace(-200., 500., 29)
    E, H = sim532.field_xz(x, z, L[1] / 2)
    _field_close(E, ex1['fxz_bwd_E'], 2e-3)
    _field_close(H, ex1['fxz_bwd_H'], 2e-3)


@pytest.mark.slow
def test_example2_oblique_with_output_layer(golden):
    g = golden('example2')
    si = _si_eps(532.)
    tt.rcwa_geo.Lx = tt.rcwa_geo.Ly = 300.
    tt.rcwa_geo.nx = tt.rcwa_geo.ny = 256
    tt.rcwa_geo.edge_sharpness = 1000.
    geom = tt.rcwa_geo.rectangle(Wx=120., Wy=120., Cx=150., Cy=150.)
    eps = geom * si + (1. - geom)
    sim = tt.rcwa(freq=1 / 532., order=[4, 4], L=L, dtype=jnp.complex64)
    sim.add_input_layer(eps=SUBSTRATE_EPS)
    sim.add_output_layer(eps=1.2 ** 2)
    sim.set_incident_angle(inc_ang=15. * np.pi / 180, azi_ang=20. * np.pi / 180)
    sim.add_layer(thickness=300., eps=eps)
    sim.solve_global_smatrix()

    orders = [[0, 0], [1, 0], [0, -1]]
    for pol in ['xx', 'yy', 'pp', 'ss', 'ps', 'sp']:
        for port, pre in [('transmission', 't'), ('reflection', 'r')]:
            ours = np.asarray(sim.S_parameters(orders=orders, direction='forward',
                                               port=port, polarization=pol,
                                               ref_order=[0, 0]))
            assert np.allclose(ours, g[f'{pre}{pol}'], atol=4e-3), (pol, port)

    sim.source_planewave(amplitude=[1., 0.5j], direction='forward', notation='ps')
    assert np.allclose(np.asarray(sim.E_i), g['E_i'], atol=1e-4)
    x = np.linspace(0., L[0], 16)
    z = np.linspace(-100., 400., 11)
    E, H = sim.field_xz(x, z, L[1] / 2)
    _field_close(E, g['fxz_E'], 3e-3)
    _field_close(H, g['fxz_H'], 3e-3)


@pytest.mark.slow
def test_example1_1_multilayer(golden):
    g = golden('example1_1')
    si = _si_eps(650.)
    tt.rcwa_geo.Lx = tt.rcwa_geo.Ly = 300.
    tt.rcwa_geo.nx = tt.rcwa_geo.ny = 256
    tt.rcwa_geo.edge_sharpness = 1000.
    mk = lambda th: tt.rcwa_geo.rectangle(Wx=180., Wy=100., Cx=150., Cy=150.,
                                          theta=th)
    g0, g2, g4 = mk(0.), mk(30 / 180 * np.pi), mk(60 / 180 * np.pi)
    sim = tt.rcwa(freq=1 / 650., order=[3, 3], L=L, dtype=jnp.complex64)
    sim.add_input_layer(eps=SUBSTRATE_EPS)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    for geom, t in [(g0, 200.), (None, 100.), (g2, 200.),
                    (None, 100.), (g4, 200.), (None, 100.)]:
        if geom is None:
            sim.add_layer(thickness=t, eps=SU8_EPS)
        else:
            sim.add_layer(thickness=t, eps=geom * si + (1. - geom) * SU8_EPS)
    sim.solve_global_smatrix()
    for pol in ['xx', 'yx', 'xy', 'yy']:
        ours = np.asarray(sim.S_parameters(orders=[0, 0], direction='forward',
                                           port='transmission', polarization=pol,
                                           ref_order=[0, 0]))
        assert np.allclose(ours, g[f't{pol}'], atol=4e-3), pol

    sim.source_planewave(amplitude=[1., 1.j], direction='forward')
    x = np.linspace(0., L[0], 12)
    z = np.linspace(-100., 1000., 23)
    E, H = sim.field_xz(x, z, L[1] / 2)
    _field_close(E, g['fxz_E'], 3e-3)
    _field_close(H, g['fxz_H'], 3e-3)
