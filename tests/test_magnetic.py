"""Magnetic-material (mu != 1) golden parity vs the PyTorch reference.

The reference supports mu end to end — mu claddings (rcwa.py:95-121),
homogeneous mu layers, and patterned mu grids through _material_conv and
the full P/Q construction (rcwa.py:146-170, 1226-1232) — but none of its
example notebooks exercises it.  scripts/make_goldens.py::golden_magnetic
pins a two-layer stack with mu != 1 claddings, a homogeneous mu layer,
and a layer with BOTH patterned eps and patterned mu, at oblique
incidence; this test runs the same configuration through the split-real
class API (S-parameters in both bases + an xz field cut)."""

import numpy as np
import jax.numpy as jnp
import pytest

import torcwa_tpu as tt

L = [300., 300.]
ORDERS = [[0, 0], [1, 0], [0, -1], [1, 1]]


@pytest.fixture(scope='module')
def sim(golden):
    g = golden('magnetic')      # skips if missing
    geo = tt.geometry(Lx=L[0], Ly=L[1], nx=192, ny=192,
                      edge_sharpness=1000., dtype=jnp.float32)
    geom = geo.rectangle(150., 110., L[0] / 2., L[1] / 2., theta=0.3)
    layer_eps = geom * (4.2 + 0.25j) + (1. - geom)
    layer_mu = geom * (1.8 + 0.05j) + (1. - geom) * 1.1
    s = tt.rcwa(freq=1 / 620., order=[3, 3], L=L, dtype=jnp.complex64)
    s.add_input_layer(eps=1.46 ** 2, mu=1.2)
    s.add_output_layer(eps=1.1 ** 2, mu=0.9)
    s.set_incident_angle(inc_ang=10. * np.pi / 180,
                         azi_ang=35. * np.pi / 180)
    s.add_layer(thickness=180., eps=2.25, mu=1.6)
    s.add_layer(thickness=240., eps=layer_eps, mu=layer_mu)
    s.solve_global_smatrix()
    return s, g


@pytest.mark.slow
def test_sparams_magnetic(sim):
    s, g = sim
    for pol in ['xx', 'yy', 'xy', 'yx', 'pp', 'ss']:
        for port, pre in [('transmission', 't'), ('reflection', 'r')]:
            ours = np.asarray(s.S_parameters(
                orders=ORDERS, direction='forward', port=port,
                polarization=pol, ref_order=[0, 0]))
            assert np.allclose(ours, g[f'{pre}{pol}'], atol=4e-3), (pol, port)


@pytest.mark.slow
def test_fields_magnetic(sim):
    s, g = sim
    s.source_planewave(amplitude=[1., 0.3], direction='forward')
    x = np.linspace(0., L[0], 12)
    z = np.linspace(-100., 520., 15)
    E, H = s.field_xz(x, z, L[1] / 2)
    for ours, ref in [(E, g['fxz_E']), (H, g['fxz_H'])]:
        ours = np.stack([np.asarray(c) for c in ours])
        scale = np.abs(ref).max()
        assert np.allclose(ours, ref, atol=3e-3 * scale), \
            np.abs(ours - ref).max() / scale
