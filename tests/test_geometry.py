"""Geometry rasterizer unit tests (vs closed-form level sets and the
reference's saved rasters)."""

import numpy as np
import jax.numpy as jnp

import torcwa_tpu as tt


def _np_sigmoid(x):
    return 1. / (1. + np.exp(-x))


def test_grid_cell_centered():
    g = tt.geometry(Lx=300., Ly=200., nx=30, ny=20)
    g.grid()
    assert np.allclose(np.asarray(g.x)[0], 300. / 30 * 0.5)
    assert np.allclose(np.asarray(g.y)[-1], 200. / 20 * 19.5)
    assert g.x_grid.shape == (30, 20)


def test_circle_matches_formula():
    g = tt.geometry(Lx=1., Ly=1., nx=50, ny=50, edge_sharpness=200.)
    r = np.asarray(g.circle(R=0.3, Cx=0.5, Cy=0.5))
    x = (1. / 50) * (np.arange(50) + 0.5)
    xg, yg = np.meshgrid(x, x, indexing='ij')
    level = 1. - np.sqrt(((xg - 0.5) / 0.3) ** 2 + ((yg - 0.5) / 0.3) ** 2)
    assert np.allclose(r, _np_sigmoid(200. * level), atol=2e-5)


def test_rectangle_rotation_symmetry():
    g = tt.geometry(Lx=1., Ly=1., nx=64, ny=64, edge_sharpness=500.)
    r0 = np.asarray(g.rectangle(0.4, 0.2, 0.5, 0.5, theta=0.))
    r90 = np.asarray(g.rectangle(0.4, 0.2, 0.5, 0.5, theta=np.pi / 2))
    # 90-degree rotation swaps the roles of Wx/Wy
    r_swap = np.asarray(g.rectangle(0.2, 0.4, 0.5, 0.5, theta=0.))
    assert np.allclose(r90, r_swap, atol=1e-4)
    assert not np.allclose(r0, r90)


def test_square_equals_rectangle():
    g = tt.geometry(nx=40, ny=40)
    assert np.allclose(np.asarray(g.square(0.3, 0.5, 0.5)),
                       np.asarray(g.rectangle(0.3, 0.3, 0.5, 0.5)))


def test_boolean_ops():
    g = tt.geometry(nx=40, ny=40, edge_sharpness=1000.)
    a = g.circle(0.2, 0.35, 0.5)
    b = g.circle(0.2, 0.65, 0.5)
    u = np.asarray(tt.geometry.union(a, b))
    i = np.asarray(tt.geometry.intersection(a, b))
    d = np.asarray(tt.geometry.difference(a, b))
    an, bn = np.asarray(a), np.asarray(b)
    assert np.allclose(u, np.maximum(an, bn))
    assert np.allclose(i, np.minimum(an, bn))
    assert np.allclose(d, np.minimum(an, 1. - bn))


def test_rcwa_geo_class_attrs():
    tt.rcwa_geo.Lx, tt.rcwa_geo.Ly = 300., 300.
    tt.rcwa_geo.nx = tt.rcwa_geo.ny = 64
    tt.rcwa_geo.edge_sharpness = 1000.
    r = tt.rcwa_geo.rectangle(Wx=180., Wy=100., Cx=150., Cy=150.)
    assert r.shape == (64, 64)
    # interior ~1, exterior ~0
    assert float(r[32, 32]) > 0.99
    assert float(r[0, 0]) < 0.01


def test_geometry_matches_reference_raster(golden):
    """The committed golden raster was produced by the reference geometry
    module (300x300 Example1 rectangle at 256x256 here)."""
    g = golden('example1')
    tt.rcwa_geo.Lx, tt.rcwa_geo.Ly = 300., 300.
    tt.rcwa_geo.nx = tt.rcwa_geo.ny = 256
    tt.rcwa_geo.edge_sharpness = 1000.
    tt.rcwa_geo.dtype = jnp.float32
    ours = np.asarray(tt.rcwa_geo.rectangle(Wx=180., Wy=100., Cx=150., Cy=150.))
    assert np.allclose(ours, g['geom'], atol=1e-5)


def test_geometry_differentiable():
    import jax

    def area(R):
        g = tt.geometry(Lx=1., Ly=1., nx=64, ny=64, edge_sharpness=100.)
        return jnp.mean(g.circle(R, 0.5, 0.5))

    dR = jax.grad(area)(0.3)
    # d(area)/dR ~ 2*pi*R (circumference) for the smoothed disk
    assert np.isclose(float(dR), 2 * np.pi * 0.3, rtol=0.1)
