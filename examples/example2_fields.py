"""Example 2 — oblique incidence + field reconstruction
(reference example/Example2.ipynb).

A square meta-atom under oblique incidence; reconstruct E/H field maps in
the xz plane and an xy cut inside the layer, and the per-order
diffraction angles.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
import jax.numpy as jnp

import torcwa_tpu as tt

L = [500., 500.]

if __name__ == '__main__':
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=200, ny=200, edge_sharpness=1000.)
    sq = g.square(W=300., Cx=L[0] / 2., Cy=L[1] / 2.)
    eps = sq * (3.5 ** 2) + (1. - sq)

    sim = tt.rcwa(freq=1 / 600., order=[5, 5], L=L)
    sim.add_input_layer(eps=1.46 ** 2)
    sim.add_output_layer(eps=1.)
    sim.set_incident_angle(inc_ang=np.deg2rad(20.), azi_ang=0.)
    sim.add_layer(thickness=400., eps=eps)
    sim.solve_global_smatrix()

    ang = sim.diffraction_angle(orders=[[0, 0], [1, 0], [-1, 0]],
                                layer='output', unit='degree')
    print('diffraction angles (deg):')
    for (m, n), (inc, azi) in zip([[0, 0], [1, 0], [-1, 0]],
                                  zip(np.atleast_1d(ang[0]),
                                      np.atleast_1d(ang[1]))):
        print(f'  order ({m:+d},{n:+d}): inclination {float(inc):7.2f}'
              f'  azimuth {float(azi):7.2f}')

    sim.source_planewave(amplitude=[1., 0.], direction='forward')
    x = jnp.linspace(0., L[0], 101)
    z = jnp.linspace(-300., 700., 101)
    def abs2(t):
        """|t|^2 for complex arrays (CPU) or (re, im) pairs (TPU)."""
        if isinstance(t, tuple):
            return t[0] ** 2 + t[1] ** 2
        return jnp.abs(t) ** 2

    (Ex, Ey, Ez), (Hx, Hy, Hz) = sim.field_xz(x, z, y=L[1] / 2.)
    I = abs2(Ex) + abs2(Ey) + abs2(Ez)
    print(f'\n|E|^2 over the xz plane: min {float(I.min()):.4f} '
          f'max {float(I.max()):.4f}')

    (Exs, Eys, Ezs), _ = sim.field_xy(layer_num=0, x_axis=x, y_axis=x,
                                      z_prop=200.)
    Ixy = abs2(Exs) + abs2(Eys) + abs2(Ezs)
    print(f'|E|^2 at mid-layer xy cut: min {float(Ixy.min()):.4f} '
          f'max {float(Ixy.max()):.4f}')

    # chip-gate assertions (not just prints): fields finite and within a
    # physically plausible envelope for a unit-amplitude planewave source
    # (reference scale: Example2.ipynb's |E| maps peak at a few units)
    for name, arr in [('I_xz', np.asarray(I)), ('I_xy', np.asarray(Ixy))]:
        assert np.isfinite(arr).all(), f'{name} has non-finite entries'
        assert 0.05 < float(arr.max()) < 100., \
            f'{name} max {float(arr.max()):.3g} implausible'
    print('EXAMPLE2 FIELD CHECKS PASS')
