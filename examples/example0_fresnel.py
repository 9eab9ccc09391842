"""Example 0 — Fresnel equations (reference example/Example0.ipynb).

A bare interface between vacuum and a dielectric: RCWA with zero internal
layers must reproduce the analytic Fresnel reflection coefficients for TM
and TE polarization over incidence angle.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt

N_SUB = 2.0


def abs2(t):
    """|t|^2 for complex arrays (CPU) or (re, im) pairs (TPU 'auto')."""
    if isinstance(t, tuple):
        return t[0] ** 2 + t[1] ** 2
    return jnp.abs(t) ** 2


def rcwa_reflection(inc_deg):
    sim = tt.rcwa(freq=1 / 500., order=[1, 1], L=[300., 300.])
    sim.add_output_layer(eps=N_SUB ** 2)
    sim.set_incident_angle(inc_ang=np.deg2rad(inc_deg), azi_ang=0.)
    sim.solve_global_smatrix()
    rpp = sim.S_parameters(orders=[0, 0], direction='forward',
                           port='reflection', polarization='pp',
                           ref_order=[0, 0])
    rss = sim.S_parameters(orders=[0, 0], direction='forward',
                           port='reflection', polarization='ss',
                           ref_order=[0, 0])
    return float(abs2(rpp)[0]), float(abs2(rss)[0])


def fresnel(inc_deg, n2=N_SUB):
    th = np.deg2rad(inc_deg)
    ct = np.cos(th)
    st = np.sin(th)
    kz2 = np.sqrt(n2 ** 2 - st ** 2 + 0j)
    r_tm = (n2 ** 2 * ct - kz2) / (n2 ** 2 * ct + kz2)
    r_te = (ct - kz2) / (ct + kz2)
    return abs(r_tm) ** 2, abs(r_te) ** 2


if __name__ == '__main__':
    print(f'{"angle":>6} {"R_TM rcwa":>10} {"R_TM exact":>10}'
          f' {"R_TE rcwa":>10} {"R_TE exact":>10}')
    for ang in range(0, 90, 10):
        rp, rs = rcwa_reflection(ang)
        fp, fs = fresnel(ang)
        print(f'{ang:6d} {rp:10.5f} {fp:10.5f} {rs:10.5f} {fs:10.5f}')
        # mixed tolerance: 2e-3 absolute, 1% relative (f32 on chip loses
        # ~0.8% near grazing incidence where kz -> 0)
        tol = lambda f: max(2e-3, 0.01 * f)
        assert abs(rp - fp) < tol(fp) and abs(rs - fs) < tol(fs), 'mismatch!'
    print('RCWA matches Fresnel.')
