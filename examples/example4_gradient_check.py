"""Example 4 — gradient validation (reference example/Example4.ipynb).

Three-way comparison of dT/dR for a cylindrical meta-atom: numerical
central difference vs exact autodiff vs the broadening-stabilized eig
backward.  This is the acceptance test of the differentiable solve.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import jax

# This comparison needs float64 (central-difference truth at dR=0.005);
# the TPU has no f64, so pin the CPU backend.
if __name__ == '__main__':
    jax.config.update('jax_platforms', 'cpu')


import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt

L = [300., 300.]


def T_of_R(R, stable=True, broadening=1e-10):
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=200, ny=200, edge_sharpness=500.)
    geom = g.circle(R, L[0] / 2., L[1] / 2.)
    eps = geom * (2.0709 ** 2) + (1. - geom)
    tt.Eig.broadening_parameter = broadening
    sim = tt.rcwa(freq=1 / 473., order=[4, 4], L=L, stable_eig_grad=stable)
    sim.add_input_layer(eps=1.46 ** 2)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    sim.add_layer(thickness=600., eps=eps)
    sim.solve_global_smatrix()
    txx = sim.S_parameters(orders=[0, 0], direction='forward',
                           port='transmission', polarization='xx',
                           ref_order=[0, 0])
    return (jnp.abs(txx) ** 2)[0]


if __name__ == '__main__':
    dR = 0.05
    print(f'{"R":>6} {"T":>9} {"dT/dR fd":>12} {"exact":>12} {"broadened":>12}')
    for R in [90., 100.]:
        T = float(T_of_R(R))
        fd = (float(T_of_R(R + dR)) - float(T_of_R(R - dR))) / (2 * dR)
        exact = float(jax.grad(T_of_R)(R, stable=False))
        broad = float(jax.grad(T_of_R)(R, stable=True, broadening=1e-10))
        print(f'{R:6.1f} {T:9.5f} {fd:12.3e} {exact:12.3e} {broad:12.3e}')
        # the unstabilized backward can NaN at exact degeneracies — the
        # reference's Example4 demonstrates the same; the broadened
        # backward is the production path
        assert np.isclose(broad, fd, rtol=5e-2, atol=2e-5)
    print('broadened autodiff matches finite differences.')
