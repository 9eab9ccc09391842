"""Example 5 — gradient-based shape optimization
(reference example/Example5.ipynb).

Optimize the width/height of a rectangular meta-atom to maximize the
polarization anisotropy |t_xx|^2 - |t_yy|^2 (the reference's FoM), with
the hand-rolled ADAM matching the notebook and checkpoint/resume via
torcwa_tpu.utils.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import jax

# The reference-compatible class API stores complex arrays, which this
# TPU runtime does not lower; run it on CPU.  The TPU execution path is
# the split-real torcwa_tpu.fmm module (see example1/3/6).
if __name__ == '__main__':
    jax.config.update('jax_platforms', 'cpu')


import os

import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu.optim import adam_init, adam_update
from torcwa_tpu.utils import save_state, load_state

L = [500., 500.]
ITERS = int(os.environ.get('EX5_ITERS', '20'))
CKPT = 'example5_state.npz'


def fom(params):
    wx = 100. + 300. * params[0]
    wy = 100. + 300. * params[1]
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=200, ny=200, edge_sharpness=200.)
    geom = g.rectangle(wx, wy, L[0] / 2., L[1] / 2.)
    eps = geom * (3.48 ** 2) + (1. - geom)
    sim = tt.rcwa(freq=1 / 900., order=[4, 4], L=L)
    sim.add_input_layer(eps=1.46 ** 2)
    sim.set_incident_angle(inc_ang=0., azi_ang=0.)
    sim.add_layer(thickness=600., eps=eps)
    sim.solve_global_smatrix()
    txx = sim.S_parameters(orders=[0, 0], direction='forward',
                           port='transmission', polarization='xx',
                           ref_order=[0, 0])
    tyy = sim.S_parameters(orders=[0, 0], direction='forward',
                           port='transmission', polarization='yy',
                           ref_order=[0, 0])
    return (jnp.abs(txx) ** 2 - jnp.abs(tyy) ** 2)[0]


if __name__ == '__main__':
    if os.path.exists(CKPT):
        st = load_state(CKPT)
        params, m, v, step = st['params'], st['m'], st['v'], int(st['step'])
        print(f'resumed from {CKPT} at step {step}')
    else:
        params = jnp.asarray([0.5, 0.3])
        m, v, step = adam_init(params)

    vg = jax.value_and_grad(fom)
    for it in range(ITERS):
        f, g = vg(params)
        # maximize: ascend
        params, m, v, step = adam_update(params, jax.tree.map(lambda x: -x, g),
                                         m, v, step, lr=0.05)
        print(f'iter {step:3d}: FoM = {float(f):+.5f}  '
              f'Wx={100 + 300 * float(params[0]):6.1f} '
              f'Wy={100 + 300 * float(params[1]):6.1f}', flush=True)
    save_state(CKPT, {'params': params, 'm': m, 'v': v, 'step': step})
    print(f'checkpoint saved to {CKPT} (rerun to resume)')
