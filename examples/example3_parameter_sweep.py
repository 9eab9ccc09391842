"""Example 3 — geometry (Wx, Wy) parameter sweep with .mat export
(reference example/Example3.ipynb).

The reference sweeps an 11x11 grid of rectangle widths in a sequential
double loop (156 s/solve on its CPU baseline).  Here the whole grid is a
single vmapped solve; results export to .mat as the notebooks do.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import time

import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair
from torcwa_tpu.utils import save_mat

L = (400., 400.)
ORDER = (4, 4)
GRID = 128
NW = 5                       # 5x5 grid (the reference uses 11x11)
rdtype = jnp.float32


def t00_of_wxwy(wx, wy):
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500.,
                    dtype=rdtype)
    geom = g.rectangle(wx, wy, L[0] / 2., L[1] / 2.)
    er = geom * (3.48 ** 2) + (1. - geom)
    spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
    S, intr = solve_stack_pair(
        spec, jnp.asarray(1 / 1550., rdtype), jnp.asarray(0., rdtype),
        jnp.asarray(0., rdtype), (er[None], jnp.zeros_like(er)[None]),
        jnp.asarray([600.], rdtype),
        eps_in=(jnp.asarray(1.46 ** 2, rdtype), jnp.asarray(0., rdtype)))
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(1.46 ** 2, rdtype),
                             jnp.asarray(0., rdtype)), one,
                            ORDER, [0, 0], [0, 0], 'xx')
    return tr[0], ti[0]


if __name__ == '__main__':
    w = np.linspace(80., 320., NW).astype(np.float32)
    Wx, Wy = np.meshgrid(w, w, indexing='ij')
    pts = jnp.asarray(np.stack([Wx.ravel(), Wy.ravel()], 1))
    sweep = jax.jit(lambda p: jax.vmap(lambda q: t00_of_wxwy(q[0], q[1]))(p))
    tr, ti = sweep(pts + 0.01)     # warm up on perturbed inputs
    np.asarray(tr)
    t0 = time.time()
    tr, ti = sweep(pts)
    # complex values stay split-real on device; fuse on host
    t = (np.asarray(tr) + 1j * np.asarray(ti)).reshape(NW, NW)
    dt = time.time() - t0
    print('|t00|^2 over the (Wx, Wy) grid:')
    print(np.round(np.abs(t) ** 2, 4))
    print(f'{NW * NW} solves in {dt*1e3:.0f} ms '
          f'({dt/(NW*NW)*1e3:.1f} ms/solve) on {jax.default_backend()}')
    save_mat('example3_sweep.mat', {'Wx': Wx, 'Wy': Wy, 'txx': t})
    print('saved example3_sweep.mat')
