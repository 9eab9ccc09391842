"""Example 1 — rectangular meta-atom wavelength sweep
(reference example/Example1.ipynb).

Transmission t_xx of the (0,0) order for a rectangular SiN pillar on a
SiO2 substrate, swept over wavelength.  The reference loops wavelengths
in Python (cell 2); here the whole sweep is one vmapped, jitted solve —
on TPU it also uses the batched Pallas eigensolver, and with multiple
chips the sweep axis shards over the mesh (torcwa_tpu.parallel).
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

L = (300., 300.)
ORDER = (4, 4)
GRID = 256
LAMBDAS = np.linspace(400., 700., 31)
rdtype = jnp.float32


def build_eps():
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500.,
                    dtype=rdtype)
    geom = g.rectangle(160., 160., L[0] / 2., L[1] / 2.)
    return jnp.asarray(geom * 2.0709 ** 2 + (1. - geom), rdtype)


def t00(freq, er):
    spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
    S, intr = solve_stack_pair(
        spec, freq, jnp.asarray(0., rdtype), jnp.asarray(0., rdtype),
        (er[None], jnp.zeros_like(er)[None]), jnp.asarray([600.], rdtype),
        eps_in=(jnp.asarray(1.46 ** 2, rdtype), jnp.asarray(0., rdtype)))
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(1.46 ** 2, rdtype),
                             jnp.asarray(0., rdtype)), one,
                            ORDER, [0, 0], [0, 0], 'xx')
    return (tr ** 2 + ti ** 2)[0]


if __name__ == '__main__':
    eps = build_eps()
    freqs = jnp.asarray(1.0 / LAMBDAS, rdtype)
    sweep = jax.jit(lambda er: jax.vmap(lambda f: t00(f, er))(freqs))
    T = sweep(eps)
    T.block_until_ready()
    t0 = time.time()
    T = sweep(eps)
    T.block_until_ready()
    dt = time.time() - t0
    for lam, t in zip(LAMBDAS, np.asarray(T)):
        print(f'lambda={lam:6.1f} nm   T00={t:.5f}')
    print(f'\n{len(LAMBDAS)} wavelengths in {dt*1e3:.0f} ms '
          f'({dt/len(LAMBDAS)*1e3:.1f} ms/solve) on {jax.default_backend()}')
