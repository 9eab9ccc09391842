"""Example 6 — topology optimization of first-order diffraction
(reference example/Example6.ipynb).

A free-form density rho on the unit cell is blurred (fabrication radius),
tanh-projected toward binary, mapped to permittivity, and optimized to
maximize the (+1, 0) transmitted order.  Gradients flow through the
whole solve including the stabilized eig backward; ADAM + projection
schedule mirror the notebook.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair
from torcwa_tpu.optim import (adam_init, adam_update, gaussian_blur,
                              tanh_projection)

L = (1400., 700.)   # period > lambda so the +1 order propagates
ORDER = (5, 2)
NX, NY = 140, 70
ITERS = int(os.environ.get('EX6_ITERS', '30'))
rdtype = jnp.float32
EPS_HI = 3.48 ** 2


def fom(rho, beta):
    rho_f = gaussian_blur(rho, sigma_cells=2.0)
    rho_p = tanh_projection(rho_f, beta)
    er = 1. + rho_p * (EPS_HI - 1.)
    spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
    S, intr = solve_stack_pair(
        spec, jnp.asarray(1 / 1050., rdtype), jnp.asarray(0., rdtype),
        jnp.asarray(0., rdtype), (er[None], jnp.zeros_like(er)[None]),
        jnp.asarray([325.], rdtype),
        eps_in=(jnp.asarray(1.46 ** 2, rdtype), jnp.asarray(0., rdtype)))
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(1.46 ** 2, rdtype),
                             jnp.asarray(0., rdtype)), one,
                            ORDER, [1, 0], [0, 0], 'xx')
    return (tr ** 2 + ti ** 2)[0]


if __name__ == '__main__':
    key = jax.random.PRNGKey(333)          # reference seeds its runs too
    rho = 0.5 + 0.01 * jax.random.normal(key, (NX, NY), rdtype)
    # mirror symmetry like the notebook
    rho = (rho + rho[:, ::-1]) / 2
    m, v, step = adam_init(rho)
    vg = jax.jit(jax.value_and_grad(fom), static_argnames=())

    t0 = time.time()
    for it in range(ITERS):
        beta = jnp.asarray(1. + 9. * it / max(ITERS - 1, 1), rdtype)
        f, g = vg(rho, beta)
        rho, m, v, step = adam_update(rho, -g, m, v, step, lr=0.05)
        rho = (rho + rho[:, ::-1]) / 2
        if it % 5 == 0 or it == ITERS - 1:
            print(f'iter {it:3d}: FoM = {float(f):.5f}  beta={float(beta):.1f}'
                  f'  ({(time.time()-t0)/(it+1):.2f} s/iter)', flush=True)
    print(f'final FoM {float(f):.5f} on {jax.default_backend()}')
