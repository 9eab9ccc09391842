"""Order-25 forward solve artifact: one full RCWA solve at 2N=5202."""
import time
import numpy as np, jax, jax.numpy as jnp
print('backend:', jax.default_backend(), flush=True)
import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair

rdtype = jnp.float32
ORDER = (25, 25)
L = (300., 300.)

def t00(w):
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=300, ny=300, edge_sharpness=1000.,
                    dtype=rdtype)
    geom = g.rectangle(w, w, 150., 150.)
    er = geom * 15.35 + (1. - geom)
    ei = geom * 0.17
    spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
    S, intr = solve_stack_pair(
        spec, jnp.asarray(1/532., rdtype), jnp.asarray(0., rdtype),
        jnp.asarray(0., rdtype), (er[None], ei[None]),
        jnp.asarray([300.], rdtype),
        eps_in=(jnp.asarray(1.46**2, rdtype), jnp.asarray(0., rdtype)))
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(1.46**2, rdtype),
                             jnp.asarray(0., rdtype)), one,
                            ORDER, [0, 0], [0, 0], 'xx')
    return tr[0], ti[0]

f = jax.jit(t00)
tr, ti = f(jnp.asarray(120.0, rdtype))
print('warm t00 =', float(tr), float(ti), flush=True)
t0 = time.time()
tr, ti = f(jnp.asarray(120.5, rdtype))
v = (float(tr), float(ti))
dt = time.time() - t0
print(f'order-25 forward solve: {dt:.2f} s  t00 = {v[0]:.6f} {v[1]:+.6f}j '
      f'|t|^2 = {v[0]**2 + v[1]**2:.6f}', flush=True)
print('DONE', flush=True)
