"""Drive the split-real functional RCWA path on the real TPU chip."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import time
import jax
import jax.numpy as jnp
import numpy as np
import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, simulate_txx

print('backend:', jax.default_backend(), jax.devices())

L = (300., 300.)
g = tt.geometry(Lx=L[0], Ly=L[1], nx=256, ny=256, edge_sharpness=500.,
                dtype=jnp.float32)
geom = g.circle(95., L[0] / 2., L[1] / 2.)
eps = geom * 2.0709 ** 2 + (1. - geom)

spec = StackSpec(order=(4, 4), L=L, n_layers=1, has_input=True)
freq = jnp.asarray(1 / 473., jnp.float32)
er = jnp.asarray(eps, jnp.float32)
ei = jnp.zeros_like(er)
th = jnp.asarray(600., jnp.float32)
eps_in = jnp.asarray(1.46 ** 2, jnp.float32)

t0 = time.time()
T = simulate_txx(spec, freq, er, ei, th, eps_in, eig_backend='qr')
T.block_until_ready()
print(f'TPU compile+run: {time.time()-t0:.1f}s  T={float(T):.6f}')
t0 = time.time()
T = simulate_txx(spec, freq, er, ei, th, eps_in, eig_backend='qr')
T.block_until_ready()
print(f'TPU steady-state: {(time.time()-t0)*1e3:.1f}ms  T={float(T):.6f}')

# gradient on TPU through the split-real eig VJP
t0 = time.time()
gfn = jax.jit(jax.grad(
    lambda er_: simulate_txx(spec, freq, er_, ei, th, eps_in,
                             eig_backend='qr')))
gv = gfn(er)
gv.block_until_ready()
print(f'TPU grad compile+run: {time.time()-t0:.1f}s  |g|={float(jnp.linalg.norm(gv)):.3e}  finite={bool(jnp.all(jnp.isfinite(gv)))}')
t0 = time.time()
gv = gfn(er); gv.block_until_ready()
print(f'TPU grad steady-state: {(time.time()-t0)*1e3:.1f}ms')
