import numpy as np
import jax
import jax.numpy as jnp
import importlib
import bench

jnp32 = jnp.float32
import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair

ORDER, GRID, NLAM = 6, 256, 8
L = (300., 300.)
g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500., dtype=jnp32)
geom = g.rectangle(160., 160., L[0]/2., L[1]/2.)
eps = jnp.asarray(geom * 2.0709**2 + (1.-geom), jnp32)
spec = StackSpec(order=(ORDER, ORDER), L=L, n_layers=1, has_input=True)
freqs = jnp.asarray(1.0/np.linspace(400., 700., NLAM), jnp32)

def point_T(freq, er):
    S, intr = solve_stack_pair(
        spec, freq, jnp.asarray(0., jnp32), jnp.asarray(0., jnp32),
        (er[None], jnp.zeros_like(er)[None]), jnp.asarray([600.], jnp32),
        eps_in=(jnp.asarray(1.46**2, jnp32), jnp.asarray(0., jnp32)),
        eig_backend='qr')
    one = (jnp.asarray(1., jnp32), jnp.asarray(0., jnp32))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(1.46**2, jnp32), jnp.asarray(0., jnp32)),
                            one, spec.order, [0,0], [0,0], 'xx')
    return (tr**2 + ti**2)[0]

# stage 1: vmapped forward only
vals = jax.jit(lambda er: jax.vmap(lambda f: point_T(f, er))(freqs))(eps)
print('vmapped fwd:', np.asarray(vals), flush=True)
# stage 2: value_and_grad of mean
val, grad = jax.jit(jax.value_and_grad(
    lambda er: jnp.mean(jax.vmap(lambda f: point_T(f, er))(freqs))))(eps)
print('mean T:', float(val), 'grad finite:', bool(jnp.all(jnp.isfinite(grad))),
      'nan count:', int(jnp.sum(~jnp.isfinite(grad))), flush=True)
