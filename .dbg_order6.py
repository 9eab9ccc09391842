import numpy as np
import jax
import jax.numpy as jnp
import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair

ORDER, GRID = 6, 256
L = (300., 300.)
rdtype = jnp.float32
g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500.,
                dtype=rdtype)
geom = g.rectangle(160., 160., L[0] / 2., L[1] / 2.)
eps = jnp.asarray(geom * 2.0709 ** 2 + (1. - geom), rdtype)
spec = StackSpec(order=(ORDER, ORDER), L=L, n_layers=1, has_input=True)


def T(freq, er):
    S, intr = solve_stack_pair(
        spec, freq, jnp.asarray(0., rdtype), jnp.asarray(0., rdtype),
        (er[None], jnp.zeros_like(er)[None]), jnp.asarray([600.], rdtype),
        eps_in=(jnp.asarray(1.46 ** 2, rdtype), jnp.asarray(0., rdtype)),
        eig_backend='qr')
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(1.46 ** 2, rdtype),
                             jnp.asarray(0., rdtype)), one,
                            spec.order, [0, 0], [0, 0], 'xx')
    return (tr ** 2 + ti ** 2)[0]


f = jax.jit(T)
gfn = jax.jit(jax.grad(T, argnums=1))
for lam in np.linspace(400., 700., 8):
    val = float(f(jnp.asarray(1 / lam, rdtype), eps))
    gv = gfn(jnp.asarray(1 / lam, rdtype), eps)
    gok = bool(jnp.all(jnp.isfinite(gv)))
    print(f'lam={lam:7.2f}  T={val:.6f}  grad finite={gok}', flush=True)
