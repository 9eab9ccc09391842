import numpy as np
import jax
import jax.numpy as jnp
import torcwa_tpu as tt
from torcwa_tpu import fmm
from torcwa_tpu.ops import cplx
from torcwa_tpu.ops.eig_qr_real import _eig_real_batched, _eig_real_single

ORDER, GRID = 6, 256
L = (300., 300.)
rdtype = jnp.float32
g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500.,
                dtype=rdtype)
geom = g.rectangle(160., 160., L[0] / 2., L[1] / 2.)
eps = jnp.asarray(geom * 2.0709 ** 2 + (1. - geom), rdtype)

# build the 8 P@Q matrices exactly as the sweep does
As = []
conv = fmm.dft_conv_pair((eps, jnp.zeros_like(eps)), (ORDER, ORDER),
                         GRID, GRID)
for lam in np.linspace(400., 700., 8):
    kx, ky = fmm.kvectors_real(jnp.asarray(1 / lam, rdtype),
                               jnp.asarray(0., rdtype),
                               jnp.asarray(0., rdtype),
                               jnp.asarray(1.46, rdtype),
                               (ORDER, ORDER), L, rdtype)
    P, Q = fmm.pq_pair(conv, kx, ky)
    A = cplx.cmm(P, Q)
    As.append(A)
Ar = jnp.stack([a[0] for a in As])
Ai = jnp.stack([a[1] for a in As])
print('batch shape', Ar.shape, flush=True)

wr, wi, vr, vi = _eig_real_batched(Ar, Ai)
for i in range(8):
    ok = bool(jnp.all(jnp.isfinite(wr[i])) & jnp.all(jnp.isfinite(vr[i])))
    An = np.asarray(Ar[i]) + 1j * np.asarray(Ai[i])
    V = np.asarray(vr[i]) + 1j * np.asarray(vi[i])
    w = np.asarray(wr[i]) + 1j * np.asarray(wi[i])
    res = float(np.linalg.norm(An @ V - V * w[None, :], axis=0).max())
    print(f'lane {i}: finite={ok} residual={res:.2e}', flush=True)
