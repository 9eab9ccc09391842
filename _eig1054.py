import time
import numpy as np, jax, jax.numpy as jnp
from torcwa_tpu.ops.eig import eig_pair
print('backend:', jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n = 1054
A = rng.standard_normal((n, n)).astype(np.float32) * 0.1
Ai = rng.standard_normal((n, n)).astype(np.float32) * 0.1
t0 = time.time()
wr, wi, vr, vi = eig_pair(jnp.asarray(A), jnp.asarray(Ai), 'auto', 'qr')
s = float(jnp.sum(wr))
print(f'n={n} compile+run {time.time()-t0:.1f}s  sum(wr)={s:.4f}', flush=True)
# residual check: A V = V diag(w) on a few columns
Vc = np.asarray(vr) + 1j*np.asarray(vi)
Ac = A + 1j*Ai
w = np.asarray(wr) + 1j*np.asarray(wi)
r = np.linalg.norm(Ac @ Vc[:, :8] - Vc[:, :8] * w[None, :8]) / np.linalg.norm(Vc[:, :8])
print(f'residual(first 8 cols) = {r:.3e}', flush=True)
t0 = time.time()
wr2, _, _, _ = eig_pair(jnp.asarray(A*1.0001), jnp.asarray(Ai), 'auto', 'qr')
float(jnp.sum(wr2)); print(f'steady-state {time.time()-t0:.1f}s', flush=True)
