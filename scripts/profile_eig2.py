"""Eig timing with fresh inputs per rep (defeats any result caching) and
host materialization as the completion barrier."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
import jax
import jax.numpy as jnp
from torcwa_tpu.ops import eig_qr_real as eqr

n = int(sys.argv[1]) if len(sys.argv) > 1 else 162
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
reps = 3

rng = np.random.default_rng(0)
mats = [(jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32),
         jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32))
        for _ in range(reps + 1)]

print(f'backend={jax.default_backend()} n={n} batch={batch}', flush=True)
f = jax.jit(eqr.eig_qr_real)
t0 = time.time()
out = f(*mats[0])
s = float(jnp.sum(out[0]))
print(f'compile+first: {time.time()-t0:.1f}s (checksum {s:.3f})', flush=True)
t0 = time.time()
for i in range(reps):
    out = f(*mats[i + 1])
    s = float(jnp.sum(out[0]))
dt = (time.time() - t0) / reps
print(f'steady: {dt*1e3:.1f} ms/call  ({dt*1e3/batch:.2f} ms/matrix)',
      flush=True)

# residual check on last
An = np.asarray(mats[-1][0][0]) + 1j * np.asarray(mats[-1][1][0])
w = np.asarray(out[0][0]) + 1j * np.asarray(out[1][0])
V = np.asarray(out[2][0]) + 1j * np.asarray(out[3][0])
res = np.linalg.norm(An @ V - V * w[None, :], axis=0).max()
print(f'max residual: {res:.3e}')
