"""True per-stage timing with fresh inputs (no tunnel result caching)."""
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
reps = 3
rng = np.random.default_rng(0)
fresh = [(jnp.asarray(rng.standard_normal((n, n)), jnp.float32),
          jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
         for _ in range(reps)]

hess = jax.jit(eqr.hessenberg_real)
schur = jax.jit(eqr.schur_qr_real)
vecs = jax.jit(eqr.eig_tri_vectors_real)

# warm up all three on the first input
H = hess(*fresh[0])
S = schur(*H)
V = vecs(*S)
float(jnp.sum(V[0]))

for name in ['hess', 'schur', 'vecs']:
    t0 = time.time()
    for i in range(reps):
        H = hess(*fresh[i])
        if name != 'hess':
            S = schur(*H)
            if name == 'vecs':
                V = vecs(*S)
        out = {'hess': H, 'schur': S, 'vecs': V}[name]
        float(jnp.sum(out[0]))
    print(f'{name}: cumulative {((time.time()-t0)/reps)*1e3:.1f} ms',
          flush=True)
