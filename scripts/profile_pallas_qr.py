"""Time the Pallas Schur-QR kernel on TPU vs the XLA-loop version."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
import jax
import jax.numpy as jnp
from torcwa_tpu.ops import eig_qr_real as eqr
from torcwa_tpu.ops.eig_qr_pallas import schur_qr_pallas

n = int(sys.argv[1]) if len(sys.argv) > 1 else 162
reps = 3
rng = np.random.default_rng(0)
ins = []
for i in range(reps + 1):
    Ar = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    H = jax.jit(eqr.hessenberg_real)(Ar, Ai)
    ins.append(((Ar, Ai), H))

print(f'backend={jax.default_backend()} n={n}', flush=True)
t0 = time.time()
out = schur_qr_pallas(*ins[0][1])
float(jnp.sum(out[0]))
print(f'pallas compile+first: {time.time()-t0:.1f}s', flush=True)
t0 = time.time()
for i in range(reps):
    out = schur_qr_pallas(*ins[i + 1][1])
    float(jnp.sum(out[0]))
print(f'pallas steady: {(time.time()-t0)/reps*1e3:.1f} ms/matrix', flush=True)

# correctness on TPU
(Ar, Ai), H = ins[-1]
Tr, Ti, Zr, Zi = out
with jax.default_matmul_precision('highest'):
    Vr, Vi = jax.jit(eqr.eig_tri_vectors_real)(Tr, Ti, Zr, Zi)
An = np.asarray(Ar) + 1j * np.asarray(Ai)
w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
V = np.asarray(Vr) + 1j * np.asarray(Vi)
res = np.linalg.norm(An @ V - V * w[None, :], axis=0).max()
w0 = np.sort_complex(np.linalg.eig(An.astype(np.complex128))[0])
werr = np.max(np.abs(np.sort_complex(w) - w0)) / np.abs(w0).max()
print(f'residual {res:.2e}  eigval err vs LAPACK {werr:.2e}', flush=True)
