"""Chip check for the _acc_chunk-based eig routing (r5 in-flight fix).

Exercises the batched n in [513, 1300) route that previously hit a
scoped-vmem fusion OOM (n=578, b=4 in the example3 reduced smoke):
batched eig_qr_real on TPU must now run through the sequential HBM
pipeline and return eigenpairs with small residual ||A V - V diag(w)||.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import time

import numpy as np
import jax
import jax.numpy as jnp

from torcwa_tpu.ops.eig_qr_real import eig_qr_real, _acc_chunk

n, b = 578, 4
print('backend:', jax.default_backend(), flush=True)
print('acc_chunk(%d) = %d (expect 1 -> HBM route)' % (n, _acc_chunk(n)),
      flush=True)

rng = np.random.default_rng(0)
Ar = rng.standard_normal((b, n, n)).astype(np.float32)
Ai = rng.standard_normal((b, n, n)).astype(np.float32)

t0 = time.time()
wr, wi, Vr, Vi = eig_qr_real(jnp.asarray(Ar), jnp.asarray(Ai))
chk = float(jnp.sum(wr) + jnp.sum(Vr))  # materialize = barrier
t1 = time.time()
print('solve (incl compile): %.1f s  checksum %.3f' % (t1 - t0, chk),
      flush=True)

# residual on host in float64
A = Ar.astype(np.float64) + 1j * Ai.astype(np.float64)
V = np.asarray(Vr, np.float64) + 1j * np.asarray(Vi, np.float64)
w = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
res = np.linalg.norm(A @ V - V * w[:, None, :], axis=(1, 2))
den = np.linalg.norm(A, axis=(1, 2))
rel = res / den
print('rel residuals:', np.array2string(rel, precision=2), flush=True)
assert np.all(rel < 5e-4), rel
print('ROUTE578 PASS', flush=True)
