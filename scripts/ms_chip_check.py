"""Verify the clamped multishift kernel on the real chip at n=1054."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

print('backend:', jax.default_backend(), flush=True)
from torcwa_tpu.ops.eig_qr_real import hessenberg_real
from torcwa_tpu.ops.eig_qr_pallas import hessenberg_pallas, eig_tri_vectors_pallas
from torcwa_tpu.ops.eig_qr_pallas_ms import schur_qr_pallas_ms

for n in (256, 1054):
    rng = np.random.default_rng(7)
    Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    with jax.default_matmul_precision('highest'):
        out = hessenberg_pallas(Ar[None], Ai[None])
        Hr, Hi, Qr, Qi = (x[0] for x in out)
        t0 = time.time()
        Tr, Ti, Zr, Zi = schur_qr_pallas_ms(Hr, Hi, Qr, Qi, m=16)
        chk = float(jnp.sum(Tr))
        t_q = time.time() - t0
        Vr, Vi = eig_tri_vectors_pallas(Tr[None], Ti[None], Zr[None], Zi[None])
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    A = np.asarray(Ar) + 1j * np.asarray(Ai)
    V = np.asarray(Vr[0]) + 1j * np.asarray(Vi[0])
    # residual on 8 sample columns
    res = np.linalg.norm(A @ V[:, :8] - V[:, :8] * w[None, :8]) / max(
        np.linalg.norm(V[:, :8]), 1e-30)
    # subdiagonal mass of T (should be ~0 after convergence)
    sub = np.linalg.norm(np.tril(np.asarray(Tr), -1)) + np.linalg.norm(
        np.tril(np.asarray(Ti), -1))
    print(f'n={n}: qr {t_q:.1f}s  finite={np.isfinite(w).all()}  '
          f'res8={res:.2e}  subdiag={sub:.2e}', flush=True)
print('DONE', flush=True)
