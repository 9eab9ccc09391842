"""Chip test: HBM eig pipeline (blocked hess + HBM Schur + blocked vec)."""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import numpy as np, jax, jax.numpy as jnp
from torcwa_tpu.ops.eig_qr_hbm import schur_qr_hbm
from torcwa_tpu.ops.hess_blocked import hessenberg_blocked
from torcwa_tpu.ops.vec_blocked import eig_tri_vectors_blocked
print('backend:', jax.default_backend(), flush=True)

def full_check(n, m, wb):
    rng = np.random.default_rng(n)
    Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    with jax.default_matmul_precision('highest'):
        t0 = time.time()
        Hr, Hi, Qr, Qi = hessenberg_blocked(Ar, Ai, panel=128)
        float(jnp.sum(Hr))
        t_h = time.time() - t0
        t0 = time.time()
        Tr, Ti, Zr, Zi, (hi_f, sweeps, aed_d, skipped, multi) = schur_qr_hbm(
            Hr, Hi, Qr, Qi, m=m, wb=wb, defl_mult=_HBM_DEFL,
            return_stats=True)
        float(jnp.sum(Tr))
        t_q = time.time() - t0
        t0 = time.time()
        Vr, Vi = eig_tri_vectors_blocked(Tr, Ti, Zr, Zi, block=128)
        float(jnp.sum(Vr))
        t_v = time.time() - t0
    w = np.asarray(jnp.diagonal(Tr)) + 1j*np.asarray(jnp.diagonal(Ti))
    A = np.asarray(Ar) + 1j*np.asarray(Ai)
    V = np.asarray(Vr) + 1j*np.asarray(Vi)
    res = np.linalg.norm(A @ V[:, :8] - V[:, :8]*w[None, :8]) / max(
        float(np.abs(V[:, :8]).max()), 1e-30)
    print(f'n={n}: hess {t_h:.1f}s  qr {t_q:.1f}s (sweeps={int(sweeps)}, '
          f'hi_f={int(hi_f)}, aed={int(aed_d)})  vec {t_v:.1f}s  finite={np.isfinite(w).all()} '
          f'res8={res:.2e}', flush=True)

from torcwa_tpu.ops.eig_qr_real import _hbm_shifts, _HBM_WINDOW, _HBM_DEFL

sizes = [int(x) for x in sys.argv[1:]] or [3362, 3362, 5202, 5202]
for nn in sizes:
    full_check(nn, _hbm_shifts(nn), _HBM_WINDOW)
print('DONE', flush=True)
