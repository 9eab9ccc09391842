"""Chip experiment: HBM Schur QR shift-count (m) / window (wb) scaling.

Total chase rotations are m-independent (total shifts ~ const for a
given matrix), but per-sweep overhead — band refresh, the AED window
Schur, and the border GEMM/Z-slab passes — scales with sweep count
(~ 1/m).  The 128-aligned window stride (wb - ceil(2m/128)*128) stays
384 for any m <= 60 at wb=512, so larger m is free stride-wise.

First call per config includes the Mosaic compile; the second call (on a
perturbed matrix — identical inputs hit the tunnel result cache) is the
steady-state number.

Usage: python scripts/m_sweep_check.py [n [n ...]]
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import numpy as np, jax, jax.numpy as jnp
from torcwa_tpu.ops.eig_qr_hbm import schur_qr_hbm
from torcwa_tpu.ops.hess_blocked import hessenberg_blocked
print('backend:', jax.default_backend(), flush=True)


def run(n, m, wb, kw, Hr, Hi, Qr, Qi):
    with jax.default_matmul_precision('highest'):
        t0 = time.time()
        out = schur_qr_hbm(Hr, Hi, Qr, Qi, m=m, wb=wb, kw=kw,
                           return_stats=True)
        float(jnp.sum(out[0]))
        t_cold = time.time() - t0
        t0 = time.time()
        Tr, Ti, Zr, Zi, (hi_f, sweeps, aed_d, skipped, multi) = schur_qr_hbm(
            Hr * 1.0001, Hi * 1.0001, Qr, Qi, m=m, wb=wb, kw=kw,
            return_stats=True)
        float(jnp.sum(Tr))
        t_q = time.time() - t0
    finite = bool(np.isfinite(np.asarray(jnp.diagonal(Tr))).all())
    print(f'n={n} m={m} wb={wb} kw={kw}: qr {t_q:.2f}s (cold {t_cold:.1f})  '
          f'sweeps={int(sweeps)} skip={int(skipped)} hi_f={int(hi_f)} aed={int(aed_d)} '
          f'finite={finite}', flush=True)


CONFIGS = [tuple(int(v) for v in c.split(','))
           for c in os.environ.get(
               'MS_CONFIGS',
               '16,512,64 32,512,64 40,384,64 48,384,64').split()]

sizes = [int(x) for x in sys.argv[1:]] or [3362]
for n in sizes:
    rng = np.random.default_rng(n)
    Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_blocked(Ar, Ai, panel=128)
        float(jnp.sum(Hr))
    for (m, wb, kw) in CONFIGS:
        run(n, m, wb, kw, Hr, Hi, Qr, Qi)
print('DONE', flush=True)
