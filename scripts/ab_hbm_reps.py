"""A/B helper: HBM QR steady-state timing with multiple reps.

Usage: python scripts/ab_hbm_reps.py [n] [m] [reps]
Each rep perturbs the input (tunnel result cache) and times one solve.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time
import numpy as np, jax, jax.numpy as jnp
from torcwa_tpu.ops.eig_qr_hbm import schur_qr_hbm
from torcwa_tpu.ops.hess_blocked import hessenberg_blocked

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3362
m = int(sys.argv[2]) if len(sys.argv) > 2 else 24
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
wb = int(os.environ.get("AB_WB", "512"))
kw = int(os.environ.get('AB_KW', '64'))
nib = int(os.environ.get("AB_NIBBLE", "14"))
dmult = float(os.environ.get("AB_DEFL", "1.0"))
local = os.environ.get("AB_LOCAL", "1") == "1"
print('backend:', jax.default_backend(), flush=True)

rng = np.random.default_rng(n)
Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
with jax.default_matmul_precision('highest'):
    Hr, Hi, Qr, Qi = hessenberg_blocked(Ar, Ai, panel=128)
    float(jnp.sum(Hr))
    t0 = time.time()
    out = schur_qr_hbm(Hr, Hi, Qr, Qi, m=m, wb=wb, kw=kw, nibble=nib, defl_mult=dmult, local_chase=local, return_stats=True)
    float(jnp.sum(out[0]))
    print(f'cold {time.time() - t0:.1f}s', flush=True)
    for r in range(reps):
        scale = 1.0 + 1e-4 * (r + 1)
        t0 = time.time()
        Tr, Ti, Zr, Zi, (hi_f, sweeps, aed_d, skipped, multi) = schur_qr_hbm(
            Hr * scale, Hi * scale, Qr, Qi, m=m, wb=wb, kw=kw,
            nibble=nib, defl_mult=dmult, local_chase=local,
            return_stats=True)
        float(jnp.sum(Tr))
        print(f'rep{r}: {time.time() - t0:.2f}s sweeps={int(sweeps)} '
              f'skipped={int(skipped)} multi={int(multi)}', flush=True)
print('DONE', flush=True)
