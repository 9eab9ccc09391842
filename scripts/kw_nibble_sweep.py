"""Chip sweep of the HBM QR's AED-window size (kw) x nibble threshold.

Decision data from scripts/qr_cost_split.py (n=3362, kw=64): an
AED-only sweep costs ~2.7 ms, a chase adds ~11.3 ms/sweep, and the
production config (nibble=14) chases 136 of 325 sweeps.  A larger AED
window deflates more per sweep (fewer sweeps, fewer chases) at a higher
per-AED cost (the window Schur is kw-serial); nibble trades AED-only
sweeps against chases.  kw was fixed at 64 since round 3 and never
swept under the r5 config (wb=256, defl_mult=4, effective-window
nibble); nibble has only been measured at 0/14/100.

Usage: python scripts/kw_nibble_sweep.py [n] [m] [configs...]
       configs are kw:nibble pairs, default "64:8 64:20 64:28 96:14 120:14"
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import json
import time
import numpy as np
import jax
import jax.numpy as jnp
from torcwa_tpu.ops.hess_blocked import hessenberg_blocked
from torcwa_tpu.ops.eig_qr_hbm import schur_qr_hbm

print('backend:', jax.default_backend(), flush=True)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 3362
m = int(sys.argv[2]) if len(sys.argv) > 2 else 24
wb = 256
configs = [tuple(map(int, c.split(':'))) for c in sys.argv[3:]] or \
    [(64, 8), (64, 20), (64, 28), (96, 14), (120, 14)]

rng = np.random.default_rng(n)
Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
with jax.default_matmul_precision('highest'):
    Hr, Hi, Qr, Qi = hessenberg_blocked(Ar, Ai, panel=128)
    float(jnp.sum(Hr))

results = {}
for kw, nib in configs:
    def run(s):
        with jax.default_matmul_precision('highest'):
            out = schur_qr_hbm(Hr * s, Hi * s, Qr, Qi, m=m, wb=wb,
                               kw=kw, nibble=nib, defl_mult=4.0,
                               return_stats=True)
        Tr = out[0]
        hi_f, sweeps, aed, skipped, multi = out[4]
        float(jnp.sum(jnp.where(jnp.isnan(Tr), 0., Tr)))
        return int(sweeps), int(skipped), int(hi_f)
    run(1.0)                           # compile + one-time dispatch
    best, st = np.inf, None
    for r in range(3):
        t0 = time.time()
        st = run(1. + 1e-6 * (r + 1))
        dt = time.time() - t0
        best = min(best, dt)
    sweeps, skipped, hi_f = st
    results[f'{kw}:{nib}'] = (round(best, 3), sweeps, skipped, hi_f)
    print(f'n={n} m={m} wb={wb} kw={kw:3d} nibble={nib:3d}: {best:.2f}s  '
          f'sweeps={sweeps} skipped={skipped} hi_f={hi_f}', flush=True)

best_cfg = min(results, key=lambda k: results[k][0])
print(json.dumps({'metric': 'kw_nibble_sweep', 'n': n, 'm': m,
                  'value': results[best_cfg][0], 'unit': 's',
                  'best': best_cfg, 'rows': results}))
