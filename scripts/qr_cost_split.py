"""Chip A/B: split the HBM Schur QR's time between AED work and chase work.

Three nibble settings move the chase fraction while AED stays constant
per sweep:
  nibble=14  (production)    — chase skipped when AED deflates > 14% eff
  nibble=100 (always chase)  — deflation never exceeds 100%: every sweep
                               chases (upper bound on chase cost)
  nibble=0   (chase on stall)— chase only when AED made zero progress
                               (lower bound; AED-dominated)

With per-config (time, sweeps, skipped) a 2x2 solve gives ms/sweep for
an AED-only sweep vs a chase sweep — the decision data for whether the
next kernel lever is the window mini-Schur or the bulge chase.
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
wb = int(sys.argv[3]) if len(sys.argv) > 3 else 256

rng = np.random.default_rng(n)
Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
with jax.default_matmul_precision('highest'):
    Hr, Hi, Qr, Qi = hessenberg_blocked(Ar, Ai, panel=128)
    float(jnp.sum(Hr))

rows = {}
for nib in (14, 100, 0):
    def run(s):
        with jax.default_matmul_precision('highest'):
            out = schur_qr_hbm(Hr * s, Hi * s, Qr, Qi, m=m, wb=wb,
                               nibble=nib, defl_mult=4.0,
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
    rows[nib] = (best, sweeps, skipped, hi_f)
    print(f'n={n} m={m} wb={wb} nibble={nib:3d}: {best:.2f}s  '
          f'sweeps={sweeps} skipped={skipped} hi_f={hi_f}', flush=True)

# least-squares t = a*sweeps + c*(sweeps - skipped) over the 3 configs
A = np.array([[s, s - k] for (t, s, k, _) in rows.values()], float)
b = np.array([t for (t, s, k, _) in rows.values()], float)
coef, *_ = np.linalg.lstsq(A, b, rcond=None)
print(f'# model: AED-only sweep ~{coef[0] * 1e3:.2f} ms, chase adds '
      f'~{coef[1] * 1e3:.2f} ms/sweep', flush=True)
print(json.dumps({'metric': 'qr_cost_split', 'value': rows[14][0],
                  'unit': 's',
                  'aed_ms_per_sweep': round(coef[0] * 1e3, 2),
                  'chase_ms_per_sweep': round(coef[1] * 1e3, 2),
                  'rows': {str(k): v for k, v in rows.items()}}))
