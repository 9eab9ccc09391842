"""Chip A/B: trailing-block (dlahr2) blocked Hessenberg vs baseline cost.

Times hessenberg_blocked steady-state (warmup + best-of-reps on perturbed
inputs, materialized-checksum barriers) and validates Q H Q^H == A on a
trailing probe.  Baseline r5 numbers (full-matrix GEMV variant):
n=3362 0.41 s, n=5202 1.49 s.
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

print('backend:', jax.default_backend(), flush=True)
results = {}
sizes = [int(x) for x in sys.argv[1:]] or [3362, 5202]
for n in sizes:
    rng = np.random.default_rng(n)
    Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    with jax.default_matmul_precision('highest'):
        t0 = time.time()
        Hr, Hi, Qr, Qi = hessenberg_blocked(Ar, Ai, panel=128)
        float(jnp.sum(Hr) + jnp.sum(Qr))
        cold = time.time() - t0
        best = np.inf
        for r in range(3):
            s = 1. + 1e-6 * (r + 1)
            t0 = time.time()
            Hr, Hi, Qr, Qi = hessenberg_blocked(Ar * s, Ai * s, panel=128)
            float(jnp.sum(Hr) + jnp.sum(Qr))
            best = min(best, time.time() - t0)
        # residual: || (Q H Q^H - A) e_k || on a few probe columns
        k = min(7, n - 1)
        ek = jnp.zeros((n, 1), jnp.float32).at[k, 0].set(1.)
        QHr = Qr @ (Hr @ (Qr.T @ ek) - Hi @ (-Qi.T @ ek)) \
            - Qi @ (Hr @ (-Qi.T @ ek) + Hi @ (Qr.T @ ek))
        a_col = Ar[:, k:k + 1] * (1. + 3e-6)
        res = float(jnp.linalg.norm(QHr - a_col) /
                    jnp.maximum(jnp.linalg.norm(a_col), 1e-30))
    print(f'n={n}: cold {cold:.1f}s  best {best:.3f}s  probe-res {res:.2e}',
          flush=True)
    results[str(n)] = round(best, 4)

print(json.dumps({'metric': 'hess_blocked_trailing', 'value':
                  results.get('3362'), 'unit': 's', 'per_n': results}))
