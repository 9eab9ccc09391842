"""Stage-level timing of the split-real eigensolver on the current backend.

Times Hessenberg, Schur-QR, and eigenvector back-substitution separately,
plus the full RCWA-layer pipeline, at a given n and batch.
Usage: python scripts/profile_eig.py [n] [batch]
"""
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
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

rng = np.random.default_rng(0)
Ar = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
Ai = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)

print(f'backend={jax.default_backend()} n={n} batch={batch}', flush=True)


def bench(name, fn, *args):
    f = jax.jit(jax.vmap(fn)) if batch > 1 else jax.jit(fn)
    a = [x[0] for x in args] if batch == 1 else list(args)
    t0 = time.time()
    out = f(*a)
    jax.tree.map(lambda o: o.block_until_ready(), out)
    compile_t = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = f(*a)
    jax.tree.map(lambda o: o.block_until_ready(), out)
    run_t = (time.time() - t0) / reps
    print(f'{name:18s} compile={compile_t:7.1f}s  run={run_t*1e3:9.1f}ms '
          f'({run_t*1e3/batch:8.2f} ms/matrix)', flush=True)
    return out


hess = bench('hessenberg', eqr.hessenberg_real, Ar, Ai)
if batch == 1:
    Hr, Hi, Qr, Qi = hess
    schur = bench('schur_qr', eqr.schur_qr_real, Hr[None], Hi[None],
                  Qr[None], Qi[None])
    Tr, Ti, Zr, Zi = schur
    bench('eig_vectors', eqr.eig_tri_vectors_real, Tr[None], Ti[None],
          Zr[None], Zi[None])
else:
    Hr, Hi, Qr, Qi = hess
    schur = bench('schur_qr', eqr.schur_qr_real, Hr, Hi, Qr, Qi)
    Tr, Ti, Zr, Zi = schur
    bench('eig_vectors', eqr.eig_tri_vectors_real, Tr, Ti, Zr, Zi)

bench('full_eig', eqr.eig_qr_real, Ar, Ai)
