"""Batched while-loop body patterns: find what's fast on this runtime.

Patterns tried (all on a (B, n, n) carry, shared dynamic index k):
  dus3        batched dyn slice+update on (B,2,n) row panels, 3 arrays
  dus3_T      same but panels on the last axis (B,n,2)
  moved_batch batch as LAST axis: (n, n, B) carry, (2, n, B) panels
  fullmat     one full-matrix elementwise op per step (suspected 1000x)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
n = int(sys.argv[2]) if len(sys.argv) > 2 else 162
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5000

rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
At = jnp.asarray(rng.standard_normal((n, n, B)), jnp.float32)


@jax.jit
def dus3(A):
    def body(i, carry):
        X, Y, Z = carry
        k = i % (n - 1)
        def rot(M):
            r = lax.dynamic_slice(M, (0, k, 0), (B, 2, n))
            r = jnp.flip(r, 1) * 0.999
            return lax.dynamic_update_slice(M, r, (0, k, 0))
        return rot(X), rot(Y), rot(Z)
    X, Y, Z = lax.fori_loop(0, steps, body, (A, A + 1, A + 2))
    return X + Y + Z


@jax.jit
def dus3_T(A):
    def body(i, carry):
        X, Y, Z = carry
        k = i % (n - 1)
        def rot(M):
            r = lax.dynamic_slice(M, (0, 0, k), (B, n, 2))
            r = jnp.flip(r, 2) * 0.999
            return lax.dynamic_update_slice(M, r, (0, 0, k))
        return rot(X), rot(Y), rot(Z)
    X, Y, Z = lax.fori_loop(0, steps, body, (A, A + 1, A + 2))
    return X + Y + Z


@jax.jit
def moved_batch(At):
    def body(i, carry):
        X, Y, Z = carry
        k = i % (n - 1)
        def rot(M):
            r = lax.dynamic_slice(M, (k, 0, 0), (2, n, B))
            r = jnp.flip(r, 0) * 0.999
            return lax.dynamic_update_slice(M, r, (k, 0, 0))
        return rot(X), rot(Y), rot(Z)
    X, Y, Z = lax.fori_loop(0, steps, body, (At, At + 1, At + 2))
    return X + Y + Z


@jax.jit
def fullmat(A):
    def body(i, X):
        return X * 0.999999
    return lax.fori_loop(0, min(steps, 200), body, A)


for name, f, a, st in [('dus3', dus3, A, steps), ('dus3_T', dus3_T, A, steps),
                       ('moved_batch', moved_batch, At, steps),
                       ('fullmat', fullmat, A, min(steps, 200))]:
    out = f(a); out.block_until_ready()
    t0 = time.time()
    out = f(a); s = float(jnp.sum(out))
    dt = time.time() - t0
    print(f'{name:12s} {dt:7.3f}s -> {dt/st*1e6:9.2f} us/step', flush=True)
