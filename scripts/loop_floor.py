"""Measure TPU fori_loop per-step latency floor for bodies shaped like the
QR sweep's (dynamic row/col updates on an n x n carry)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

n = int(sys.argv[1]) if len(sys.argv) > 1 else 162
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 78000

A = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)), jnp.float32)


@jax.jit
def trivial(A):
    def body(i, A):
        return A * 0.999999 + 1e-6
    return lax.fori_loop(0, steps, body, A)


@jax.jit
def rowpair_dus(A):
    def body(i, A):
        k = i % (n - 1)
        rows = lax.dynamic_slice(A, (k, 0), (2, n))
        rows = jnp.flip(rows, 0) * 0.999999
        return lax.dynamic_update_slice(A, rows, (k, 0))
    return lax.fori_loop(0, steps, body, A)


@jax.jit
def qr_step_shape(A):
    """12 DUS per step on rows+cols, like one Givens application."""
    def body(i, A):
        k = i % (n - 2)
        r = lax.dynamic_slice(A, (k, 0), (2, n))
        A = lax.dynamic_update_slice(A, jnp.flip(r, 0) * 0.999, (k, 0))
        c = lax.dynamic_slice(A, (0, k), (n, 2))
        A = lax.dynamic_update_slice(A, jnp.flip(c, 1) * 0.999, (0, k))
        return A
    return lax.fori_loop(0, steps, body, A)


for name, f in [('trivial', trivial), ('rowpair_dus', rowpair_dus),
                ('qr_step_shape', qr_step_shape)]:
    out = f(A); out.block_until_ready()
    t0 = time.time()
    out = f(A); s = float(jnp.sum(out))
    dt = time.time() - t0
    print(f'{name:15s} {dt:.3f}s total -> {dt/steps*1e6:.2f} us/step '
          f'(checksum {s:.3f})', flush=True)
