"""Bisect round 3: per-step cost of row/col update strategies in-kernel.

a) dyn-sublane size-1 row slices (read+write rows k,k+1)
b) masked full-matrix row update (onehot rows, no dynamic slicing)
c) masked full-matrix row+col update (the full Givens shape)
d) fori trip-count overhead alone (empty-ish body)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n = 162
STEPS = 66000
A = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)), jnp.float32)

CASES = {}


def case(name, steps=STEPS):
    def deco(f):
        CASES[name] = (f, steps)
        return f
    return deco


@case('dyn_rows')
def a(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 2)
        r0 = o_ref[pl.ds(k, 1), :]
        r1 = o_ref[pl.ds(k + 1, 1), :]
        o_ref[pl.ds(k, 1), :] = 0.9 * r0 + 0.1 * r1
        o_ref[pl.ds(k + 1, 1), :] = 0.9 * r1 - 0.1 * r0
        return 0
    lax.fori_loop(0, STEPS, body, 0)


@case('masked_rows')
def b(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    def body(i, _):
        k = i % (n - 2)
        X = o_ref[:]
        is0 = (rows == k).astype(jnp.float32)
        is1 = (rows == k + 1).astype(jnp.float32)
        # rotate rows k,k+1 via shifted copies: row k gets 0.9rk + 0.1rk1
        Xs = pltpu.roll(X, shift=n - 1, axis=0)   # Xs[k] = X[k+1]
        Xp = pltpu.roll(X, shift=1, axis=0)    # Xp[k+1] = X[k]
        o_ref[:] = (X * (1 - is0 - is1)
                    + is0 * (0.9 * X + 0.1 * Xs)
                    + is1 * (0.9 * X - 0.1 * Xp))
        return 0
    lax.fori_loop(0, STEPS, body, 0)


@case('masked_rowcol')
def c(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    def body(i, _):
        k = i % (n - 2)
        X = o_ref[:]
        is0 = (rows == k).astype(jnp.float32)
        is1 = (rows == k + 1).astype(jnp.float32)
        Xs = pltpu.roll(X, shift=n - 1, axis=0)
        Xp = pltpu.roll(X, shift=1, axis=0)
        X = (X * (1 - is0 - is1)
             + is0 * (0.9 * X + 0.1 * Xs)
             + is1 * (0.9 * X - 0.1 * Xp))
        jc0 = (cols == k).astype(jnp.float32)
        jc1 = (cols == k + 1).astype(jnp.float32)
        Ys = pltpu.roll(X, shift=n - 1, axis=1)
        Yp = pltpu.roll(X, shift=1, axis=1)
        X = (X * (1 - jc0 - jc1)
             + jc0 * (0.9 * X + 0.1 * Ys)
             + jc1 * (0.9 * X - 0.1 * Yp))
        o_ref[:] = X
        return 0
    lax.fori_loop(0, STEPS, body, 0)


@case('loop_overhead')
def d(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, acc):
        return acc + 1
    acc = lax.fori_loop(0, STEPS, body, jnp.int32(0))
    o_ref[0:1, 0:1] = jnp.float32(acc)[None, None] + o_ref[0:1, 0:1]


for name, (kern, steps) in CASES.items():
    try:
        f = jax.jit(lambda x, kern=kern: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        out = f(A); s0 = float(jnp.sum(out))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = f(A + 0.001); s = float(jnp.sum(out))
            best = min(best, time.time() - t0)
        print(f'{name:15s} OK  {best:8.4f}s  {best/steps*1e6:9.3f} us/step '
              f'(checksum {s:.2f})', flush=True)
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:120]
        print(f'{name:15s} FAILED: {type(e).__name__}: {msg}', flush=True)
