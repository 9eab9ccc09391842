"""Bisect round 4: primitives for the deferred-column QR kernel.

  row1_3d     (B,1,n) dyn slice read+write on axis 1 of a 3D VMEM ref
  dot_batched in-kernel jax.lax.dot_general with batch dims on (B,n,n)
  dot_unroll  in-kernel per-matrix jnp.dot unrolled over B
  reduce_dot  (B,1,n) elementwise + reduce to (B,1,1) (the x',y' dots)
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

B, n = 8, 162
STEPS = 66000
A = jnp.asarray(np.random.default_rng(0).standard_normal((B, n, n)),
                jnp.float32)

CASES = {}


def case(name, steps=1):
    def deco(f):
        CASES[name] = (f, steps)
        return f
    return deco


@case('row1_3d', steps=STEPS)
def r1(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 2)
        a = o_ref[:, pl.ds(k, 1), :]
        b = o_ref[:, pl.ds(k + 1, 1), :]
        o_ref[:, pl.ds(k, 1), :] = 0.9 * a + 0.1 * b
        o_ref[:, pl.ds(k + 1, 1), :] = 0.9 * b - 0.1 * a
        return 0
    lax.fori_loop(0, STEPS, body, 0)


@case('reduce_dot', steps=STEPS)
def r2(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, acc):
        k = i % (n - 2)
        a = o_ref[:, pl.ds(k, 1), :]
        b = o_ref[:, pl.ds(k + 1, 1), :]
        d = jnp.sum(a * b, axis=2, keepdims=True)   # (B,1,1)
        return acc + jnp.sum(d)
    acc = lax.fori_loop(0, STEPS, body, jnp.float32(0))
    o_ref[0:1, 0:1, 0:1] = acc[None, None, None] + o_ref[0:1, 0:1, 0:1]


@case('dot_batched', steps=200)
def r3(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        X = o_ref[:]
        Y = lax.dot_general(X, X, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        o_ref[:] = Y * 1e-3
        return 0
    lax.fori_loop(0, 200, body, 0)


@case('dot_unroll', steps=200)
def r4(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        for b_ in range(B):
            X = o_ref[b_]
            Y = jnp.dot(X, X.T, preferred_element_type=jnp.float32)
            o_ref[b_] = Y * 1e-3
        return 0
    lax.fori_loop(0, 200, body, 0)


for name, (kern, steps) in CASES.items():
    try:
        f = jax.jit(lambda x, kern=kern: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        out = f(A); s0 = float(jnp.sum(out))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = f(A + 1e-4); s = float(jnp.sum(out))
            best = min(best, time.time() - t0)
        print(f'{name:12s} OK  {best:8.4f}s  {best/steps*1e6:9.3f} us/step',
              flush=True)
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:130]
        print(f'{name:12s} FAILED: {type(e).__name__}: {msg}', flush=True)
