"""Bisect round 2: size-1 dynamic slices everywhere; cols; while; speed."""
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
A = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)), jnp.float32)

CASES = {}


def case(name, steps=100):
    def deco(f):
        CASES[name] = (f, steps)
        return f
    return deco


@case('col_size1')
def c1(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 1)
        a = o_ref[:, pl.ds(k, 1)]
        b = o_ref[:, pl.ds(k + 1, 1)]
        o_ref[:, pl.ds(k, 1)] = b * 0.9
        o_ref[:, pl.ds(k + 1, 1)] = a * 0.9
        return 0
    lax.fori_loop(0, 100, body, 0)


@case('while_size1')
def c2(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def cond(s):
        return s < 100
    def body(s):
        k = s % (n - 1)
        a = o_ref[pl.ds(k, 1), :]
        b = o_ref[pl.ds(k + 1, 1), :]
        o_ref[pl.ds(k, 1), :] = b * 0.9
        o_ref[pl.ds(k + 1, 1), :] = a * 0.9
        return s + 1
    lax.while_loop(cond, body, 0)


@case('rowcol_speed', steps=66000)
def c3(x_ref, o_ref):
    """Row pair + col pair updates (size-1 each) — the QR step shape."""
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 2)
        a = o_ref[pl.ds(k, 1), :]
        b = o_ref[pl.ds(k + 1, 1), :]
        o_ref[pl.ds(k, 1), :] = 0.9 * a + 0.1 * b
        o_ref[pl.ds(k + 1, 1), :] = 0.9 * b - 0.1 * a
        ca = o_ref[:, pl.ds(k, 1)]
        cb = o_ref[:, pl.ds(k + 1, 1)]
        o_ref[:, pl.ds(k, 1)] = 0.9 * ca + 0.1 * cb
        o_ref[:, pl.ds(k + 1, 1)] = 0.9 * cb - 0.1 * ca
        return 0
    lax.fori_loop(0, 66000, body, 0)


@case('scalar_read')
def c4(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, acc):
        k = i % (n - 1)
        v = o_ref[pl.ds(k, 1), pl.ds(k, 1)]
        return acc + v[0, 0]
    acc = lax.fori_loop(0, 100, body, jnp.float32(0))
    o_ref[0:1, 0:1] = acc[None, None]


@case('diag_extract')
def c5(x_ref, o_ref):
    x = x_ref[:]
    d = jnp.diagonal(x)
    o_ref[:] = x * 0.
    o_ref[0:1, :] = d[None, :]


for name, (kern, steps) in CASES.items():
    try:
        f = jax.jit(lambda x, kern=kern: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        out = f(A); s0 = float(jnp.sum(out))
        t0 = time.time()
        out = f(A + 0.001); s = float(jnp.sum(out))
        dt = time.time() - t0
        print(f'{name:15s} OK  {dt:8.4f}s  {dt/steps*1e6:9.3f} us/step '
              f'(checksum {s:.2f})', flush=True)
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:120]
        print(f'{name:15s} FAILED: {type(e).__name__}: {msg}', flush=True)
