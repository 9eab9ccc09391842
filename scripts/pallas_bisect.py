"""Bisect the Mosaic remote-compile crash: which body feature kills it."""
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


def case(name):
    def deco(f):
        CASES[name] = f
        return f
    return deco


@case('static_loop_store')          # fori, static index row store
def k1(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        r = o_ref[0:2, :]
        o_ref[0:2, :] = r * 0.9999
        return 0
    lax.fori_loop(0, 100, body, 0)


@case('dyn_read_static_store')      # dynamic read, static store
def k2(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        o_ref[0:2, :] = r * 0.9999
        return 0
    lax.fori_loop(0, 100, body, 0)


@case('dyn_store')                  # dynamic store
def k3(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        o_ref[pl.ds(k, 2), :] = r * 0.9999
        return 0
    lax.fori_loop(0, 100, body, 0)


@case('dyn_store_concat')           # + concatenate swap
def k4(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        r = jnp.concatenate([r[1:2], r[0:1]], 0) * 0.9999
        o_ref[pl.ds(k, 2), :] = r
        return 0
    lax.fori_loop(0, 100, body, 0)


@case('dyn_store_rowswap_arith')    # row swap via stack-free arithmetic
def k5(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        top = r[0:1]
        bot = r[1:2]
        o_ref[pl.ds(k, 2), :] = jnp.concatenate([bot * 0.9, top * 0.9], 0)
        return 0
    lax.fori_loop(0, 100, body, 0)


@case('two_row_stores')             # store rows separately at dyn idx
def k6(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 1)
        top = o_ref[pl.ds(k, 1), :]
        bot = o_ref[pl.ds(k + 1, 1), :]
        o_ref[pl.ds(k, 1), :] = bot * 0.9
        o_ref[pl.ds(k + 1, 1), :] = top * 0.9
        return 0
    lax.fori_loop(0, 100, body, 0)


@case('long_loop_66k')              # is it the trip count?
def k7(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def body(i, _):
        k = i % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        o_ref[pl.ds(k, 2), :] = r * 0.9999
        return 0
    lax.fori_loop(0, 66000, body, 0)


@case('while_loop')
def k8(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    def cond(s):
        return s < 100
    def body(s):
        k = s % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        o_ref[pl.ds(k, 2), :] = r * 0.9999
        return s + 1
    lax.while_loop(cond, body, 0)


for name, kern in CASES.items():
    try:
        f = jax.jit(lambda x, kern=kern: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        out = f(A); s = float(jnp.sum(out))
        print(f'{name:25s} OK (checksum {s:.2f})', flush=True)
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:150]
        print(f'{name:25s} FAILED: {type(e).__name__}: {msg}', flush=True)
