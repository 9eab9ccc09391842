"""Bisect round 5: vector-shaped ops for the Hessenberg kernel."""
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

B, n = 2, 66
A = jnp.asarray(np.random.default_rng(0).standard_normal((B, n, n)),
                jnp.float32)
CASES = {}


def case(name):
    def deco(f):
        CASES[name] = f
        return f
    return deco


@case('sum12_keepdims')
def c1(x_ref, o_ref):
    X = x_ref[:]
    s = jnp.sum(X, axis=(1, 2), keepdims=True)       # (b,1,1)
    o_ref[:] = X * s


@case('dot_row_mat')
def c2(x_ref, o_ref):
    X = x_ref[:]
    v = jnp.sum(X, axis=1, keepdims=True)            # (b,1,n)
    dn = (((2,), (1,)), ((0,), (0,)))
    w = lax.dot_general(v, X, dn, preferred_element_type=jnp.float32)
    o_ref[:] = X + w


@case('dot_mat_col')
def c3(x_ref, o_ref):
    X = x_ref[:]
    v = jnp.sum(X, axis=2, keepdims=True)            # (b,n,1)
    dn = (((2,), (1,)), ((0,), (0,)))
    u = lax.dot_general(X, v, dn, preferred_element_type=jnp.float32)
    o_ref[:] = X + u                                  # (b,n,1) broadcast


@case('swap_row_to_col')
def c4(x_ref, o_ref):
    X = x_ref[:]
    v = jnp.sum(X, axis=1, keepdims=True)            # (b,1,n)
    vc = jnp.swapaxes(v, 1, 2)                        # (b,n,1)
    o_ref[:] = X + vc


@case('outer_col_row')
def c5(x_ref, o_ref):
    X = x_ref[:]
    v = jnp.sum(X, axis=1, keepdims=True)            # (b,1,n)
    vc = jnp.swapaxes(v, 1, 2)
    o_ref[:] = X - vc * v                             # rank-1 outer


@case('masked_col_extract')
def c6(x_ref, o_ref):
    X = x_ref[:]
    cols = lax.broadcasted_iota(jnp.int32, (B, n, n), 2)

    def body(k, acc):
        xc = jnp.sum(jnp.where(cols == k, X, 0.), axis=2, keepdims=True)
        return acc + jnp.sum(xc)
    acc = lax.fori_loop(0, 8, body, jnp.float32(0))
    o_ref[:] = X * 0 + acc


for name, kern in CASES.items():
    try:
        f = jax.jit(lambda x, kern=kern: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        out = f(A); s = float(jnp.sum(out))
        print(f'{name:18s} OK (checksum {s:.2f})', flush=True)
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:110]
        print(f'{name:18s} FAILED: {type(e).__name__}: {msg}', flush=True)
