"""Can Mosaic do pltpu.roll with a TRACED shift (tpu.dynamic_rotate)?"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, n = 2, 162
A = jnp.asarray(np.random.default_rng(0).standard_normal((B, n, n)), jnp.float32)

def k_dynroll(x_ref, o_ref):
    X = x_ref[:]
    # traced shift from data
    s = jnp.int32(jnp.sum(X[0, 0, 0:1]) > 0) + 3
    Y = pltpu.roll(X, shift=s, axis=2)
    Z = pltpu.roll(Y, shift=s, axis=1)
    o_ref[:] = Z

def k_switch_slab(x_ref, o_ref):
    """lax.switch between static prefix-slab matmul sizes."""
    X = x_ref[:]
    s = jnp.int32(jnp.sum(X[0, 0, 0:1]) > 0)  # 0 or 1

    def f_small(X):
        Y = X[:, :, 0:64]
        W = X[:, 0:64, 0:64]
        out = lax.dot_general(Y, W, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        return jnp.concatenate([out, X[:, :, 64:]], axis=2)

    def f_big(X):
        Y = X[:, :, 0:128]
        W = X[:, 0:128, 0:128]
        out = lax.dot_general(Y, W, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
        return jnp.concatenate([out, X[:, :, 128:]], axis=2)

    o_ref[:] = lax.switch(s, [f_small, f_big], X)

for name, kern in [('dynroll', k_dynroll), ('switch_slab', k_switch_slab)]:
    try:
        f = jax.jit(lambda x, kern=kern: pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
        out = f(A); s = float(jnp.sum(out))
        print(f'{name:12s} OK (checksum {s:.2f})', flush=True)
    except Exception as e:
        print(f'{name:12s} FAILED: {type(e).__name__}: '
              f'{str(e)[:120]}'.replace('\n', ' '), flush=True)
