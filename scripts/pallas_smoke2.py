"""Pallas smoke 2: no flip; repeat timings; fresh inputs each call."""
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
steps = 66000
rng = np.random.default_rng(0)
mats = [jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        for _ in range(4)]


def k_elem(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def k_loop(x_ref, o_ref):
    o_ref[:] = x_ref[:]

    def body(i, _):
        k = i % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        r = jnp.concatenate([r[1:2], r[0:1]], 0) * 0.9999
        o_ref[pl.ds(k, 2), :] = r
        return 0

    lax.fori_loop(0, steps, body, 0)


def k_loop_cols(x_ref, o_ref):
    o_ref[:] = x_ref[:]

    def body(i, _):
        k = i % (n - 1)
        c = o_ref[:, pl.ds(k, 2)]
        c = jnp.concatenate([c[:, 1:2], c[:, 0:1]], 1) * 0.9999
        o_ref[:, pl.ds(k, 2)] = c
        return 0

    lax.fori_loop(0, steps, body, 0)


def k_while(x_ref, o_ref):
    o_ref[:] = x_ref[:]

    def cond(s):
        return s[0] < steps

    def body(s):
        i, _ = s
        k = i % (n - 1)
        r = o_ref[pl.ds(k, 2), :]
        r = jnp.concatenate([r[1:2], r[0:1]], 0) * 0.9999
        o_ref[pl.ds(k, 2), :] = r
        return (i + 1, 0)

    lax.while_loop(cond, body, (0, 0))


for name, kern in [('elem', k_elem), ('row_loop', k_loop),
                   ('col_loop', k_loop_cols), ('while', k_while)]:
    try:
        f = jax.jit(lambda x, kern=kern: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x))
        out = f(mats[0]); out.block_until_ready()
        for rep in range(1, 4):
            t0 = time.time()
            out = f(mats[rep]); s = float(jnp.sum(out))
            dt = time.time() - t0
            per = dt / (steps if name != 'elem' else 1) * 1e6
            print(f'{name:10s} rep{rep} total {dt:8.4f}s  {per:9.3f} us/step'
                  f' (checksum {s:.2f})', flush=True)
    except Exception as e:
        print(f'{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}',
              flush=True)
