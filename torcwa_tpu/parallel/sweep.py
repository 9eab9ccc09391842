"""Sharded parameter sweeps: vmap within a chip, shard across chips.

Replaces the reference's sequential sweep loops (Example1 cell 2: 61
wavelengths one-by-one; Example3 cell 1: 11x11 geometry grid) with a single
batched solve whose batch axis is laid out over a 1-D device mesh.  The
RCWA solve is independent per sweep point, so the only communication is
the implicit all-gather of results at the end (and the psum of the grad
reduction) — pure ICI, no DCN.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['sweep_mesh', 'shard_sweep', 'sweep_and_grad']


def sweep_mesh(devices=None):
    """1-D mesh over all (or the given) devices, axis name 'sweep'."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), ('sweep',))


def _pad(xs, n_dev):
    """Pad the leading axis to a multiple of n_dev by repeating the last
    point; returns (padded, n_real)."""
    n = xs.shape[0]
    pad = (n_dev - n % n_dev) % n_dev
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.broadcast_to(xs[-1:], (pad,) + xs.shape[1:])])
    return xs, n


def shard_sweep(fn, mesh=None):
    """Batch ``fn`` over its first argument's leading axis and shard that
    axis over ``mesh``.

    fn(x) -> pytree for one sweep point.  Returns run(xs) -> stacked
    results (padding, if any, is stripped).  Non-swept arguments should be
    closed over (they are replicated).
    """
    mesh = sweep_mesh() if mesh is None else mesh
    n_dev = mesh.devices.size
    sharding = NamedSharding(mesh, P('sweep'))
    g = jax.jit(jax.vmap(fn), in_shardings=(sharding,),
                out_shardings=sharding)

    def run(xs):
        xs, n = _pad(jnp.asarray(xs), n_dev)
        out = g(jax.device_put(xs, sharding))
        return jax.tree.map(lambda o: o[:n], out)

    return run


def sweep_and_grad(loss_point_fn, mesh=None):
    """Sharded value-and-grad of a weighted-mean-over-sweep loss.

    loss_point_fn(x, theta) -> scalar contribution of sweep point x given
    shared parameters theta.  Returns run(xs, theta) -> (mean_loss, grad
    wrt theta).  The sweep axis is sharded over the mesh, theta replicated;
    padding points get zero weight so the mean is exact for any len(xs).
    """
    mesh = sweep_mesh() if mesh is None else mesh
    n_dev = mesh.devices.size
    xsh = NamedSharding(mesh, P('sweep'))
    rep = NamedSharding(mesh, P())

    def mean_loss(theta, xs, ws):
        vals = jax.vmap(lambda x: loss_point_fn(x, theta))(xs)
        return jnp.sum(vals * ws) / jnp.sum(ws)

    @functools.partial(jax.jit, in_shardings=(rep, xsh, xsh),
                       out_shardings=(rep, rep))
    def vg(theta, xs, ws):
        return jax.value_and_grad(mean_loss)(theta, xs, ws)

    def run(xs, theta):
        xs = jnp.asarray(xs)
        n = xs.shape[0]
        xs, _ = _pad(xs, n_dev)
        ws = (jnp.arange(xs.shape[0]) < n).astype(xs.dtype if
                                                  jnp.issubdtype(xs.dtype,
                                                                 jnp.floating)
                                                  else jnp.float32)
        return vg(theta, jax.device_put(xs, xsh), jax.device_put(ws, xsh))

    return run
