"""Multi-device tests for torcwa_tpu.parallel.sweep.

Runs on the 8 virtual CPU devices the conftest provisions
(--xla_force_host_platform_device_count=8).  Validates that the sharded
sweep primitives — the TPU-native replacement for the reference's
sequential sweep loops (reference Example1 cell 2, Example3 cell 1) —
bit-match their unsharded vmap equivalents, including the padding /
zero-weight path for sweep lengths not divisible by the device count.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.parallel import sweep_mesh, shard_sweep, sweep_and_grad


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')


def _toy_point(x):
    # Cheap stand-in for a per-wavelength solve: nonlinear enough to catch
    # axis mixups, cheap enough to run 8-way on CPU.
    return {'t': jnp.sin(3.0 * x) * x, 'r': jnp.cos(x) ** 2}


def test_mesh_spans_all_devices():
    mesh = sweep_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ('sweep',)


@pytest.mark.parametrize('n', [8, 16, 5, 13])   # divisible and not
def test_shard_sweep_matches_vmap(n):
    mesh = sweep_mesh()
    xs = jnp.linspace(0.3, 2.1, n)
    run = shard_sweep(_toy_point, mesh=mesh)
    got = run(xs)
    want = jax.vmap(_toy_point)(xs)
    for k in want:
        assert got[k].shape == (n,)
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]))


def test_shard_sweep_output_is_sharded():
    mesh = sweep_mesh()
    run = shard_sweep(_toy_point, mesh=mesh)
    out = run(jnp.linspace(0., 1., 16))
    # before the [:n] strip the result lives on the mesh; after it, it is
    # still addressable and correct — just confirm all devices took part
    # by checking the jitted function's sharding via a fresh call
    shardings = {d.device for arr in out.values()
                 for d in arr.addressable_shards}
    assert len(shardings) == len(jax.devices())


def _toy_loss(x, theta):
    # scalar loss per sweep point with shared parameters theta
    return jnp.sum(jnp.sin(theta * x) ** 2) / theta.size


@pytest.mark.parametrize('n', [8, 11, 3])
def test_sweep_and_grad_matches_unsharded(n):
    mesh = sweep_mesh()
    xs = jnp.linspace(0.2, 1.7, n)
    theta = jnp.asarray([0.7, 1.3, 2.9])

    run = sweep_and_grad(_toy_loss, mesh=mesh)
    loss, grad = run(xs, theta)

    def mean_loss(theta):
        return jnp.mean(jax.vmap(lambda x: _toy_loss(x, theta))(xs))
    want_loss, want_grad = jax.value_and_grad(mean_loss)(theta)

    # padding points carry zero weight, so the mean is exact for any n
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                               rtol=1e-6)


def test_sweep_and_grad_pytree_theta():
    mesh = sweep_mesh()
    xs = jnp.linspace(0.1, 0.9, 10)       # 10 not divisible by 8
    theta = {'a': jnp.asarray(1.1), 'b': jnp.asarray([0.4, 0.6])}

    def loss(x, th):
        return th['a'] * jnp.sin(x) + jnp.sum(th['b']) * x ** 2

    run = sweep_and_grad(loss, mesh=mesh)
    val, grad = run(xs, theta)

    def mean_loss(th):
        return jnp.mean(jax.vmap(lambda x: loss(x, th))(xs))
    want_val, want_grad = jax.value_and_grad(mean_loss)(theta)
    np.testing.assert_allclose(float(val), float(want_val), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad['a']),
                               np.asarray(want_grad['a']), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad['b']),
                               np.asarray(want_grad['b']), rtol=1e-6)


@pytest.mark.slow
def test_shard_sweep_realistic_order():
    """Sharded wavelength sweep of a REAL RCWA solve at order (3, 3) /
    64x64 grid vs the unsharded vmap — catches sharding bugs that only
    bite at real shapes (padding x remat interaction, VERDICT r2 item
    10); the toy tests above cannot."""
    from torcwa_tpu import fmm

    order = (3, 3)
    nxy = 64
    rng = np.random.default_rng(0)
    grid = 1. + 8. * (rng.random((nxy, nxy)) > 0.5).astype(np.float32)
    spec = fmm.StackSpec(order=order, L=(500., 500.), n_layers=1,
                         has_input=True, has_output=False)
    eps_in = (jnp.asarray(2.25, jnp.float32), jnp.asarray(0., jnp.float32))
    gr = jnp.asarray(grid)[None]
    gi = jnp.zeros_like(gr)
    th = jnp.asarray([250.], jnp.float32)

    # eig_backend='qr': the in-graph QR eigensolver (the TPU production
    # path).  The host-LAPACK callback backend deadlocks against SPMD
    # collective rendezvous on the virtual CPU mesh (the callback runs on
    # the same thread pool the all-reduce participants block on).
    def point(freq):
        return fmm.simulate_txx(spec, freq, gr[0], gi[0], th[0],
                                eps_in[0], eig_backend='qr')

    freqs = jnp.asarray(1. / np.linspace(500., 700., 5), jnp.float32)
    run = shard_sweep(point, sweep_mesh())
    got = np.asarray(run(freqs))
    want = np.asarray(jax.jit(jax.vmap(point))(freqs))
    assert got.shape == want.shape == (5,)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_inprocess():
    """End-to-end: the driver's multichip dryrun on the virtual mesh.

    conftest already provisioned 8 CPU devices, so the in-process path
    (no subprocess) is taken.
    """
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)     # asserts finite FoM / grad internally


@pytest.mark.slow
def test_shard_sweep_fields_with_modes():
    """8-device sharded sweep where each point runs with_modes=True +
    fields.fmm_field_adapter: field maps must match the unsharded vmap
    (the fields path under SPMD; see also
    test_fmm_magnetic_fields.test_sharded_wavelength_field_sweep)."""
    from tests.test_fmm_magnetic_fields import _field_map_for_freq

    freqs = jnp.asarray(1. / np.linspace(560., 680., 6), jnp.float32)
    run = shard_sweep(_field_map_for_freq, sweep_mesh())
    sharded = np.asarray(run(freqs))
    unsharded = np.asarray(jax.jit(jax.vmap(_field_map_for_freq))(freqs))
    assert sharded.shape == unsharded.shape
    assert np.all(np.isfinite(sharded))
    np.testing.assert_allclose(sharded, unsharded, rtol=2e-5, atol=2e-5)
