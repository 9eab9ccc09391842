"""Example1 exact-semantics parity: the dispersive a-Si:H permittivity
evaluated at every wavelength INSIDE the vmapped/jitted sweep.

The reference re-evaluates ``Materials.aSiH.apply(lamb0_now)**2`` in its
Python wavelength loop (/root/reference/example/Example1.ipynb cell 2);
here the TabulatedMaterial spline runs in-trace so one jitted vmap covers
the whole sweep, wavelength-dependent eps grid included.  Golden:
complex128 reference run (scripts/make_goldens.py golden_example1_dispersive).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair
from torcwa_tpu.materials import aSiH

L = (300., 300.)
ORDER = (4, 4)
SUB_EPS = 1.46 ** 2
THICK = 300.

_ASIH_PATH = '/root/reference/example/Materials_data/aSiH.txt'


def _txx_pair(freq, geom, material, rdtype):
    lam = 1.0 / freq
    er_si, ei_si = material.eps_pair(lam)
    er = geom * er_si.astype(rdtype) + (1. - geom)
    ei = geom * ei_si.astype(rdtype)
    spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
    S, intr = solve_stack_pair(
        spec, freq, jnp.asarray(0., rdtype), jnp.asarray(0., rdtype),
        (er[None], ei[None]), jnp.asarray([THICK], rdtype),
        eps_in=(jnp.asarray(SUB_EPS, rdtype), jnp.asarray(0., rdtype)),
        eig_backend='qr')
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    return sparam_xy_pair(S, intr['kx'], intr['ky'],
                          (jnp.asarray(SUB_EPS, rdtype),
                           jnp.asarray(0., rdtype)), one,
                          ORDER, [0, 0], [0, 0], 'xx')


@pytest.mark.skipif(not os.path.exists(_ASIH_PATH),
                    reason='reference a-Si:H table not available')
@pytest.mark.slow
def test_dispersive_eps_inside_vmapped_sweep(golden):
    ref = golden('example1_dispersive')
    lambs = ref['lambs']
    geom = jnp.asarray(ref['geom'], jnp.float32)
    mat = aSiH(_ASIH_PATH)
    freqs = jnp.asarray(1.0 / lambs, jnp.float32)

    sweep = jax.jit(jax.vmap(
        lambda f: _txx_pair(f, geom, mat, jnp.float32)))
    tr, ti = sweep(freqs)
    ours = np.asarray(tr)[:, 0] + 1j * np.asarray(ti)[:, 0]

    ref_txx = ref['txx']
    # class tolerance: f32 batched-QR sweep vs complex128 reference
    np.testing.assert_allclose(np.abs(ours) ** 2, np.abs(ref_txx) ** 2,
                               atol=4e-3, rtol=0)
    assert np.max(np.abs(ours - ref_txx)) < 8e-3


@pytest.mark.skipif(not os.path.exists(_ASIH_PATH),
                    reason='reference a-Si:H table not available')
@pytest.mark.slow
def test_dispersive_sweep_gradient_wrt_wavelength(golden):
    """d|t|^2/dlambda flows through the spline AND the solver: matches a
    central difference of the same pipeline."""
    ref = golden('example1_dispersive')
    geom = jnp.asarray(ref['geom'], jnp.float32)
    mat = aSiH(_ASIH_PATH)

    def T_of_lam(lam):
        tr, ti = _txx_pair(1.0 / lam, geom, mat, jnp.float32)
        return (tr ** 2 + ti ** 2)[0]

    lam0 = 550.
    g = float(jax.jit(jax.grad(T_of_lam))(jnp.asarray(lam0, jnp.float32)))
    h = 0.25
    fd = (float(T_of_lam(jnp.asarray(lam0 + h, jnp.float32)))
          - float(T_of_lam(jnp.asarray(lam0 - h, jnp.float32)))) / (2 * h)
    assert np.isfinite(g)
    assert np.isclose(g, fd, rtol=0.05, atol=1e-5)
