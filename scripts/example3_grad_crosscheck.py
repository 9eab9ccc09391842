"""Gradient truth at parity scale: chip f32 d|txx|^2/dWx at order [20,20]
vs a host float64 (complex128-accurate) autodiff reference.

Extends bench_logs/example3_f64_crosscheck.log (forward-only) to the
GRADIENT, per VERDICT r3 item 7: the Example4 differentiation pattern
(reference example/Example4.ipynb cells 1-3 — d(transmission)/d(geometry
parameter) through the rasterizer) at Example3's full order-[20,20]
configuration (reference example/Example3.ipynb cell 1).

Usage:
  python scripts/example3_grad_crosscheck.py host   # CPU f64 truth -> npz
  python scripts/example3_grad_crosscheck.py chip   # TPU f32 + compare
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

MODE = sys.argv[1] if len(sys.argv) > 1 else 'chip'

import jax

if MODE == 'host':
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

import time

import numpy as np
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair

LAMB0 = 532.
L = (300., 300.)
ORDER = (20, 20)
GRID = 300
SUB_EPS = 1.46 ** 2
THICK = 300.
WX, WY = 130., 180.          # an interior point of Example3's 11x11 grid
NPZ = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   '..', 'bench_logs', 'example3_grad_host.npz')


def _si_eps_host(lamb0):
    data = np.loadtxt('/root/reference/example/Materials_data/aSiH.txt')
    from scipy.interpolate import interp1d
    nk = (interp1d(data[:, 0], data[:, 1], kind='cubic')(lamb0)
          + 1j * interp1d(data[:, 0], data[:, 2], kind='cubic')(lamb0))
    return complex(nk) ** 2


def make_T(rdtype, eig_backend):
    si = _si_eps_host(np.float64(LAMB0))
    si_re = jnp.asarray(si.real, rdtype)
    si_im = jnp.asarray(si.imag, rdtype)

    def T_of_wx(wx):
        g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID,
                        edge_sharpness=1000., dtype=rdtype)
        geom = g.rectangle(wx, jnp.asarray(WY, rdtype),
                           L[0] / 2., L[1] / 2.)
        er = geom * si_re + (1. - geom)
        ei = geom * si_im
        spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
        S, intr = solve_stack_pair(
            spec, jnp.asarray(1 / LAMB0, rdtype), jnp.asarray(0., rdtype),
            jnp.asarray(0., rdtype), (er[None], ei[None]),
            jnp.asarray([THICK], rdtype),
            eps_in=(jnp.asarray(SUB_EPS, rdtype), jnp.asarray(0., rdtype)),
            eig_backend=eig_backend)
        one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
        tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                                (jnp.asarray(SUB_EPS, rdtype),
                                 jnp.asarray(0., rdtype)), one,
                                ORDER, [0, 0], [0, 0], 'xx')
        return tr[0] ** 2 + ti[0] ** 2          # |txx|^2

    return T_of_wx


if MODE == 'host':
    T = make_T(jnp.float64, 'callback')
    t0 = time.time()
    val, grad = jax.value_and_grad(T)(jnp.asarray(WX, jnp.float64))
    dt = time.time() - t0
    print(f'host f64: |txx|^2 = {float(val):.9f}  '
          f'd/dWx = {float(grad):.6e}  ({dt:.1f}s)', flush=True)
    np.savez(NPZ, val=float(val), grad=float(grad), elapsed=dt)
else:
    T = make_T(jnp.float32, 'qr')
    with jax.default_matmul_precision('highest'):
        f = jax.jit(jax.value_and_grad(T))
        v0, g0 = f(jnp.asarray(WX + 0.01, jnp.float32))    # warm up
        float(v0)
        t0 = time.time()
        val, grad = f(jnp.asarray(WX, jnp.float32))
        val, grad = float(val), float(grad)
        dt = time.time() - t0
    print(f'chip f32: |txx|^2 = {val:.9f}  d/dWx = {grad:.6e}  '
          f'({dt:.1f}s/solve fwd+grad)', flush=True)
    if os.path.exists(NPZ):
        ref = np.load(NPZ)
        rv, rg = float(ref['val']), float(ref['grad'])
        print(f'host f64 ref: |txx|^2 = {rv:.9f}  d/dWx = {rg:.6e}')
        print(f'value rel err = {abs(val - rv) / max(abs(rv), 1e-30):.3e}')
        print(f'grad  rel err = {abs(grad - rg) / max(abs(rg), 1e-30):.3e}')
    else:
        print('no host reference npz yet — run "host" mode first')
