"""CPU check: is the bench-config gradient (normal incidence, symmetric
cell — maximally degenerate eigenpairs) trustworthy at float32?

Computes d|t_xx|^2/d eps at a small order with the callback (LAPACK) eig
backend in float64 (ground truth: broadening 1e-10, same as the
reference default) and in float32 (auto broadening 1e-6), plus central
finite differences in f64, and prints cosines / norm ratios.  The
grad-stage profiler found chain-vs-production cosine ~0.04 at order 20
on chip; this isolates whether that is f32 broadening error at
degenerate pairs or an artifact of the split.
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import jax.numpy as jnp
import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair

ORDER = int(os.environ.get('ORDER', '6'))
GRID = int(os.environ.get('GRID', '128'))
L = (300., 300.)
W = 160.
THICK = 600.
EPS_HI = 2.0709 ** 2
EPS_SUB = 1.46 ** 2
LAM = 500.0


def make_T(rdtype, inc_deg=0.0):
    spec = StackSpec(order=(ORDER, ORDER), L=L, n_layers=1, has_input=True)
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    eps_in = (jnp.asarray(EPS_SUB, rdtype), jnp.asarray(0., rdtype))
    inc = jnp.asarray(np.deg2rad(inc_deg), rdtype)

    def T(eps):
        S, intr = solve_stack_pair(
            spec, jnp.asarray(1.0 / LAM, rdtype), inc,
            jnp.asarray(0., rdtype),
            (eps[None], jnp.zeros_like(eps)[None]),
            jnp.asarray([THICK], rdtype), eps_in=eps_in,
            eig_backend='callback')
        tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'], eps_in, one,
                                spec.order, [0, 0], [0, 0], 'xx')
        return (tr ** 2 + ti ** 2)[0]
    return T


def build_eps(rdtype):
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500.,
                    dtype=rdtype)
    geom = g.rectangle(W, W, L[0] / 2., L[1] / 2.)
    return jnp.asarray(geom * EPS_HI + (1. - geom), rdtype)


def cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-300))


for inc_deg in (0.0, 12.0):
    T64 = make_T(jnp.float64, inc_deg)
    T32 = make_T(jnp.float32, inc_deg)
    e64 = build_eps(jnp.float64)
    e32 = build_eps(jnp.float32)
    g64 = jax.jit(jax.grad(T64))(e64)
    g32 = jax.jit(jax.grad(T32))(e32)

    rng = np.random.default_rng(7)
    d = rng.standard_normal(e64.shape)
    d /= np.linalg.norm(d)
    d64 = jnp.asarray(d, jnp.float64)
    h = 1e-4
    fT = jax.jit(T64)
    fd = (float(fT(e64 + h * d64)) - float(fT(e64 - h * d64))) / (2 * h)

    print(f'inc={inc_deg:4.1f}deg  |g64|={float(jnp.linalg.norm(g64)):.4e} '
          f'|g32|={float(jnp.linalg.norm(g32)):.4e} '
          f'ratio={float(jnp.linalg.norm(g32) / jnp.linalg.norm(g64)):.3f}')
    print(f'    cos(g32, g64) = {cos(g32, g64):+.6f}')
    print(f'    FD(f64) = {fd:+.6e}   <g64,d> = '
          f'{float(jnp.sum(g64 * d64)):+.6e}   <g32,d> = '
          f'{float(jnp.sum(jnp.asarray(g32, jnp.float64) * d64)):+.6e}',
          flush=True)
