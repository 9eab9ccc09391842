"""Example 1 — rectangular meta-atom wavelength sweep
(reference example/Example1.ipynb, exact configuration).

Reference (cells 0+2): a 180x100 nm a-Si:H rectangle on a 1.46^2
substrate, 300x300 nm cell rasterized 300x300 (edge sharpness 1000),
300 nm thick, order [15, 15] (N = 961 harmonics, 2N = 1922), 61
wavelengths 400..700 nm, with the dispersive a-Si:H permittivity
``Materials.aSiH.apply(lamb0_now)**2`` re-evaluated at every wavelength
INSIDE the sweep — the reference loops wavelengths in Python, rebuilding
the solver each iteration.

Ours: the cubic-spline TabulatedMaterial (torcwa_tpu.materials) is
jittable and differentiable, so the eps(lambda) evaluation lives inside
the jitted per-wavelength solve.  At small order the whole sweep is one
vmapped batched solve (the batched Pallas eigensolver); at parity order
(>= 15, 2N = 1922) the per-wavelength 4N x 4N working set forces a
sequential chunked lax.map, one dispatch per chunk (a single XLA program
spanning the whole sweep runs past the tunnel worker's deadline).

EX1_ORDER (default 4: smoke) / EX1_NLAM (default 31) / EX1_GRID control
the configuration; EX1_ORDER=15 EX1_NLAM=61 EX1_GRID=300 is the
reference parity run.  EX1_GOLDEN=<npz> cross-checks |t_xx|^2 against a
reference golden (complex128 host run) at matching wavelengths.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import time

import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair
from torcwa_tpu.materials import aSiH

L = (300., 300.)
ORDER_N = int(os.environ.get('EX1_ORDER', '4'))
ORDER = (ORDER_N, ORDER_N)
GRID = int(os.environ.get('EX1_GRID', '256'))
N_LAM = int(os.environ.get('EX1_NLAM', '31'))
LAMBDAS = np.linspace(400., 700., N_LAM)
SUB_EPS = 1.46 ** 2
THICK = 300.
rdtype = jnp.float32

# vendored Tauc-Lorentz table by default; set ASIH_TABLE to the
# reference's measured table for bit-parity runs (the parity logs did)
_SI = aSiH(os.environ.get('ASIH_TABLE'))


def build_geom():
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID,
                    edge_sharpness=1000., dtype=rdtype)
    return g.rectangle(180., 100., L[0] / 2., L[1] / 2.)


def t00(freq, geom):
    """|t_xx(0,0)|^2 at one wavelength; eps(lambda) evaluated in-trace."""
    lam = 1.0 / freq
    er_si, ei_si = _SI.eps_pair(lam)    # (n + ik)^2, spline-differentiable
    er = geom * er_si.astype(rdtype) + (1. - geom)
    ei = geom * ei_si.astype(rdtype)
    spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
    S, intr = solve_stack_pair(
        spec, freq, jnp.asarray(0., rdtype), jnp.asarray(0., rdtype),
        (er[None], ei[None]), jnp.asarray([THICK], rdtype),
        eps_in=(jnp.asarray(SUB_EPS, rdtype), jnp.asarray(0., rdtype)),
        eig_backend='qr')
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(SUB_EPS, rdtype),
                             jnp.asarray(0., rdtype)), one,
                            ORDER, [0, 0], [0, 0], 'xx')
    return (tr ** 2 + ti ** 2)[0]


if __name__ == '__main__':
    geom = build_geom()
    freqs = jnp.asarray(1.0 / LAMBDAS, rdtype)
    if ORDER_N >= 15:
        # sequential chunked sweep (see module docstring)
        CHUNK = 2
        nlam = freqs.shape[0]
        pad = (-nlam) % CHUNK
        freqs_p = (jnp.concatenate([freqs, freqs[:1].repeat(pad)])
                   if pad else freqs)
        chunked = jax.jit(lambda fs: jax.lax.map(
            lambda f: t00(f, geom), fs))
        warm = chunked(freqs_p[:CHUNK] * 1.0003)
        np.asarray(warm)
        t0 = time.time()
        Ts = []
        for c0 in range(0, freqs_p.shape[0], CHUNK):
            Ts.append(np.asarray(chunked(freqs_p[c0:c0 + CHUNK])))
        dt = time.time() - t0
        T = np.concatenate(Ts)[:nlam]
    else:
        sweep = jax.jit(lambda g: jax.vmap(lambda f: t00(f, g))(freqs))
        warm = sweep(geom * 0.999)
        np.asarray(warm)
        t0 = time.time()
        T = np.asarray(sweep(geom))
        dt = time.time() - t0

    for lam, t in zip(LAMBDAS, T):
        print(f'lambda={lam:6.1f} nm   T00={t:.5f}')
    print(f'\norder {list(ORDER)}, grid {GRID}, dispersive a-Si:H in-sweep: '
          f'{N_LAM} wavelengths in {dt:.2f} s '
          f'({dt / N_LAM:.4f} s/solve) on {jax.default_backend()}')

    golden = os.environ.get('EX1_GOLDEN')
    if golden:
        ref = np.load(golden)
        lam_ref = ref['lambs']
        t_ref = np.abs(ref['txx']) ** 2
        idx = [int(np.argmin(np.abs(LAMBDAS - l))) for l in lam_ref]
        ours = T[idx]
        ok = np.allclose(LAMBDAS[idx], lam_ref)
        rel = np.abs(ours - t_ref) / np.maximum(np.abs(t_ref), 1e-3)
        print(f'golden cross-check ({golden}): lambda match={ok}, '
              f'max |dT|={np.abs(ours - t_ref).max():.2e}, '
              f'max rel={rel.max():.2e}')
        for l, a, b in zip(lam_ref, ours, t_ref):
            print(f'  lambda={l:6.1f}  ours={a:.5f}  ref_f64={b:.5f}')
