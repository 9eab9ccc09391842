"""Example 3 — geometry (Wx, Wy) parameter sweep with .mat export
(reference example/Example3.ipynb, exact configuration).

Reference: 532 nm, a-Si:H meta-atom on a 1.46^2 substrate, 300x300 nm
cell, 300x300 raster (edge sharpness 1000), thickness 300 nm, an 11x11
grid of rectangle widths Wx, Wy in [50, 250] nm, order [20, 20]
(N = 1681 harmonics, 2N = 3362), forward txx(0,0).  The reference runs
the double loop sequentially: 18939 s total = 156.5 s/solve on its CPU
baseline (Example3.ipynb cell 1; Xeon Gold 5118).

Ours: small orders vmap the whole grid into one batched solve; at parity
order (>= 15) each wavelength's 4N x 4N solves would not fit HBM
batched, so the sweep runs as a sequential lax.map with identical math.

EX3_ORDER (default 4: smoke) / EX3_NW (default 5) / EX3_GRID control the
configuration; EX3_ORDER=20 EX3_NW=11 is the reference parity run.
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
from torcwa_tpu import materials
from torcwa_tpu.fmm import StackSpec, solve_stack_pair, sparam_xy_pair
from torcwa_tpu.utils import save_mat

LAMB0 = 532.
L = (300., 300.)
ORDER_N = int(os.environ.get('EX3_ORDER', '4'))
ORDER = (ORDER_N, ORDER_N)
GRID = int(os.environ.get('EX3_GRID', '300'))
NW = int(os.environ.get('EX3_NW', '5'))    # reference: 11
SUB_EPS = 1.46 ** 2
THICK = 300.
rdtype = jnp.float32


# a-Si:H permittivity evaluated on host via the library material (a
# complex device array cannot be materialized on this TPU runtime).
# Defaults to the vendored Tauc-Lorentz table; set ASIH_TABLE to the
# reference's measured table for bit-parity runs (the committed parity
# logs did).
_SI_MAT = materials.aSiH(os.environ.get('ASIH_TABLE'))


def _si_eps_host(lamb0):
    er, ei = _SI_MAT.eps_pair(np.float64(lamb0))
    return complex(float(er), float(ei))


_si = _si_eps_host(np.float32(LAMB0))
SI_RE = jnp.asarray(_si.real, rdtype)
SI_IM = jnp.asarray(_si.imag, rdtype)


def t00_of_wxwy(wx, wy):
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID,
                    edge_sharpness=1000., dtype=rdtype)
    geom = g.rectangle(wx, wy, L[0] / 2., L[1] / 2.)
    er = geom * SI_RE + (1. - geom)
    ei = geom * SI_IM
    spec = StackSpec(order=ORDER, L=L, n_layers=1, has_input=True)
    S, intr = solve_stack_pair(
        spec, jnp.asarray(1 / LAMB0, rdtype), jnp.asarray(0., rdtype),
        jnp.asarray(0., rdtype), (er[None], ei[None]),
        jnp.asarray([THICK], rdtype),
        eps_in=(jnp.asarray(SUB_EPS, rdtype), jnp.asarray(0., rdtype)))
    one = (jnp.asarray(1., rdtype), jnp.asarray(0., rdtype))
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'],
                            (jnp.asarray(SUB_EPS, rdtype),
                             jnp.asarray(0., rdtype)), one,
                            ORDER, [0, 0], [0, 0], 'xx')
    return tr[0], ti[0]


if __name__ == '__main__':
    w = np.linspace(50., 250., NW).astype(np.float32)
    Wx, Wy = np.meshgrid(w, w, indexing='ij')
    pts = jnp.asarray(np.stack([Wx.ravel(), Wy.ravel()], 1))
    if ORDER_N >= 15:
        # sequential chunked sweep: one 2N=3362 solve's working set at a
        # time, and <= CHUNK solves per device dispatch (a single XLA
        # program running for many minutes kills the tunnel worker)
        CHUNK = 4
        npts = pts.shape[0]
        pad = (-npts) % CHUNK
        pts_p = jnp.concatenate([pts, pts[:1].repeat(pad, 0)]) \
            if pad else pts
        chunked = jax.jit(lambda p: jax.lax.map(
            lambda q: t00_of_wxwy(q[0], q[1]), p))
        warm = chunked(pts_p[:CHUNK] + 0.01)
        np.asarray(warm[0])
        t0 = time.time()
        trs, tis = [], []
        for c0 in range(0, pts_p.shape[0], CHUNK):
            tr_c, ti_c = chunked(pts_p[c0:c0 + CHUNK])
            trs.append(np.asarray(tr_c))
            tis.append(np.asarray(ti_c))
            print(f'  {min(c0 + CHUNK, npts)} / {npts} solves', flush=True)
        tr = np.concatenate(trs)[:npts]
        ti = np.concatenate(tis)[:npts]
        t = (tr + 1j * ti).reshape(NW, NW)
        dt = time.time() - t0
    else:
        sweep = jax.jit(lambda p: jax.vmap(
            lambda q: t00_of_wxwy(q[0], q[1]))(p))
        tr, ti = sweep(pts + 0.01)     # warm up on perturbed inputs
        np.asarray(tr)
        t0 = time.time()
        tr, ti = sweep(pts)
        # complex values stay split-real on device; fuse on host
        t = (np.asarray(tr) + 1j * np.asarray(ti)).reshape(NW, NW)
        dt = time.time() - t0
    print('|t00|^2 over the (Wx, Wy) grid:')
    print(np.round(np.abs(t) ** 2, 4))
    print(f'order {ORDER_N}: {NW * NW} solves in {dt:.2f} s '
          f'({dt/(NW*NW):.3f} s/solve) on {jax.default_backend()}')
    save_mat('example3_sweep.mat', {'Wx': w, 'Wy': w, 'txx': t,
                                    'elapsed_time': dt})
    print('saved example3_sweep.mat')
