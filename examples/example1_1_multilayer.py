"""Example 1-1 — multi-layered meta-atom (reference example/Example1-1.ipynb).

A 6-layer twisted stack: three a-Si:H rectangles rotated 0/30/60 degrees
embedded in SU-8, interleaved with homogeneous SU-8 spacers, on a SiO2
substrate at 650 nm.  The reference re-solves the structure at harmonic
orders 0..22 and exports the circular-polarization transmissions
(TRR/TLR/TRL/TLL from txx/tyx/txy/tyy, Example1-1.ipynb cell 2) — the
order-convergence study doubling as a validation suite (SURVEY §4).

TPU-native differences from the reference:
- the homogeneous SU-8 spacers take the O(N) block-diagonal fast path
  (``StackSpec.homogeneous``) instead of a dense 2N x 2N eig
  (the reference pays the full eig per spacer via rcwa.py:146-170);
- all four polarization transfer elements come from ONE solve.

EX11_ORDERS: comma list or max order (default "0,3,6,9,12" smoke;
set 22 for the full reference sweep).  Exports
example1_1_data_order_<N>.mat per order like the notebook.
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

LAMB0 = 650.
L = (300., 300.)
NX = NY = 300
SUB_EPS = 1.46 ** 2
SU8_EPS = 1.6 ** 2
W_X, W_Y = 180., 100.
RDTYPE = jnp.float32

_spec_orders = os.environ.get('EX11_ORDERS', '0,3,6,9,12')
if ',' in _spec_orders:
    ORDERS = [int(s) for s in _spec_orders.split(',')]
else:
    ORDERS = list(range(int(_spec_orders) + 1))

# a-Si:H permittivity evaluated on host via the library material (a
# complex device array cannot be materialized on this TPU runtime).
# Defaults to the vendored Tauc-Lorentz table; set ASIH_TABLE to the
# reference's measured table for bit-parity runs (the committed parity
# logs did).
_SI_MAT = materials.aSiH(os.environ.get('ASIH_TABLE'))


def _si_eps_host(lamb0):
    er, ei = _SI_MAT.eps_pair(np.float64(lamb0))
    return complex(float(er), float(ei))


_si = _si_eps_host(LAMB0)


def _layers():
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=NX, ny=NY, edge_sharpness=1000.,
                    dtype=RDTYPE)
    rects = [g.rectangle(W_X, W_Y, L[0] / 2., L[1] / 2., theta=th)
             for th in (0., np.deg2rad(30.), np.deg2rad(60.))]
    eps_r = jnp.stack([r * _si.real + (1. - r) * SU8_EPS for r in rects])
    eps_i = jnp.stack([r * _si.imag for r in rects])
    return eps_r, eps_i


def t_elements(order_n):
    """(txx, tyx, txy, tyy) pairs of the (0,0) order at order_n."""
    spec = StackSpec(order=(order_n, order_n), L=L, n_layers=6,
                     has_input=True,
                     homogeneous=(False, True, False, True, False, True))
    eps_r, eps_i = _layers()
    zero = jnp.asarray(0., RDTYPE)
    S, intr = solve_stack_pair(
        spec, jnp.asarray(1. / LAMB0, RDTYPE), zero, zero,
        (eps_r, eps_i),
        jnp.asarray([200., 100., 200., 100., 200., 100.], RDTYPE),
        eps_in=(jnp.asarray(SUB_EPS, RDTYPE), zero),
        eps_scalars=(jnp.full((3,), SU8_EPS, RDTYPE), jnp.zeros(3, RDTYPE)))
    sub = (jnp.asarray(SUB_EPS, RDTYPE), zero)
    one = (jnp.asarray(1., RDTYPE), zero)
    out = []
    for pol in ('xx', 'yx', 'xy', 'yy'):
        tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'], sub, one,
                                spec.order, [0, 0], [0, 0], pol)
        out.append((float(tr[0]), float(ti[0])))
    return out


def circular(txx, tyx, txy, tyy):
    """RCP/LCP transmissions from the xy basis (Example1-1 cell 2)."""
    def mag2(ar, ai):
        return (ar * ar + ai * ai) / 4.
    # txx + tyy + 1j (txy - tyx)
    TRR = mag2(txx[0] + tyy[0] - (txy[1] - tyx[1]),
               txx[1] + tyy[1] + (txy[0] - tyx[0]))
    TLR = mag2(txx[0] - tyy[0] - (txy[1] + tyx[1]),
               txx[1] - tyy[1] + (txy[0] + tyx[0]))
    TRL = mag2(txx[0] - tyy[0] + (txy[1] + tyx[1]),
               txx[1] - tyy[1] - (txy[0] + tyx[0]))
    TLL = mag2(txx[0] + tyy[0] + (txy[1] - tyx[1]),
               txx[1] + tyy[1] - (txy[0] - tyx[0]))
    return TRR, TLR, TRL, TLL


if __name__ == '__main__':
    print(f'{"order":>6} {"TRR":>9} {"TLR":>9} {"TRL":>9} {"TLL":>9}'
          f' {"sum":>9}')
    t0 = time.time()
    for order_n in ORDERS:
        txx, tyx, txy, tyy = t_elements(order_n)
        TRR, TLR, TRL, TLL = circular(txx, tyx, txy, tyy)
        print(f'{order_n:6d} {TRR:9.5f} {TLR:9.5f} {TRL:9.5f} {TLL:9.5f}'
              f' {TRR + TLR + TRL + TLL:9.5f}', flush=True)
        save_mat(f'example1_1_data_order_{order_n}.mat',
                 {'txx': np.asarray(txx[0] + 1j * txx[1]),
                  'tyx': np.asarray(tyx[0] + 1j * tyx[1]),
                  'txy': np.asarray(txy[0] + 1j * txy[1]),
                  'tyy': np.asarray(tyy[0] + 1j * tyy[1]),
                  'TRR': TRR, 'TLR': TLR, 'TRL': TRL, 'TLL': TLL})
    dt = time.time() - t0
    print(f'{len(ORDERS)} orders in {dt:.1f} s on {jax.default_backend()}')
