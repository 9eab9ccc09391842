"""Chip A/B: batched single-shift acc kernel vs AED+multishift baed kernel
on the order-6 bench's actual PQ wave matrices (b=8, 2N=338) and random
batches.  Also checks correctness (finite, subdiag mass, sample residual).

Usage: python scripts/baed_chip_check.py [m] [kw]
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp

print('backend:', jax.default_backend(), flush=True)
from torcwa_tpu.ops.eig_qr_pallas import (hessenberg_pallas,
                                          schur_qr_pallas_acc,
                                          eig_tri_vectors_pallas)
from torcwa_tpu.ops.attic.eig_qr_pallas_baed import schur_qr_pallas_baed

M = int(sys.argv[1]) if len(sys.argv) > 1 else 8
KW = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def bench_pq():
    """The order-6 bench's per-wavelength A = P @ Q matrices (b=8)."""
    import torcwa_tpu as tt
    from torcwa_tpu.fmm import (StackSpec, dft_conv_pair, pq_pair,
                                kvectors_real)
    from torcwa_tpu.ops import cplx
    rdtype = jnp.float32
    GRID, ORDER = 256, 6
    L = (300., 300.)
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500.,
                    dtype=rdtype)
    geom = g.rectangle(160., 160., L[0] / 2., L[1] / 2.)
    eps = jnp.asarray(geom * (2.0709 ** 2) + (1. - geom), rdtype)
    freqs = jnp.asarray(1.0 / np.linspace(400., 700., 8), rdtype)
    spec = StackSpec(order=(ORDER, ORDER), L=L, n_layers=1, has_input=True)
    zero = jnp.asarray(0., rdtype)

    @jax.jit
    def build(er):
        with jax.default_matmul_precision('highest'):
            c = dft_conv_pair((er, jnp.zeros_like(er)), spec.order,
                              er.shape[0], er.shape[1])

            def one(freq):
                kx, ky = kvectors_real(freq, zero, zero,
                                       jnp.asarray(1.46, rdtype),
                                       spec.order, spec.L, rdtype)
                P, Q = pq_pair(c, kx, ky)
                return cplx.cmm(P, Q)

            return jax.vmap(one)(freqs)

    return build(eps)


def time_solver(fn, Hr, Hi, Qr, Qi, tag, reps=3):
    out = fn(Hr * 1.0003, Hi, Qr, Qi)
    chk = float(jnp.sum(out[0]))
    best = np.inf
    for rep in range(reps):
        sc = 1. + 1e-4 * (rep + 1)
        t0 = time.time()
        out = fn(Hr * sc, Hi, Qr, Qi)
        chk = float(jnp.sum(jnp.nan_to_num(out[0])))
        best = min(best, time.time() - t0)
    out = fn(Hr, Hi, Qr, Qi)       # unperturbed, for the correctness check
    float(jnp.sum(jnp.nan_to_num(out[0])))
    Tr, Ti = out[0], out[1]
    w = (np.asarray(jnp.diagonal(Tr, axis1=1, axis2=2))
         + 1j * np.asarray(jnp.diagonal(Ti, axis1=1, axis2=2)))
    print(f'{tag}: {best * 1e3:.0f} ms  finite={np.isfinite(w).all()}',
          flush=True)
    return best, out


for tag, make in [('pq338', bench_pq)]:
    (Ar, Ai) = make()
    b, n = Ar.shape[0], Ar.shape[-1]
    print(f'--- {tag}: b={b} n={n}', flush=True)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_pallas(Ar, Ai)
        float(jnp.sum(Hr))
        t_acc, out_a = time_solver(
            lambda *a: schur_qr_pallas_acc(*a), Hr, Hi, Qr, Qi, 'acc')
        t_baed, out_b = time_solver(
            lambda *a: schur_qr_pallas_baed(*a, m=M, kw=KW),
            Hr, Hi, Qr, Qi, f'baed(m={M},kw={KW})')
        _, _, _, _, (hi_f, sweeps) = schur_qr_pallas_baed(
            Hr, Hi, Qr, Qi, m=M, kw=KW, return_stats=True)
        print('baed sweeps:', np.asarray(sweeps), 'hi_f:', np.asarray(hi_f),
              flush=True)
        # correctness: eigvals of lane 0 vs host LAPACK
        A = np.asarray(Ar[0]) + 1j * np.asarray(Ai[0])
        w0 = np.linalg.eigvals(A.astype(np.complex128))
        for nm, out in [('acc', out_a), ('baed', out_b)]:
            w = (np.asarray(jnp.diagonal(out[0][0]))
                 + 1j * np.asarray(jnp.diagonal(out[1][0])))
            wq = w.copy()
            errs = []
            for v in w0:
                i = np.argmin(np.abs(wq - v))
                errs.append(abs(wq[i] - v))
                wq[i] = 1e30
            print(f'{nm}: eig err {max(errs) / np.abs(w0).max():.2e}',
                  flush=True)
print('DONE', flush=True)
