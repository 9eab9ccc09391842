"""Interpret-mode validation of the in-kernel AED path.

Stage 1: _mini_schur alone inside a trivial pallas_call — check T is the
Schur form of W with U = conj(Q): ||Q W Q^H - T|| small and eigenvalues
match numpy.
Stage 2: full schur_qr_hbm with aed=True vs aed=False — eigenvalue
correctness + sweep-count reduction.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torcwa_tpu.ops.eig_qr_hbm import _mini_schur, schur_qr_hbm
from torcwa_tpu.ops.eig_qr_real import hessenberg_real


def mini_schur_host(Wr, Wi, kw):
    def kern(wr_in, wi_in, tr_o, ti_o, ur_o, ui_o, hi_o):
        Tr, Ti, Ur, Ui, hi_m = _mini_schur(wr_in[:], wi_in[:], kw, 3*kw+40)
        tr_o[:] = Tr
        ti_o[:] = Ti
        ur_o[:] = Ur
        ui_o[:] = Ui
        import jax.lax as lax
        sub = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        hi_o[:] = jnp.broadcast_to(hi_m.astype(jnp.float32)[0], (8, 128))
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((1, kw, kw), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        interpret=True,
    )(Wr[None], Wi[None])
    return out


def stage1():
    kw = 64
    rng = np.random.default_rng(0)
    A = (rng.standard_normal((kw, kw))
         + 1j * rng.standard_normal((kw, kw))).astype(np.complex64) * 0.3
    import scipy.linalg as sla
    H = sla.hessenberg(A.astype(np.complex128)).astype(np.complex64)
    Wr = jnp.asarray(H.real, jnp.float32)
    Wi = jnp.asarray(H.imag, jnp.float32)
    t0 = time.time()
    Tr, Ti, Ur, Ui, hi = mini_schur_host(Wr, Wi, kw)
    print(f'stage1: mini_schur ran in {time.time()-t0:.1f}s '
          f'hi_m={float(hi[0,0])}')
    T = np.asarray(Tr[0]) + 1j * np.asarray(Ti[0])
    U = np.asarray(Ur[0]) + 1j * np.asarray(Ui[0])
    Q = U.conj()
    # unitarity
    uerr = np.abs(Q @ Q.conj().T - np.eye(kw)).max()
    # similarity: T = Q H Q^H
    serr = np.abs(Q @ H @ Q.conj().T - T).max()
    w = np.sort_complex(np.diagonal(T))
    wref = np.sort_complex(np.linalg.eigvals(H.astype(np.complex128)))
    eerr = np.max(np.abs(w - wref))
    # sub-Hessenberg content of T (should be ~ 0 below diag)
    tril = np.tril(T, -1)
    print(f'stage1: unitarity={uerr:.2e} similarity={serr:.2e} '
          f'eig={eerr:.2e} subdiag_max={np.abs(tril).max():.2e}')
    assert uerr < 5e-6 and serr < 5e-5 and eerr < 5e-4
    print('stage1 OK')


def stage2(n=300, seed=3):
    rng = np.random.default_rng(seed)
    Ar = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)) * 0.3, jnp.float32)
    with jax.default_matmul_precision('highest'):
        Hr, Hi, Qr, Qi = hessenberg_real(Ar, Ai)
        for aed in (True, False):
            t0 = time.time()
            Tr, Ti, Zr, Zi, (hi_f, sweeps, aed_d, skipped, multi) = schur_qr_hbm(
                Hr, Hi, Qr, Qi, m=8, wb=256, interpret=True,
                return_stats=True, aed=aed)
            w = np.asarray(jnp.diagonal(Tr)) + 1j*np.asarray(jnp.diagonal(Ti))
            A = np.asarray(Ar) + 1j * np.asarray(Ai)
            wref = np.sort_complex(np.linalg.eigvals(A))
            err = (np.max(np.abs(np.sort_complex(w) - wref))
                   if np.isfinite(w).all() else np.nan)
            from torcwa_tpu.ops.vec_blocked import eig_tri_vectors_blocked
            Vr, Vi = eig_tri_vectors_blocked(Tr, Ti, Zr, Zi, block=128,
                                             interpret=True)
            V = np.asarray(Vr) + 1j * np.asarray(Vi)
            cols = [0, 1, n // 2, n - 2, n - 1]
            vres = np.abs(A @ V[:, cols] - V[:, cols] * w[None, cols]).max()
            print(f'stage2 aed={aed}: n={n} hi_f={int(hi_f)} '
                  f'sweeps={int(sweeps)} aed_defl={int(aed_d)} '
                  f'eig_err={err:.2e} vec_res={vres:.2e} '
                  f'({time.time()-t0:.0f}s)', flush=True)


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('all', '1'):
        stage1()
    if which in ('all', '2'):
        stage2()
