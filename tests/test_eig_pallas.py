"""Pallas Schur-QR kernel: correctness in interpreter mode (CPU).

The kernel itself runs on TPU in production (ops/eig_qr_real.py routes
to it when the backend is not cpu); here the same kernel body runs in the
Pallas interpreter against LAPACK and against the XLA-loop twin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torcwa_tpu.ops import eig_qr_real as eqr
from torcwa_tpu.ops.eig_qr_pallas import schur_qr_pallas


def _full_eig_via_pallas(Ar, Ai):
    Hr, Hi, Qr, Qi = jax.jit(eqr.hessenberg_real)(Ar, Ai)
    Tr, Ti, Zr, Zi = schur_qr_pallas(Hr, Hi, Qr, Qi, interpret=True)
    Vr, Vi = jax.jit(eqr.eig_tri_vectors_real)(Tr, Ti, Zr, Zi)
    w = np.asarray(jnp.diagonal(Tr)) + 1j * np.asarray(jnp.diagonal(Ti))
    V = np.asarray(Vr) + 1j * np.asarray(Vi)
    return w, V


@pytest.mark.parametrize('n', [4, 16, 48])
@pytest.mark.slow
def test_random_matrices(n):
    rng = np.random.default_rng(n)
    Ar = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    w, V = _full_eig_via_pallas(Ar, Ai)
    An = np.asarray(Ar) + 1j * np.asarray(Ai)
    res = np.linalg.norm(An @ V - V * w[None, :], axis=0).max()
    assert res < 5e-4 * np.abs(w).max(), res
    w0 = np.sort_complex(np.linalg.eig(An.astype(np.complex128))[0])
    werr = np.max(np.abs(np.sort_complex(w) - w0)) / np.abs(w0).max()
    assert werr < 1e-4, werr


@pytest.mark.slow
def test_rcwa_pq_matrix():
    """The production workload: P@Q of a patterned layer (clustered,
    symmetry-degenerate spectrum)."""
    import torcwa_tpu as tt
    from torcwa_tpu import fmm
    from torcwa_tpu.ops import cplx

    L = (300., 300.)
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=64, ny=64, edge_sharpness=500.,
                    dtype=jnp.float32)
    geom = g.circle(95., L[0] / 2., L[1] / 2.)
    eps = geom * 4.2 + (1. - geom)
    order = (2, 2)
    kx, ky = fmm.kvectors_real(jnp.asarray(1 / 473., jnp.float32),
                               jnp.asarray(0., jnp.float32),
                               jnp.asarray(0., jnp.float32),
                               jnp.asarray(1.46, jnp.float32),
                               order, L, jnp.float32)
    conv = fmm.dft_conv_pair((jnp.asarray(eps, jnp.float32),
                              jnp.zeros((64, 64), jnp.float32)),
                             order, 64, 64)
    P, Q = fmm.pq_pair(conv, kx, ky)
    A = cplx.cmm(P, Q)
    w, V = _full_eig_via_pallas(A[0], A[1])
    An = np.asarray(A[0]) + 1j * np.asarray(A[1])
    res = np.linalg.norm(An @ V - V * w[None, :], axis=0).max()
    assert res < 1e-3 * np.abs(w).max(), res
    # lexicographic sort is unstable across near-degenerate pairs; compare
    # by nearest-match distance instead
    w0 = np.linalg.eig(An.astype(np.complex128))[0]
    dist = np.abs(w[:, None] - w0[None, :]).min(axis=1).max()
    assert dist < 5e-4 * np.abs(w0).max(), dist
