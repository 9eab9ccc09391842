"""Fourier factorization: permittivity grid -> block-Toeplitz convolution matrix.

Mirrors the reference's Laurent-rule factorization
(/root/reference/torcwa/rcwa.py:1183-1204): the real-space material grid is
2D-FFT'd (normalized by the pixel count) and the convolution matrix is a
gather of the FFT at order differences ``[ox_i - ox_j, oy_i - oy_j]``.

The reference relies on torch's negative-index wrapping for the gather;
JAX clamps negative traced indices instead of wrapping, so we take the
indices modulo the grid size explicitly (identical semantics as long as
``2*max_order < n`` — the same validity condition the reference has).
"""

import numpy as np
import jax.numpy as jnp

__all__ = ['order_vectors', 'material_conv', 'material_conv_pair']


def order_vectors(order):
    """Flattened Fourier-order index vectors.

    Matches rcwa.py:66-68 + the meshgrid flattening of rcwa.py:1187-1189:
    ox varies slowest (indexing='ij'), oy fastest.

    Returns numpy int arrays (static, trace-time constants).
    """
    ox1 = np.arange(-order[0], order[0] + 1)
    oy1 = np.arange(-order[1], order[1] + 1)
    ox, oy = np.meshgrid(ox1, oy1, indexing='ij')
    return ox.reshape(-1), oy.reshape(-1)


def material_conv(grid, order, dtype):
    """Convolution (Toeplitz) matrix of a material grid.

    Args:
      grid: [nx, ny] real or complex material distribution.
      order: (order_x, order_y) ints (static).
      dtype: simulation complex dtype.

    Returns:
      [N, N] complex convolution matrix, N = (2*order_x+1)*(2*order_y+1).
    """
    grid = jnp.asarray(grid)
    nx, ny = grid.shape
    ox, oy = order_vectors(order)
    # Static numpy index math (trace-time constants).
    rows = np.mod(ox[:, None] - ox[None, :], nx)
    cols = np.mod(oy[:, None] - oy[None, :], ny)
    fft = jnp.fft.fft2(grid.astype(dtype)) / (nx * ny)
    return fft[rows, cols]


def material_conv_pair(grid, order):
    """Toeplitz convolution matrix of a material grid, split-real.

    grid: cpair (re, im) of [nx, ny] real arrays.  Returns a cpair [N, N].
    Identical math to :func:`material_conv` (reference rcwa.py:1183-1204) —
    the DFT is evaluated only at the (4ox+1) x (4oy+1) needed order
    differences with real cos/sin matmuls (MXU-friendly, no complex FFT,
    lowers on the TPU runtime).
    """
    rdtype = grid[0].dtype
    nx, ny = grid[0].shape
    dox = np.arange(-2 * order[0], 2 * order[0] + 1)
    doy = np.arange(-2 * order[1], 2 * order[1] + 1)
    x = np.arange(nx)
    y = np.arange(ny)
    # exp(-2 pi i k x / n)
    phx = -2 * np.pi * np.outer(dox, x) / nx
    phy = -2 * np.pi * np.outer(doy, y) / ny
    Exc = jnp.asarray(np.cos(phx), rdtype)
    Exs = jnp.asarray(np.sin(phx), rdtype)
    Eyc = jnp.asarray(np.cos(phy), rdtype)
    Eys = jnp.asarray(np.sin(phy), rdtype)

    # M = Ex @ grid @ Ey^T / (nx ny): complex triple product on pairs, with
    # Ex = Exc + i Exs (and likewise Ey)
    def triple(g):
        a = Exc @ g
        b = Exs @ g
        return (a @ Eyc.T - b @ Eys.T, a @ Eys.T + b @ Eyc.T)
    mr_r, mr_i = triple(grid[0])
    mi_r, mi_i = triple(grid[1])
    Mr = (mr_r - mi_i) / (nx * ny)
    Mi = (mr_i + mi_r) / (nx * ny)

    # Block-Toeplitz expansion M[(a,b),(c,d)] = Mgrid[a-c+2ox, b-d+2oy]
    # as two one-hot contractions + a transpose.  The obvious fancy-index
    # gather (reference rcwa.py:1204 semantics) lowers to an XLA gather
    # of ~(N^2) scattered elements, measured at ~54 ms of the 231 ms
    # order-6 bench sweep on TPU; the one-hot einsums are two tiny MXU
    # GEMMs instead (and their VJP is a pair of GEMMs, not a scatter).
    px, py = 2 * order[0] + 1, 2 * order[1] + 1
    ax = np.arange(px)
    Sx = (ax[:, None, None] - ax[None, :, None] + 2 * order[0]
          == np.arange(len(dox))[None, None, :]).astype(np.float32)
    ay = np.arange(py)
    Sy = (ay[:, None, None] - ay[None, :, None] + 2 * order[1]
          == np.arange(len(doy))[None, None, :]).astype(np.float32)
    Sx = jnp.asarray(Sx, rdtype)
    Sy = jnp.asarray(Sy, rdtype)

    def toeplitz(M):
        tmp = jnp.einsum('acu,uv->acv', Sx, M)
        out = jnp.einsum('acv,bdv->abcd', tmp, Sy)
        return out.reshape(px * py, px * py)

    return toeplitz(Mr), toeplitz(Mi)
