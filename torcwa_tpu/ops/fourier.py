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

__all__ = ['order_vectors', 'material_conv']


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
