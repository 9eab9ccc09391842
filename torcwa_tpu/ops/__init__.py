"""Numerical kernels: eigendecomposition, Fourier factorization."""

from .eig import Eig, eig
from .fourier import material_conv, order_vectors

__all__ = ['Eig', 'eig', 'material_conv', 'order_vectors']
