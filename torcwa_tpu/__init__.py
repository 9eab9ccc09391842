"""torcwa_tpu — TPU-native rigorous coupled-wave analysis in JAX.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of the
reference ``torcwa`` package (GPU-accelerated Fourier modal method with
automatic differentiation).  Public surface mirrors the reference
(/root/reference/torcwa/__init__.py:1-6): ``Eig``, ``geometry``,
``rcwa_geo``, ``rcwa`` — plus TPU-first extensions (functional batched
solves, sharded sweeps, TPU-native eigensolver).
"""

from .ops.eig import Eig, eig
from .geometry import geometry, rcwa_geo
from .solver import rcwa

__version__ = '0.1.0'
__all__ = ['Eig', 'eig', 'geometry', 'rcwa_geo', 'rcwa', '__version__']
