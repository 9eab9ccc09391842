"""torcwa_tpu — TPU-native rigorous coupled-wave analysis in JAX.

A ground-up JAX/XLA/Pallas reimplementation of the capabilities of the
reference ``torcwa`` package (GPU-accelerated Fourier modal method with
automatic differentiation).  Public surface mirrors the reference
(/root/reference/torcwa/__init__.py:1-6): ``Eig``, ``geometry``,
``rcwa_geo``, ``rcwa`` — plus TPU-first extensions (functional batched
solves, sharded sweeps, TPU-native eigensolver).
"""

import os as _os

import jax as _jax

# The reference-compatible class API executes eagerly; on CPU, JAX's
# async dispatch can deadlock against the host-LAPACK eig pure_callback
# (observed in Example4's fd+grad call sequence: the callback thread
# blocks inside np.asarray materializing its operand while the main
# thread keeps dispatching eager ops — faulthandler-confirmed lock
# inversion).  Synchronous CPU dispatch removes the race and costs
# nothing measurable on this dense-matmul-dominated workload.
# Escape hatch: TORCWA_TPU_ASYNC_CPU=1 restores JAX's default.
if _os.environ.get('TORCWA_TPU_ASYNC_CPU', '0') != '1':
    try:
        _jax.config.update('jax_cpu_enable_async_dispatch', False)
    except Exception:  # config knob absent in some jax versions
        pass

from .ops.eig import Eig, eig
from .geometry import geometry, rcwa_geo
from .solver import rcwa

__version__ = '0.1.0'
__all__ = ['Eig', 'eig', 'geometry', 'rcwa_geo', 'rcwa', '__version__']
