"""Multi-chip parallelism for RCWA sweeps.

The reference is strictly single-device (no torch.distributed anywhere;
sweeps are sequential Python loops — e.g. /root/reference/example/
Example1.ipynb cell 2, Example3.ipynb cell 1).  The TPU-native scaling
story is embarrassingly parallel: a wavelength/parameter sweep is a batch
axis, vmapped on one chip and sharded across chips over ICI.  The solve
itself needs no collectives; only the final per-point scalars are gathered.
"""

from .sweep import sweep_mesh, shard_sweep, sweep_and_grad

__all__ = ['sweep_mesh', 'shard_sweep', 'sweep_and_grad']
