"""Auxiliary subsystems: profiling, checkpointing, data export.

The reference has none of these (SURVEY.md §5): notebooks time with
wall-clock prints, persist results with scipy.io.savemat, and keep
optimization history in RAM with no resume capability.
"""

from .timing import (StageTimer, eig_stage_flops, measured_gemm_peak,
                     mfu_report)
from .checkpoint import save_state, load_state
from .export import save_mat, load_mat

__all__ = ['StageTimer', 'save_state', 'load_state', 'save_mat', 'load_mat']
