"""MATLAB .mat export/import for ecosystem parity.

The reference's notebooks persist every sweep/optimization result via
``scipy.io.savemat`` (README.md:269-270, Example3/5/6 export cells);
users' downstream tooling expects that format.
"""

import numpy as np

__all__ = ['save_mat', 'load_mat']


def save_mat(path, data):
    """Save a dict of arrays to a MATLAB .mat file (jax arrays accepted)."""
    import scipy.io
    scipy.io.savemat(path, {k: np.asarray(v) for k, v in data.items()})


def load_mat(path):
    import scipy.io
    return scipy.io.loadmat(path)
