"""Test configuration: force CPU backend with 8 virtual devices.

Must set env vars before jax initializes.  Tests exercise numerics on CPU
(host LAPACK eig oracle available) and sharding on a virtual 8-device mesh;
TPU execution is exercised by bench.py / __graft_entry__.py on hardware.
"""

import os

os.environ.setdefault('JAX_PLATFORM_NAME', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import pytest  # noqa: E402
import numpy as np  # noqa: E402


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'golden')

# Slow-test policy: tests measured >= ~4 s on the CI host (pytest
# --durations, x64 CPU + 8 virtual devices) carry an explicit
# @pytest.mark.slow in their own file (whole-file sets use pytestmark);
# the default `pytest -q` (addopts deselects slow) is a < 2 min
# regression gate, `make check-all` runs everything.  Curated fast
# exceptions for coverage: one golden S-param file, one golden field
# map, one Fresnel physics oracle, and one interpret-mode HBM QR
# endgame (test_eig_hbm.py::test_hbm_small_block_fast).


@pytest.fixture(scope='session')
def golden():
    """Load a golden .npz by name."""
    def load(name):
        path = os.path.join(GOLDEN_DIR, f'{name}.npz')
        if not os.path.exists(path):
            pytest.skip(f'golden file {name}.npz missing '
                        f'(run scripts/make_goldens.py)')
        return np.load(path)
    return load
