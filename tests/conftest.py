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

# Tests measured >= ~4 s on the CI host (pytest --durations, x64 CPU +
# 8 virtual devices).  Auto-marked @slow so the default `pytest -q`
# (addopts deselects slow) is a < 2 min regression gate; `make check-all`
# runs everything.  Curated exceptions stay fast for coverage: one golden
# S-param file (test_sparams_all_pols), one golden field map
# (test_fields_xz), and one Fresnel physics oracle.
_SLOW_NODEIDS = (
    'test_eig_hbm.py::test_aed_deflates_and_matches',
    'test_eig_hbm.py::test_hbm_multiwindow_full_pipeline',
    'test_eig_hbm.py::test_hbm_zero_diagonal_endgame',
    'test_eig_hbm.py::test_ms_zero_diagonal_endgame',
    'test_eig_hbm.py::test_vec_blocked_matches_resident',
    'test_example1_dispersive.py::test_dispersive_sweep_gradient_wrt_wavelength',
    'test_example1_dispersive.py::test_dispersive_eps_inside_vmapped_sweep',
    'test_f32_broadening.py::test_f32_grad_parity_at_degenerate_config',
    'test_fmm_magnetic_fields.py::test_sharded_wavelength_field_sweep',
    'test_fmm_magnetic_fields.py::test_fields_match_class',
    'test_fmm_magnetic_fields.py::test_sparams_match_class',
    'test_eig_packed.py::test_packed_random_spectra',
    'test_eig_packed.py::test_packed_real_spectrum_and_repeated',
    'test_parallel_sweep.py::test_shard_sweep_fields_with_modes',
    'test_parallel_sweep.py::test_shard_sweep_realistic_order',
    'test_parallel_sweep.py::test_dryrun_multichip_inprocess',
    'test_grad.py::test_grad_lossy_material',
    'test_grad.py::test_grad_vs_finite_difference[88.0]',
    'test_grad.py::test_grad_vs_finite_difference[95.0]',
    'test_fmm.py::test_modes_vs_nomodes_smatrix_and_grad',
    'test_eig_qr_real.py::test_rcwa_end_to_end_qr_backend',
    'test_fold_and_pinv.py::test_pinv_fallback_noop_when_well_conditioned',
    'test_magnetic.py::test_fields_magnetic',
    'test_fresnel.py::test_fresnel_vs_analytic[10.0]',
    'test_grad.py::test_eig_vjp_general_loss',
    'test_grad.py::test_eig_vjp_unit',
    'test_grad.py::test_grad_none_broadening',
    'test_eig_qr_real.py::test_grad_through_qr_backend',
    'test_eig_qr_real.py::test_batched',
    'test_eig_qr_real.py::test_random_f32',
    'test_fold_and_pinv.py::test_scan_fold_under_jit_grad',
    'test_fold_and_pinv.py::test_scan_fold_matches_unroll_24_layers',
    'test_fold_and_pinv.py::test_pinv_fallback_grad_finite',
    'test_fold_and_pinv.py::test_pinv_fallback_matches_class',
    'test_fold_and_pinv.py::test_scan_fold_graph_flat_vs_layer_count',
    'test_eig_baed.py::',
    'test_eig_multishift.py::',
    'test_golden_solver.py::test_example2_oblique_with_output_layer',
    'test_golden_solver.py::test_example1_1_multilayer',
    'test_eig_qr.py::test_matches_solver_end_to_end',
    'test_eig_qr.py::test_rcwa_pq_matrix',
    'test_fmm.py::test_multilayer_stack',
    'test_fmm.py::test_simulate_txx_matches_class',
    'test_fmm.py::test_simulate_grad',
    'test_fmm.py::test_twisted_multilayer_homogeneous_fast_path',
    'test_fmm.py::test_sparam_ps_matches_class_api',
    'test_fmm.py::test_simulate_vmap_over_wavelength',
    'test_fmm.py::test_fmm_diagnostics_twins',
    'test_eig_pallas.py::test_rcwa_pq_matrix',
    'test_eig_pallas.py::test_random_matrices',
    'test_eig_robustness.py::test_nonconvergence_poisons_with_nan_pallas',
    'test_eig_robustness.py::test_nonconvergence_poisons_with_nan_xla',
    'test_magnetic.py::test_sparams_magnetic',
    'test_fresnel.py::test_fresnel_vs_analytic[0.5]',
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid
        for frag in _SLOW_NODEIDS:
            if frag in nid:
                item.add_marker(pytest.mark.slow)
                break


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
