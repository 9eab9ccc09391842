"""Example0 oracle: zero-internal-layer RCWA vs closed-form Fresnel
coefficients, plus golden parity with the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

import torcwa_tpu as tt

L = [300., 300.]
LAMB0 = 532.
N1, N2 = 1.46, 1.0


def _solve(inc_ang):
    sim = tt.rcwa(freq=1 / LAMB0, order=[7, 7], L=L, dtype=jnp.complex64)
    sim.add_input_layer(eps=N1 ** 2)
    sim.set_incident_angle(inc_ang=inc_ang, azi_ang=0.)
    sim.solve_global_smatrix()
    return sim


def _fresnel(inc):
    ct = np.cos(inc)
    stt = np.emath.sqrt(1 - (N1 / N2 * np.sin(inc)) ** 2)
    R_TM = np.abs((N1 * stt - N2 * ct) / (N1 * stt + N2 * ct)) ** 2
    R_TE = np.abs((N1 * ct - N2 * stt) / (N1 * ct + N2 * stt)) ** 2
    return R_TM, R_TE


@pytest.mark.parametrize('deg', [pytest.param(0.5, marks=pytest.mark.slow),
                                 pytest.param(10., marks=pytest.mark.slow),
                                 25., 40., 43.2, 50., 70., 85.])
def test_fresnel_vs_analytic(deg):
    inc = deg * np.pi / 180
    sim = _solve(inc)
    R_TM, R_TE = _fresnel(inc)
    g = lambda pol, port: float(jnp.abs(sim.S_parameters(
        orders=[0, 0], direction='forward', port=port,
        polarization=pol, ref_order=[0, 0]))[0] ** 2)
    assert np.isclose(g('pp', 'reflection'), R_TM, atol=2e-4)
    assert np.isclose(g('ss', 'reflection'), R_TE, atol=2e-4)
    # energy conservation: T = 1 - R (zero when beyond the critical angle)
    crit = np.arcsin(N2 / N1)
    t_tm, t_te = g('pp', 'transmission'), g('ss', 'transmission')
    if inc < crit:
        assert np.isclose(t_tm, 1 - R_TM, atol=2e-4)
        assert np.isclose(t_te, 1 - R_TE, atol=2e-4)
    else:
        assert t_tm < 1e-6 and t_te < 1e-6


def test_fresnel_golden_parity(golden):
    g = golden('example0')
    angles = g['angles']
    for i in range(0, len(angles), 9):
        sim = _solve(float(angles[i]))
        for pol, port, key in [('pp', 'reflection', 'r_pp'),
                               ('ss', 'reflection', 'r_ss'),
                               ('pp', 'transmission', 't_pp'),
                               ('ss', 'transmission', 't_ss')]:
            ours = complex(sim.S_parameters(orders=[0, 0], direction='forward',
                                            port=port, polarization=pol,
                                            ref_order=[0, 0])[0])
            assert np.allclose(ours, g[key][i], atol=2e-4), (i, key)
