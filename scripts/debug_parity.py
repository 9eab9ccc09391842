"""Step-by-step parity debug between torcwa_tpu and the torch reference."""
import os
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
import sys
sys.path.insert(0, '/root/reference')
import numpy as np
import torch
import torcwa  # reference
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import torcwa_tpu as tt
from torcwa_tpu import core
from torcwa_tpu.core import bd_dense

L = [300., 300.]
lamb0 = 400.
order = [2, 2]
si = 4.767 + 0.598j  # arbitrary lossy eps for the test
eps0 = 1.46 ** 2

# shared geometry grid (numpy)
gnp = np.load(os.path.join(os.path.dirname(__file__), '..', 'tests', 'golden',
                           'example1.npz'))['geom']
eps_grid_np = gnp * si + (1. - gnp)

# ---- reference ----
simr = torcwa.rcwa(freq=1 / lamb0, order=order, L=L, dtype=torch.complex64,
                   device=torch.device('cpu'))
simr.add_input_layer(eps=eps0)
simr.set_incident_angle(inc_ang=0., azi_ang=0.)
simr.add_layer(thickness=300., eps=torch.tensor(eps_grid_np, dtype=torch.complex64))
simr.solve_global_smatrix()

# ---- ours ----
sim = tt.rcwa(freq=1 / lamb0, order=order, L=L, dtype=jnp.complex64)
sim.add_input_layer(eps=eps0)
sim.set_incident_angle(inc_ang=0., azi_ang=0.)
sim.add_layer(thickness=300., eps=jnp.asarray(eps_grid_np, jnp.complex64))
sim.solve_global_smatrix()


def cmp(name, a, b, tol=1e-4):
    a = np.asarray(a)
    b = b.detach().numpy() if isinstance(b, torch.Tensor) else np.asarray(b)
    scale = max(np.abs(b).max(), 1e-30)
    err = np.abs(a - b).max() / scale
    print(f'{name:24s} relerr {err:.2e}  shape {a.shape} vs {b.shape}'
          + ('   <<<< MISMATCH' if err > tol else ''))
    return err


cmp('Kx_norm_dn', sim.Kx_norm_dn, simr.Kx_norm_dn)
cmp('Vf', bd_dense(sim.Vf), simr.Vf)
cmp('Sin11', bd_dense(sim.Sin[0]), simr.Sin[0])
cmp('Sin21', bd_dense(sim.Sin[1]), simr.Sin[1])
cmp('eps_conv', sim.eps_conv[0], simr.eps_conv[0])

# P, Q
P, Q = core.pq_matrices(sim.eps_conv[0], sim.mu_conv[0],
                        sim.Kx_norm_dn, sim.Ky_norm_dn)
cmp('P', P, simr.P[0])
cmp('Q', Q, simr.Q[0])

# eig: compare sorted kz
kz_ours = np.sort_complex(np.asarray(sim.layers[0].kz))
kz_ref = np.sort_complex(simr.kz_norm[0].numpy())
cmp('kz sorted', kz_ours, kz_ref, tol=1e-3)

cmp('layer S11', sim.layers[0].S11, simr.layer_S11[0], tol=1e-3)
cmp('layer S21', sim.layers[0].S21, simr.layer_S21[0], tol=1e-3)
cmp('layer S12(=S21)', sim.layers[0].S21, simr.layer_S12[0], tol=1e-3)
cmp('layer S22(=S11)', sim.layers[0].S11, simr.layer_S22[0], tol=1e-3)

cmp('global S11', sim.S[0], simr.S[0], tol=1e-3)
cmp('global S21', sim.S[1], simr.S[1], tol=1e-3)
cmp('Cf0', np.concatenate([np.asarray(sim.C[0][0])], axis=0),
    torch.cat([simr.C[0][0]], dim=0), tol=1e-3)
