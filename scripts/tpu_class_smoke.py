"""Class-API smoke on the real TPU chip: the reference-compatible rcwa
object (torcwa_tpu/solver.py) executing end-to-end on device via the
split-real internals — forward S-params, fields, and a gradient.

Run in background (foreground TPU runs hang via the tool): see verify skill.
Prints CPU-vs-TPU forward deltas and grad norms; exits nonzero on failure.
"""

import subprocess
import sys
import time

import numpy as np

CHECK = r'''
import time
import numpy as np
import jax
import jax.numpy as jnp
PLATFORM = "%s"
if PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
import torcwa_tpu as tt

print("backend:", jax.default_backend(), flush=True)

L = [300., 300.]

def build(R):
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=256, ny=256, edge_sharpness=500.,
                    dtype=jnp.float32)
    geom = g.circle(R, L[0] / 2., L[1] / 2.)
    # lossy a-Si-like eps as an explicit (re, im) pair (TPU holds no complex)
    eps = (geom * 4.767 + (1. - geom), geom * 0.598)
    sim = tt.rcwa(freq=1 / 473., order=[3, 3], L=L, dtype=jnp.complex64,
                  output="pair")
    sim.add_input_layer(eps=1.46 ** 2)
    sim.set_incident_angle(inc_ang=0.05, azi_ang=0.1)
    sim.add_layer(thickness=400., eps=eps)
    sim.solve_global_smatrix()
    return sim

def T_of_R(R):
    sim = build(R)
    tr, ti = sim.S_parameters(orders=[0, 0], direction="forward",
                              port="transmission", polarization="xx",
                              ref_order=[0, 0])
    return (tr ** 2 + ti ** 2)[0]

t0 = time.time()
T = float(T_of_R(95.))
print(f"T forward: {T:.6f}  ({time.time()-t0:.1f}s)", flush=True)

t0 = time.time()
gr = float(jax.grad(T_of_R)(95.))
print(f"dT/dR: {gr:.6e}  ({time.time()-t0:.1f}s)", flush=True)

# field reconstruction through the pair engine
sim = build(95.)
sim.source_planewave(amplitude=[1., 0.], direction="forward")
x = np.linspace(0., L[0], 8)
z = np.linspace(-100., 500., 7)
E, H = sim.field_xz(x, z, L[1] / 2)
exr, exi = E[0]
mag = float(jnp.max(jnp.sqrt(exr ** 2 + exi ** 2)))
print(f"max|Ex| on xz: {mag:.4f}", flush=True)
assert np.isfinite(T) and np.isfinite(gr) and np.isfinite(mag)
print("RESULT", T, gr, mag, flush=True)
'''


def run(platform):
    out = subprocess.run([sys.executable, '-u', '-c', CHECK % platform],
                         capture_output=True, text=True, timeout=1200)
    sys.stdout.write(out.stdout)
    sys.stderr.write(out.stderr[-2000:] if out.returncode else '')
    if out.returncode:
        sys.exit(f'{platform} run failed rc={out.returncode}')
    line = [l for l in out.stdout.splitlines() if l.startswith('RESULT')][0]
    return [float(v) for v in line.split()[1:]]


if __name__ == '__main__':
    print('=== CPU reference ===', flush=True)
    cpu = run('cpu')
    print('=== TPU ===', flush=True)
    tpu = run('tpu')
    dT = abs(cpu[0] - tpu[0])
    dg = abs(cpu[1] - tpu[1]) / max(abs(cpu[1]), 1e-12)
    dm = abs(cpu[2] - tpu[2]) / max(abs(cpu[2]), 1e-12)
    print(f'deltas: |dT|={dT:.2e}  rel dgrad={dg:.2e}  rel dfield={dm:.2e}')
    assert dT < 1e-3, dT
    assert dg < 0.1, dg
    assert dm < 1e-2, dm
    print('CLASS-API TPU SMOKE PASS')
