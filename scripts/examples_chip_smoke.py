"""CI-style chip smoke: run every example at reduced scale on the TPU.

Each example runs in a fresh subprocess (one chip client at a time, and
module-level state must not leak between examples).  Reduced-iteration
env knobs keep the whole pass under ~5 minutes; the full-scale parity
artifacts live in bench_logs/.  A run FAILS if any example exits
nonzero or prints a non-finite FoM/value marker.

Usage: python scripts/examples_chip_smoke.py [pattern]
"""
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (script, env overrides, timeout_s)
# Timeouts are sized for a CONTENDED tunnel: the r5 smoke that ran
# while another chip client was active saw uniform 3-5x slowdowns and
# example2 blew a 900 s cap it normally clears in ~300 s.  The caps
# exist to catch hangs, not to race the tunnel scheduler.
RUNS = [
    ('example0_fresnel.py', {}, 1500),
    ('example1_wavelength_sweep.py', {}, 1500),
    ('example1_1_multilayer.py', {'EX11_ORDERS': '0,3'}, 2400),
    ('example2_fields.py', {}, 2400),
    ('example3_parameter_sweep.py', {'EX3_ORDER': '8', 'EX3_NW': '2'}, 2400),
    ('example4_gradient_check.py', {}, 1500),   # CPU f64 by design
    ('example5_shape_optimization.py',
     {'EX5_ITERS': '3', 'EX5_CKPT': '/tmp/ex5_smoke.npz'}, 2400),
    ('example6_topology_optimization.py',
     {'EX6_ITERS': '3', 'EX6_CKPT': '/tmp/ex6_smoke.npz'}, 2400),
]

_BAD = re.compile(r'\bnan\b|\binf\b', re.IGNORECASE)


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 else ''
    failures = []
    for script, env, tmo in RUNS:
        if pattern and pattern not in script:
            continue
        for p in ('/tmp/ex5_smoke.npz', '/tmp/ex6_smoke.npz'):
            if os.path.exists(p):
                os.remove(p)
        run_env = dict(os.environ, **env)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, '-u', os.path.join(ROOT, 'examples',
                                                    script)],
                cwd=ROOT, env=run_env, capture_output=True, text=True,
                timeout=tmo)
        except subprocess.TimeoutExpired:
            print(f'FAIL {script}: timeout after {tmo}s', flush=True)
            failures.append(script)
            continue
        dt = time.time() - t0
        tail = '\n'.join(proc.stdout.strip().splitlines()[-3:])
        bad_num = _BAD.search(tail) is not None
        if proc.returncode != 0 or bad_num:
            print(f'FAIL {script} (rc={proc.returncode}, {dt:.0f}s)',
                  flush=True)
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            failures.append(script)
        else:
            print(f'OK   {script} ({dt:.0f}s): {tail.splitlines()[-1]}',
                  flush=True)
    print('FAILURES:', failures if failures else 'none', flush=True)
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
