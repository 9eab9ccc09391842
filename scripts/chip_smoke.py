"""The per-round chip gate (`make chip-smoke`): one command that ASSERTS
the class API's on-TPU execution, then the reduced-scale example suite.

Folds scripts/tpu_class_smoke.py (pair-output class path: forward,
gradient, fields — CPU-vs-TPU tolerances asserted) and
scripts/examples_chip_smoke.py (all 8 examples at reduced scale;
Example0 asserts its Fresnel oracle, Example2 asserts field-envelope
checks) into a single asserting entry point.  VERDICT r4 weak #5: the
pair-output class path on chip was previously covered only by manually
remembered smoke scripts.

Run via the fail-loud logger so a dead run cannot leave a pass-looking
log:   make chip-smoke
Requires the TPU tunnel; exits nonzero on any failure.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, script, args=()):
    print(f'=== chip-smoke stage: {name} ===', flush=True)
    proc = subprocess.run(
        [sys.executable, '-u', os.path.join(ROOT, 'scripts', script),
         *args], cwd=ROOT)
    if proc.returncode != 0:
        print(f'chip-smoke: stage {name} FAILED (rc={proc.returncode})',
              flush=True)
        sys.exit(1)


def main():
    run('class-api (pair output, fwd/grad/fields, CPU-vs-TPU tolerances)',
        'tpu_class_smoke.py')
    run('examples (reduced scale, oracles asserted)',
        'examples_chip_smoke.py')
    print('CHIP SMOKE PASS', flush=True)


if __name__ == '__main__':
    main()
