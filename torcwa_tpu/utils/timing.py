"""Per-stage timing breakdown for the solve pipeline.

The reference's only instrumentation is ad-hoc ``time.time()`` prints in
notebooks (e.g. Example3 cell 1).  ``StageTimer`` blocks on device
completion per stage so the numbers mean device time, and prints a
conv-matrix / eig / smatrix / fold style breakdown — the tuning loop for
the Pallas kernels.  For deeper traces use ``jax.profiler`` directly.
"""

import time
from contextlib import contextmanager

import jax

__all__ = ['StageTimer', 'eig_stage_flops', 'measured_gemm_peak', 'mfu_report']


# --- FLOP model for the eig pipeline (the solve's cost driver) -------------
#
# Convention: one complex multiply-add = 8 real flops (4 mul + 4 add; the
# split-real kernels execute exactly that).  Counts are the standard dense
# nominal models (LAPACK working notes / Golub-Van Loan), NOT the kernels'
# actual op counts — MFU reported against them answers "how far from a
# speed-of-light dense method", which is the honest yardstick when the
# algorithm itself adapts (AED deflation, nibble skips change actual work).
#
#   hess : zgehrd (10/3 n^3) + Q formation zunghr (4/3 n^3)
#   qr   : Hessenberg Schur QR with Schur-vector accumulation; nominal
#          ~10 n^3 complex madds (zhseqr with Z, LAWN 41 class estimate)
#   vec  : triangular eigenvector back-substitution (~n^3/6) + the
#          Z @ Y basis GEMM (n^3)
_CMADD = 8.0


def eig_stage_flops(n):
    """Nominal real-FLOP counts per eig stage for one n x n complex
    matrix (see module comment for the models)."""
    n3 = float(n) ** 3
    return {
        'hess': (10. / 3. + 4. / 3.) * n3 * _CMADD,
        'qr': 10. * n3 * _CMADD,
        'vec': (1. / 6. + 1.) * n3 * _CMADD,
    }


def measured_gemm_peak(n, reps=3, rdtype=None):
    """Measured split-real complex-GEMM throughput (real TFLOP/s) at size
    n on the default backend — the calibration denominator for MFU
    lines.  Uses highest matmul precision (the eig kernels' setting), so
    'peak' means what a GEMM-only algorithm could actually reach here,
    not the bf16 datasheet number.
    """
    import numpy as np
    import jax.numpy as jnp
    from jax import lax
    rdtype = rdtype or jnp.float32
    rng = np.random.default_rng(0)
    mats = [jnp.asarray(rng.standard_normal((n, n)), rdtype)
            for _ in range(4)]
    # amortize inside ONE program: per-dispatch overhead on this runtime
    # (~27 ms) would otherwise dominate and understate the peak 2-4x
    k = min(8192, max(4, int(2e12 / (_CMADD * float(n) ** 3))))

    @jax.jit
    def cgemm_k(ar, ai, br, bi):
        with jax.default_matmul_precision('highest'):
            def body(_, c):
                cr, ci = c
                cr2 = ar @ cr - ai @ ci
                ci2 = ar @ ci + ai @ cr
                return (cr2 / jnp.float32(n), ci2 / jnp.float32(n))
            return lax.fori_loop(0, k, body, (br, bi))

    out = cgemm_k(*mats)
    float(out[0].sum() + out[1].sum())          # compile + barrier
    best = float('inf')
    for r in range(reps):
        # perturbed inputs defeat the tunnel result cache; a materialized
        # checksum is the only reliable device barrier on this runtime
        args = [m * (1. + 1e-6 * (r + 1)) for m in mats]
        t0 = time.perf_counter()
        out = cgemm_k(*args)
        float(out[0].sum() + out[1].sum())
        best = min(best, time.perf_counter() - t0)
    flops = _CMADD * float(n) ** 3 * k           # k complex GEMMs
    return flops / best / 1e12


def mfu_report(stage_times, n, gemm_peak_tflops):
    """Lines of 'stage: time, model TFLOP/s achieved, % of measured GEMM
    peak' for stages present in both stage_times and the flop model."""
    model = eig_stage_flops(n)
    lines = []
    for name, secs in stage_times.items():
        if name not in model or secs <= 0:
            continue
        tf = model[name] / secs / 1e12
        pct = 100. * tf / gemm_peak_tflops if gemm_peak_tflops else 0.
        lines.append(f'{name:5s} {secs:7.3f}s  {tf:6.2f} TFLOP/s '
                     f'(nominal)  {pct:5.1f}% of measured GEMM peak '
                     f'({gemm_peak_tflops:.1f})')
    return lines


class StageTimer:
    """Accumulates wall-clock per named stage, device-synchronized.

    Usage:
        t = StageTimer()
        with t('conv'):
            conv = build_conv(...)
        with t('eig'):
            w, v = eig(...)
        print(t.report())
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextmanager
    def __call__(self, name):
        """Context manager; the caller must block on the stage's outputs
        inside the block (or use :meth:`wrap`), since independent device
        buffers are not ordered."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def wrap(self, name, fn):
        """Timed wrapper: blocks on fn's outputs before stopping the
        clock, so the measurement is device time."""
        def timed(*args, **kwargs):
            with self(name):
                out = fn(*args, **kwargs)
                jax.block_until_ready(out)
            return out
        return timed

    def report(self):
        total = sum(self.totals.values()) or 1.0
        lines = ['stage              total_s   calls   share']
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f'{name:18s} {t:7.3f}  {self.counts[name]:6d}'
                         f'  {100 * t / total:5.1f}%')
        return '\n'.join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
