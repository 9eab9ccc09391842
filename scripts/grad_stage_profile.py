"""Per-stage forward AND backward timing of the large-order fwd+grad solve.

VERDICT r4 / NOTES lever 1: the backward pass + S-matrix tail of the
order-20/25 bench solve (bench.py ORDER >= 15 branch) had never been
stage-profiled on chip — only the forward eig stages were.  This script
splits the solve into four chained stages

    conv : eps raster -> Toeplitz conv pair            (fourier matmuls)
    A    : conv -> A = P @ Q                            (cinv + GEMMs)
    eig  : A -> (w, V)                                  (custom-VJP kernels)
    tail : (conv, w, V) -> T = |t_xx(0,0)|^2            (solves + fold + sparam)

and times each stage's forward and its VJP separately, propagating the
TRUE cotangents backward through the chain (jax.vjp per stage).  It also
micro-benchmarks the tail's primitive ops (csolve / crsolve / cinv / cmm
at 2N) fwd and bwd so the tail total can be decomposed on paper.

The stage split mirrors fmm._solve_stack_pair_impl for the bench config
(1 patterned layer, input cladding, no modes) and is validated against
the production solve_stack_pair path: |T_chain - T_prod| and a cosine
check of the chained gradient vs jax.grad of the production loss.

Reference for the workload shape: /root/reference/example/Example1.ipynb
(the solve behind rcwa.py:1224-1306).

Usage:  BENCH_ORDER=20 python scripts/grad_stage_profile.py
        (run through scripts/benchlog.py for a committed artifact)
"""

import json
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import time

import numpy as np
import jax
import jax.numpy as jnp

import torcwa_tpu as tt
from torcwa_tpu._constants import PI_REF
from torcwa_tpu.fmm import (StackSpec, solve_stack_pair, sparam_xy_pair,
                            dft_conv_pair, pq_pair, kvectors_real,
                            _kz_pair, vmat_pair, interface_in_pair,
                            _layer_smatrix_tail_nomodes, redheffer_pair)
from torcwa_tpu.core import bdp_inv, bdp_dense
from torcwa_tpu.ops import cplx
from torcwa_tpu.ops.eig import eig_pair

ORDER = int(os.environ.get('BENCH_ORDER', '20'))
GRID = int(os.environ.get('BENCH_GRID', '256'))
L = (300., 300.)
W = 160.
THICK = 600.
EPS_HI = 2.0709 ** 2
EPS_SUB = 1.46 ** 2
LAM = 500.0

f32 = jnp.float32
spec = StackSpec(order=(ORDER, ORDER), L=L, n_layers=1, has_input=True)
N = (2 * ORDER + 1) ** 2
n2 = 2 * N
one = (jnp.asarray(1., f32), jnp.asarray(0., f32))
eps_in = (jnp.asarray(EPS_SUB, f32), jnp.asarray(0., f32))
freq = jnp.asarray(1.0 / LAM, f32)
zero = jnp.asarray(0., f32)


def build_eps():
    g = tt.geometry(Lx=L[0], Ly=L[1], nx=GRID, ny=GRID, edge_sharpness=500.,
                    dtype=f32)
    geom = g.rectangle(W, W, L[0] / 2., L[1] / 2.)
    return jnp.asarray(geom * EPS_HI + (1. - geom), f32)


def kxky(freq):
    return kvectors_real(freq, zero, zero, jnp.asarray(1.46, f32),
                         spec.order, spec.L, f32)


# --------------------------- stage functions -------------------------------

def f_conv(eps):
    with jax.default_matmul_precision('highest'):
        return dft_conv_pair((eps, jnp.zeros_like(eps)), spec.order,
                             GRID, GRID)


def f_A(cr, ci, freq):
    with jax.default_matmul_precision('highest'):
        kx, ky = kxky(freq)
        P, Q = pq_pair((cr, ci), kx, ky)
        A = cplx.cmm(P, Q)
        return A[0], A[1]


def f_eig(Ar, Ai):
    with jax.default_matmul_precision('highest'):
        return eig_pair(Ar, Ai, 'auto', 'qr')


def f_tail(cr, ci, wr, wi, vr, vi, freq):
    """conv + eig outputs -> T; mirrors _solve_stack_pair_impl for the
    bench stack (fmm.py:510-754, need_modes=False) + sparam_xy_pair."""
    with jax.default_matmul_precision('highest'):
        omega = 2 * PI_REF * freq
        kx, ky = kxky(freq)
        kz_f = _kz_pair(one, kx, ky)
        Vf = vmat_pair(kx, ky, kz_f)
        Vf_inv = bdp_inv(Vf)
        P, _ = pq_pair((cr, ci), kx, ky)
        kz = cplx.csqrt((wr, wi))
        flip = kz[1] < 0
        kz = (jnp.where(flip, -kz[0], kz[0]), jnp.where(flip, -kz[1], kz[1]))
        E = (vr, vi)
        S11, S21, _H, _ = _layer_smatrix_tail_nomodes(
            P, E, kz, Vf_inv, omega, jnp.asarray(THICK, f32))
        S = [S11, S21, S21, S11]
        kz_i = _kz_pair(eps_in, kx, ky)
        Vi = vmat_pair(kx, ky, kz_i)
        Sin = [bdp_dense(b) for b in interface_in_pair(Vf, Vi)]
        S_new, _, _ = redheffer_pair(Sin, S)
        tr, ti = sparam_xy_pair(S_new, kx, ky, eps_in, one, spec.order,
                                [0, 0], [0, 0], 'xx')
        return (tr ** 2 + ti ** 2)[0]


def point_T(eps, freq):
    """The production bench loss (bench.py point_T)."""
    S, intr = solve_stack_pair(
        spec, freq, zero, zero, (eps[None], jnp.zeros_like(eps)[None]),
        jnp.asarray([THICK], f32), eps_in=eps_in, eig_backend='qr')
    tr, ti = sparam_xy_pair(S, intr['kx'], intr['ky'], eps_in, one,
                            spec.order, [0, 0], [0, 0], 'xx')
    return (tr ** 2 + ti ** 2)[0]


# ------------------------------ timing -------------------------------------

def timed(fn, args, reps=3, min_reps_big=None):
    """Compile, barrier via materialized checksum, best-of-reps with
    perturbed inputs (the tunnel caches identical-input results)."""
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), out)
    best = np.inf
    for r in range(reps):
        pert = jax.tree.map(lambda a: a * (1. + 1e-6 * (r + 1)), args)
        t0 = time.perf_counter()
        res = fn(*pert)
        jax.tree.map(lambda x: float(jnp.sum(jnp.abs(x))), res)
        best = min(best, time.perf_counter() - t0)
    return best, out


def vjp_fn(f):
    """jitted (args, cts) -> input cotangents; runtime includes the
    forward re-run (subtract the stage's fwd time for the bwd cost)."""
    @jax.jit
    def g(args, cts):
        _, pull = jax.vjp(f, *args)
        return pull(cts)
    return g


def main():
    eps = build_eps()
    print(f'# grad stage profile: order={ORDER} N={N} 2N={n2} '
          f'backend={jax.default_backend()}', flush=True)

    reps = 3 if ORDER < 24 else 2

    # ---- forward chain (values reused as stage inputs) --------------------
    t = {}
    t['fwd_conv'], (cr, ci) = timed(jax.jit(f_conv), (eps,), reps)
    t['fwd_A'], (Ar, Ai) = timed(jax.jit(f_A), (cr, ci, freq), reps)
    t['fwd_eig'], (wr, wi, vr, vi) = timed(jax.jit(f_eig), (Ar, Ai), reps)
    t['fwd_tail'], T_chain = timed(jax.jit(f_tail),
                                   (cr, ci, wr, wi, vr, vi, freq), reps)

    # ---- production fwd + fwd+grad (the headline) --------------------------
    t['prod_fwd'], T_prod = timed(jax.jit(point_T), (eps, freq), reps)
    vg = jax.jit(jax.value_and_grad(point_T))
    # second warmup: first post-compile Pallas dispatch one-time cost
    v0, g0 = vg(eps * 1.0012, freq)
    float(jnp.sum(g0))
    t['prod_fwdgrad'], (v1, g1) = timed(vg, (eps, freq), reps)

    rel = abs(float(T_chain) - float(T_prod)) / max(abs(float(T_prod)), 1e-30)
    print(f'# T chain={float(T_chain):.6f} prod={float(T_prod):.6f} '
          f'rel={rel:.2e}', flush=True)

    # ---- backward per stage (true cotangents, chained) --------------------
    ct_T = jnp.asarray(1., f32)
    b_tail = vjp_fn(f_tail)
    t['fb_tail'], cts_tail = timed(
        b_tail, ((cr, ci, wr, wi, vr, vi, freq), ct_T), reps)
    dcr_t, dci_t, dwr, dwi, dvr, dvi, _ = cts_tail

    b_eig = vjp_fn(f_eig)
    t['fb_eig'], cts_eig = timed(
        b_eig, ((Ar, Ai), (dwr, dwi, dvr, dvi)), reps)
    dAr, dAi = cts_eig

    b_A = vjp_fn(f_A)
    t['fb_A'], cts_A = timed(b_A, ((cr, ci, freq), (dAr, dAi)), reps)
    dcr_a, dci_a, _ = cts_A

    b_conv = vjp_fn(f_conv)
    t['fb_conv'], (deps,) = timed(
        b_conv, ((eps,), (dcr_t + dcr_a, dci_t + dci_a)), reps)

    # chained-grad sanity vs the production gradient
    gc = deps
    cos = float(jnp.sum(gc * g1) /
                (jnp.linalg.norm(gc) * jnp.linalg.norm(g1) + 1e-30))
    print(f'# grad cosine chain-vs-prod: {cos:.6f}', flush=True)

    # finite-difference arbiter: at a degenerate (normal-incidence,
    # symmetric-cell) config the broadened eig VJP is basis-sensitive, so
    # chain and production can both be plausible yet disagree — a central
    # difference along a fixed random direction says which (if either)
    # matches the true directional derivative of the f32 forward.
    if os.environ.get('PROFILE_FD', '1') == '1':
        rng_fd = np.random.default_rng(7)
        d = jnp.asarray(rng_fd.standard_normal(g1.shape), f32)
        d = d / jnp.linalg.norm(d)
        fT = jax.jit(point_T)
        for h in (3e-3, 1e-2):
            tp = float(fT(eps + h * d, freq))
            tm = float(fT(eps - h * d, freq))
            fd = (tp - tm) / (2 * h)
            print(f'# FD h={h:g}: dT/dd={fd:+.6e}  '
                  f'<g_prod,d>={float(jnp.sum(g1 * d)):+.6e}  '
                  f'<g_chain,d>={float(jnp.sum(gc * d)):+.6e}', flush=True)

    bwd = {k.replace('fb_', 'bwd_'): max(t[k] - t['fwd_' + k[3:]], 0.)
           for k in ('fb_conv', 'fb_A', 'fb_eig', 'fb_tail')}
    fwd_sum = sum(t[k] for k in t if k.startswith('fwd_'))
    bwd_sum = sum(bwd.values())
    print('# ---- stage table (s, best of {}) ----'.format(reps), flush=True)
    for k in ('conv', 'A', 'eig', 'tail'):
        print(f'#   {k:5s} fwd {t["fwd_" + k]:7.3f}   bwd '
              f'{bwd["bwd_" + k]:7.3f}   (fwd+bwd rerun '
              f'{t["fb_" + k]:7.3f})', flush=True)
    print(f'#   sum   fwd {fwd_sum:7.3f}   bwd {bwd_sum:7.3f}   '
          f'chain total {fwd_sum + bwd_sum:7.3f}', flush=True)
    print(f'#   production fwd {t["prod_fwd"]:7.3f}   fwd+grad '
          f'{t["prod_fwdgrad"]:7.3f}', flush=True)

    # ---- tail primitive micro-bench at 2N ---------------------------------
    rng = np.random.default_rng(0)
    M = (jnp.asarray(rng.standard_normal((n2, n2)), f32) +
         jnp.eye(n2, dtype=f32) * n2 / 8.,
         jnp.asarray(rng.standard_normal((n2, n2)), f32))
    B = (jnp.asarray(rng.standard_normal((n2, n2)), f32),
         jnp.asarray(rng.standard_normal((n2, n2)), f32))
    micro = {}

    def hi(f):
        def g(*a):
            with jax.default_matmul_precision('highest'):
                return f(*a)
        return g

    for name, f, args in (
            ('cmm', hi(lambda a, b: cplx.cmm(a, b)), (M, B)),
            ('cinv', hi(lambda a: cplx.cinv(a)), (M,)),
            ('csolve', hi(lambda a, b: cplx.csolve(a, b)), (M, B)),
            ('crsolve', hi(lambda a, b: cplx.crsolve(a, b)), (M, B))):
        micro['fwd_' + name], out = timed(jax.jit(f), args, reps)
        bf = vjp_fn(f)
        ct = jax.tree.map(jnp.ones_like, out)
        micro['fb_' + name], _ = timed(bf, (args, ct), reps)
        micro['bwd_' + name] = max(
            micro['fb_' + name] - micro['fwd_' + name], 0.)
        print(f'#   micro {name:8s} fwd {micro["fwd_" + name]:6.3f}   '
              f'bwd {micro["bwd_" + name]:6.3f}', flush=True)

    # the cosine is diagnostic only: at degenerate configs both gradients
    # carry basis-dependent broadening error (see FD lines); the forward
    # agreement is the correctness gate for the stage split itself
    ok = rel < 1e-3
    print(json.dumps({
        'metric': f'grad_stage_profile_order{ORDER}',
        'value': round(t['prod_fwdgrad'], 4), 'unit': 's/solve',
        'ok': bool(ok),
        'stages': {k: round(v, 4) for k, v in t.items()},
        'bwd': {k: round(v, 4) for k, v in bwd.items()},
        'micro': {k: round(v, 4) for k, v in micro.items()},
    }))
    if not ok:
        sys.exit(1)


if __name__ == '__main__':
    main()
