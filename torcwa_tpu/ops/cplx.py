"""Split-real complex linear algebra: complex matrices as (re, im) float pairs.

TPUs have no complex ALU — XLA decomposes complex math into real ops — and
the TPU runtime here does not reliably lower complex64 at all (loop carries,
scatter, even transfers).  This module makes the decomposition explicit so
the whole RCWA solve runs on plain float32/float64 tensors: every matmul is
a real MXU matmul, every solve a real LU.

A "cpair" is a tuple (re, im) of equal-shape real arrays.  Supported leading
batch dims pass straight through.
"""

import jax
import jax.numpy as jnp

__all__ = [
    'split', 'fuse', 'cadd', 'csub', 'cneg', 'conj', 'cmul', 'cdivide',
    'cdiv_raw', 'cmm', 'conjT', 'cexp_i', 'csolve', 'cinv', 'cabs', 'cabs2',
    'csqrt', 'csin', 'ccos', 'cwhere', 'scale_rows', 'scale_cols', 'ceye',
    'czeros', 'to_pair',
]


def split(z):
    z = jnp.asarray(z)
    return jnp.real(z), jnp.imag(z)


def fuse(c):
    return c[0] + 1j * c[1]


def cadd(a, b):
    return a[0] + b[0], a[1] + b[1]


def csub(a, b):
    return a[0] - b[0], a[1] - b[1]


def cneg(a):
    return -a[0], -a[1]


def conj(a):
    return a[0], -a[1]


def cmul(a, b):
    """Elementwise complex product."""
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def cdivide(a, b):
    """Elementwise complex division with a zero-denominator guard (0/0 -> 0).

    Use only where the guard is intentional (e.g. the csqrt JVP's removable
    singularity); for physics paths where division by zero must SURFACE as
    inf/nan — Wood anomalies, kz == 0 — use :func:`cdiv_raw`, matching the
    reference's behavior (rcwa.py:1145-1147 produces inf there and the
    downstream isinf/isnan scrubbing handles it explicitly)."""
    d = b[0] * b[0] + b[1] * b[1]
    d = jnp.where(d > 0, d, 1.)
    return ((a[0] * b[0] + a[1] * b[1]) / d,
            (a[1] * b[0] - a[0] * b[1]) / d)


def cdiv_raw(a, b):
    """Elementwise complex division, unguarded: b == 0 yields inf/nan so
    singular points (Wood anomalies) surface exactly as in the reference."""
    d = b[0] * b[0] + b[1] * b[1]
    return ((a[0] * b[0] + a[1] * b[1]) / d,
            (a[1] * b[0] - a[0] * b[1]) / d)


def cabs2(a):
    return a[0] * a[0] + a[1] * a[1]


def cabs(a):
    return jnp.sqrt(cabs2(a))


def csqrt(a):
    """Principal elementwise complex sqrt (cpair in, cpair out)."""
    return _csqrt(a[0], a[1])


@jax.custom_jvp
def _csqrt(ar, ai):
    r = jnp.sqrt(ar * ar + ai * ai)
    re = jnp.sqrt(jnp.maximum((r + ar) / 2, 0.))
    im = jnp.sqrt(jnp.maximum((r - ar) / 2, 0.))
    return re, jnp.where(ai < 0, -im, im)


@_csqrt.defjvp
def _csqrt_jvp(primals, tangents):
    # d sqrt(z) = dz / (2 sqrt(z)).  The half-angle forward formula hits
    # sqrt'(0) = inf whenever the input is exactly real (im == 0, routine at
    # float32), so the derivative is supplied analytically; cdivide's
    # zero-denominator guard maps the non-differentiable point z = 0 to 0
    # instead of nan.
    ar, ai = primals
    dar, dai = tangents
    w = _csqrt(ar, ai)
    dw = cdivide((dar, dai), (2 * w[0], 2 * w[1]))
    return w, dw


def csin(a):
    """Elementwise complex sine: sin(x+iy) = sin x cosh y + i cos x sinh y."""
    return (jnp.sin(a[0]) * jnp.cosh(a[1]), jnp.cos(a[0]) * jnp.sinh(a[1]))


def ccos(a):
    """Elementwise complex cosine: cos(x+iy) = cos x cosh y - i sin x sinh y."""
    return (jnp.cos(a[0]) * jnp.cosh(a[1]), -jnp.sin(a[0]) * jnp.sinh(a[1]))


def cwhere(mask, a, b):
    """jnp.where over both components of two cpairs."""
    return jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1])


def to_pair(x, rdtype=None):
    """Coerce x (cpair | complex/real scalar | numpy/jax array) to a cpair.

    Complex numpy/python inputs are split on host; complex jax arrays are
    split with jnp.real/imag (CPU-only — the TPU runtime cannot hold complex
    arrays, so on TPU callers pass real arrays or pairs)."""
    import numpy as np
    if isinstance(x, tuple) and len(x) == 2:
        re = jnp.asarray(x[0], rdtype)
        im = jnp.asarray(x[1], rdtype)
        return re, jnp.broadcast_to(im, re.shape) if im.shape != re.shape else im
    if isinstance(x, jnp.ndarray):
        if jnp.iscomplexobj(x):
            re, im = jnp.real(x), jnp.imag(x)
        else:
            re, im = x, jnp.zeros_like(x)
        if rdtype is not None:
            re, im = re.astype(rdtype), im.astype(rdtype)
        return re, im
    arr = np.asarray(x)
    if np.iscomplexobj(arr):
        return (jnp.asarray(arr.real, rdtype), jnp.asarray(arr.imag, rdtype))
    re = jnp.asarray(arr, rdtype)
    return re, jnp.zeros_like(re)


def cmm(a, b):
    """Complex matmul via 4 real matmuls (batched '@' semantics)."""
    return (a[0] @ b[0] - a[1] @ b[1],
            a[0] @ b[1] + a[1] @ b[0])


def conjT(a):
    return (jnp.swapaxes(a[0], -2, -1), -jnp.swapaxes(a[1], -2, -1))


def cexp_i(theta_pair):
    """exp(1j * z) for a cpair z = x + iy: e^{-y} (cos x, sin x)."""
    x, y = theta_pair
    m = jnp.exp(-y)
    return m * jnp.cos(x), m * jnp.sin(x)


def scale_rows(s, a):
    """diag(s) @ A for a cpair vector s and cpair matrix A."""
    return (s[0][..., :, None] * a[0] - s[1][..., :, None] * a[1],
            s[0][..., :, None] * a[1] + s[1][..., :, None] * a[0])


def scale_cols(a, s):
    """A @ diag(s)."""
    return (a[0] * s[0][..., None, :] - a[1] * s[1][..., None, :],
            a[1] * s[0][..., None, :] + a[0] * s[1][..., None, :])


def ceye(n, rdtype=jnp.float32):
    return jnp.eye(n, dtype=rdtype), jnp.zeros((n, n), rdtype)


def czeros(shape, rdtype=jnp.float32):
    return jnp.zeros(shape, rdtype), jnp.zeros(shape, rdtype)


# Above this augmented size, a vmap-batched LU panel overflows XLA's
# scoped VMEM on the v5e (observed: batch-2 f32[2,6724,128] LU panel
# needs 17 MB vs the 16.25 MB limit) — map sweep lanes sequentially.
_SOLVE_SEQ_MIN_N = 4096

# Below this augmented size csolve uses the stock jnp.linalg.solve path
# (faster at small n); at/above it the LU-as-residual custom VJP avoids
# keeping M alive for the backward's re-factorization.
_LU_RESIDUAL_MIN_N = 2048


@jax.custom_batching.custom_vmap
def _lu_fwd_impl(M, rhs):
    # LU/triangular solves are precision-critical; TPU's default f32
    # matmul runs in bf16 passes (measured residual ~0.25 at n=1024 on
    # a well-conditioned system) — pin full f32 regardless of caller
    with jax.default_matmul_precision('highest'):
        lu, piv = jax.scipy.linalg.lu_factor(M)
        x = jax.scipy.linalg.lu_solve((lu, piv), rhs)
    return x, lu, piv


@_lu_fwd_impl.def_vmap
def _lu_fwd_impl_vmap(axis_size, in_batched, M, rhs):
    if not in_batched[0]:
        M = jnp.broadcast_to(M[None], (axis_size,) + M.shape)
    if not in_batched[1]:
        rhs = jnp.broadcast_to(rhs[None], (axis_size,) + rhs.shape)
    if M.shape[-1] >= _SOLVE_SEQ_MIN_N:
        out = jax.lax.map(lambda p: _lu_fwd_impl(p[0], p[1]), (M, rhs))
    else:
        lu, piv = jax.scipy.linalg.lu_factor(M)
        out = (jax.scipy.linalg.lu_solve((lu, piv), rhs), lu, piv)
    return out, (True, True, True)


@jax.custom_batching.custom_vmap
def _lu_trans_impl(lu, piv, g):
    with jax.default_matmul_precision('highest'):
        return jax.scipy.linalg.lu_solve((lu, piv), g, trans=1)


@_lu_trans_impl.def_vmap
def _lu_trans_impl_vmap(axis_size, in_batched, lu, piv, g):
    args = [lu, piv, g]
    for i, a in enumerate(args):
        if not in_batched[i]:
            args[i] = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
    lu, piv, g = args
    if lu.shape[-1] >= _SOLVE_SEQ_MIN_N:
        out = jax.lax.map(lambda p: _lu_trans_impl(*p), (lu, piv, g))
    else:
        out = jax.scipy.linalg.lu_solve((lu, piv), g, trans=1)
    return out, True


# custom_vmap does not support reverse-mode autodiff, so the VJP of the
# solve is written out (standard: X = M^-1 R, gR = M^-T g, gM = -gR X^T).
# The forward's LU factors are the stored residual and the backward
# reuses them with trans=1 — no M copy kept alive, no re-factorization
# (at order 25 each avoided 10404^2 temporary is 417 MB).
@jax.custom_vjp
def _lu_solve(M, rhs):
    x, _, _ = _lu_fwd_impl(M, rhs)
    return x


def _lu_solve_fwd(M, rhs):
    x, lu, piv = _lu_fwd_impl(M, rhs)
    return x, (lu, piv, x)


def _lu_solve_bwd(res, g):
    lu, piv, x = res
    grhs = _lu_trans_impl(lu, piv, g)
    gM = -grhs @ jnp.swapaxes(x, -1, -2)
    return gM, grhs


_lu_solve.defvjp(_lu_solve_fwd, _lu_solve_bwd)


def csolve(a, b):
    """Solve (Ar + iAi) X = (Br + iBi) via the real augmented system
    [[Ar, -Ai], [Ai, Ar]] [Xr; Xi] = [Br; Bi]  (one real LU, same flop count
    as a complex LU, lowers everywhere on TPU).  Under vmap, large systems
    solve lane-by-lane (lax.map) so the LU's scoped-VMEM panel stays
    single-lane.

    Large augmented systems go through the LU-as-residual custom VJP
    (each avoided re-factorization temporary is 417 MB at order 25);
    small ones keep the stock ``jnp.linalg.solve`` whose XLA program
    measured faster at order-6 bench scale (the custom path's extra
    dispatch structure costs more than the re-factorization saves)."""
    ar, ai = a
    br, bi = b
    M = jnp.concatenate([
        jnp.concatenate([ar, -ai], axis=-1),
        jnp.concatenate([ai, ar], axis=-1),
    ], axis=-2)
    rhs = jnp.concatenate([br, bi], axis=-2)
    if M.shape[-1] >= _LU_RESIDUAL_MIN_N:
        x = _lu_solve(M, rhs)
    else:
        with jax.default_matmul_precision('highest'):
            x = jnp.linalg.solve(M, rhs)
    n = ar.shape[-2]
    return x[..., :n, :], x[..., n:, :]


def cinv(a):
    n = a[0].shape[-1]
    eye = jnp.eye(n, dtype=a[0].dtype)
    eye = jnp.broadcast_to(eye, a[0].shape)
    return csolve(a, (eye, jnp.zeros_like(eye)))


def ctrans(a):
    """Non-conjugating transpose of a pair."""
    return jnp.swapaxes(a[0], -1, -2), jnp.swapaxes(a[1], -1, -2)


def crsolve(a, b):
    """Right-solve X = B A^{-1} via X^T = A^{-T} B^T (no conjugation).

    Same augmented-LU machinery as csolve; the three transposes are
    O(n^2) copies against the O(n^3) factorization."""
    return ctrans(csolve(ctrans(a), ctrans(b)))
