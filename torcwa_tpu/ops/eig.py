"""Differentiable general (non-Hermitian) complex eigendecomposition.

This replaces the reference's ``Eig(torch.autograd.Function)``
(/root/reference/torcwa/torch_eig.py:8-44): a complex eigendecomposition
whose backward pass is stabilized with Lorentzian broadening,

    F_ij = conj(s_ij) / (|s_ij|^2 + eps),   s_ij = lambda_j - lambda_i,
    F_ii = 0,
    dA   = X^-H (diag(dlambda) + conj(F) o (X^H dX)) X^H,

where ``eps`` is the broadening parameter (``None`` selects the smallest
subnormal of the dtype, mirroring torch_eig.py:28-33).

Layout: the primitive, :func:`eig_pair`, operates on split-real (re, im)
float pairs — the only layout whose loops/scatters lower on this TPU
runtime, and the MXU-native one.  The complex-in/complex-out :func:`eig` is
a thin wrapper.  The custom VJP is registered on the pair primitive so
gradients also stay complex-free on device.

Forward backends
----------------
``'qr'``       TPU-native split-real Hessenberg + shifted-QR +
               back-substitution (``eig_qr_real.py``); on-device, jit/vmap.
``'callback'`` host LAPACK via ``jax.pure_callback`` (pairs cross the
               host boundary; numpy does the complex fuse on host).
``'auto'``     'callback' on CPU, 'qr' elsewhere.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import cplx

__all__ = ['eig', 'eig_pair', 'Eig']

# Smallest positive subnormals, mirroring the reference's fallback
# broadening (torch_eig.py:31-33).
_TINY = {np.dtype(np.float32): 1.4e-45, np.dtype(np.float64): 4.9e-324}

# Dtype-aware default broadening ('auto').  The reference defaults to 1e-10
# (torch_eig.py:9, README.md:67), which is appropriate at float64 but far
# below eigensolver noise at float32: symmetry-degenerate RCWA eigenpairs
# split by ~1e-4..1e-6 in float32, and F ~ 1/(|s|^2 + eps) then amplifies
# eigenvector noise by orders of magnitude (measured: grad norm inflated
# 100x on TPU at 1e-10; converged to the float64 truth at 1e-6).
_AUTO_BROADENING = {np.dtype(np.float32): 1e-6, np.dtype(np.float64): 1e-10}


# ---------------------------------------------------------------------------
# Forward backends
# ---------------------------------------------------------------------------

def _eig_host(ar, ai):
    # Force numpy immediately: the callback may receive jax Arrays, and
    # dispatching jnp ops from the callback thread deadlocks against the
    # main thread's dispatch lock.
    ar = np.asarray(ar)
    ai = np.asarray(ai)
    a = (ar + 1j * ai).astype(np.complex64 if ar.dtype == np.float32
                              else np.complex128)
    w, v = np.linalg.eig(a)
    return (w.real.astype(ar.dtype), w.imag.astype(ar.dtype),
            v.real.astype(ar.dtype), v.imag.astype(ar.dtype))


def _eig_callback_pair(ar, ai):
    shape, dt = ar.shape, ar.dtype
    result_shape = (
        jax.ShapeDtypeStruct(shape[:-1], dt),
        jax.ShapeDtypeStruct(shape[:-1], dt),
        jax.ShapeDtypeStruct(shape, dt),
        jax.ShapeDtypeStruct(shape, dt),
    )
    return jax.pure_callback(_eig_host, result_shape, ar, ai,
                             vmap_method='broadcast_all')


def _resolve_backend(backend):
    if backend in (None, 'auto'):
        return 'callback' if jax.default_backend() == 'cpu' else 'qr'
    return backend


@jax.custom_batching.custom_vmap
def _eig_qr_vmappable(ar, ai):
    from . import eig_qr_real
    return eig_qr_real.eig_qr_real(ar, ai)


@_eig_qr_vmappable.def_vmap
def _eig_qr_vmap_rule(axis_size, in_batched, ar, ai):
    # Collapse the mapped axis into the kernel batch: one Pallas launch
    # iterates all lanes of a VMEM-sized chunk instead of vmap turning the
    # kernel into a sequential grid.
    if not in_batched[0]:
        ar = jnp.broadcast_to(ar[None], (axis_size,) + ar.shape)
    if not in_batched[1]:
        ai = jnp.broadcast_to(ai[None], (axis_size,) + ai.shape)
    from . import eig_qr_real
    out = eig_qr_real.eig_qr_real(ar, ai)
    return out, (True, True, True, True)


def _eig_pair_fwd_impl(ar, ai, backend):
    backend = _resolve_backend(backend)
    if backend == 'callback':
        return _eig_callback_pair(ar, ai)
    elif backend == 'qr':
        return _eig_qr_vmappable(ar, ai)
    elif backend == 'qr_complex':
        # complex-arithmetic twin, CPU-only cross-check oracle
        from . import eig_qr
        w, v = eig_qr.eig_qr(ar + 1j * ai)
        return (jnp.real(w), jnp.imag(w), jnp.real(v), jnp.imag(v))
    else:
        raise ValueError(f'Unknown eig backend: {backend!r}')


# ---------------------------------------------------------------------------
# Custom VJP on the split-real primitive
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def eig_pair(ar, ai, broadening='auto', backend='auto'):
    """Split-real eig: (ar, ai) [..., n, n] -> (wr, wi, vr, vi).

    broadening/backend are static.  Eigenvectors have unit 2-norm up to a
    backend-dependent phase (downstream RCWA math is gauge-invariant).
    """
    return _eig_pair_fwd_impl(ar, ai, backend)


def _eig_pair_fwd(ar, ai, broadening, backend):
    out = _eig_pair_fwd_impl(ar, ai, backend)
    return out, out


def _eig_pair_bwd(broadening, backend, res, cts):
    wr, wi, vr, vi = res
    # Convention note: for a real-valued loss L, the real-pair cotangents
    # (dL/d_re, dL/d_im) read as a complex number are exactly torch's
    # adjoint-convention cotangent (z.grad = dL/d_re + i dL/d_im), so the
    # reference formula (torch_eig.py:19-44) applies to the pairs verbatim
    # — no conjugation adapters.  (JAX's *complex* transpose convention
    # differs by a conj, but jnp.real/imag/complex transposes insert
    # exactly that conj at the pair<->complex boundaries; verified by the
    # lossy-material gradient tests.)
    gw = (cts[0], cts[1])
    gv = (cts[2], cts[3])
    w = (wr, wi)
    v = (vr, vi)

    if broadening is None:
        eps = _TINY[np.dtype(wr.dtype)]
    elif broadening == 'auto':
        eps = _AUTO_BROADENING[np.dtype(wr.dtype)]
    else:
        eps = broadening

    n = wr.shape[-1]
    diag = jnp.eye(n, dtype=bool)
    # s[..., i, j] = w_j - w_i  (torch_eig.py:25)
    sr = wr[..., None, :] - wr[..., :, None]
    si = wi[..., None, :] - wi[..., :, None]
    # mask diagonal before dividing (0/0 guard for broadening == 0)
    sr_safe = jnp.where(diag, 1., sr)
    si_safe = jnp.where(diag, 0., si)
    d = sr_safe ** 2 + si_safe ** 2 + eps
    # conj(F) = s / (|s|^2 + eps), diag zeroed  (torch_eig.py:29,36,38)
    cF = (jnp.where(diag, 0., sr_safe / d), jnp.where(diag, 0., si_safe / d))

    XH = cplx.conjT(v)
    tmp = cplx.cmul(cF, cplx.cmm(XH, gv))
    eye = jnp.eye(n, dtype=wr.dtype)
    inner = (tmp[0] + gw[0][..., :, None] * eye,
             tmp[1] + gw[1][..., :, None] * eye)
    # X^-H (inner) X^H via one augmented-real solve (torch_eig.py:40)
    grad = cplx.csolve(XH, cplx.cmm(inner, XH))
    return (grad[0], grad[1])


eig_pair.defvjp(_eig_pair_fwd, _eig_pair_bwd)


# ---------------------------------------------------------------------------
# Complex-in/out convenience wrapper
# ---------------------------------------------------------------------------

def eig(A, broadening='auto', backend='auto'):
    """Eigendecomposition of a general complex matrix with stabilized VJP.

    Thin complex wrapper over :func:`eig_pair`; autodiff composes through
    the split/fuse isomorphism, so gradients use the broadened pair VJP.
    """
    A = jnp.asarray(A)
    wr, wi, vr, vi = eig_pair(jnp.real(A), jnp.imag(A), broadening, backend)
    return wr + 1j * wi, vr + 1j * vi


class Eig:
    """API-compatibility shim mirroring the reference's ``Eig`` class.

    The reference exposes a mutable class attribute
    ``Eig.broadening_parameter`` (torch_eig.py:9) that example scripts tune
    (e.g. Example4).  Here ``apply`` reads the attribute at call time and
    forwards to the functional :func:`eig`.
    """

    broadening_parameter = 1e-10
    backend = 'auto'

    @staticmethod
    def apply(x):
        return eig(x, Eig.broadening_parameter, Eig.backend)
