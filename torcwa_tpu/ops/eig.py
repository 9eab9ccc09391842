"""Differentiable general (non-Hermitian) complex eigendecomposition.

This replaces the reference's ``Eig(torch.autograd.Function)``
(/root/reference/torcwa/torch_eig.py:8-44): a complex eigendecomposition
whose backward pass is stabilized with Lorentzian broadening,

    F_ij = conj(s_ij) / (|s_ij|^2 + eps),   s_ij = lambda_j - lambda_i,
    F_ii = 0,
    dA   = X^-H (diag(dlambda) + conj(F) o (X^H dX)) X^H,

where ``eps`` is the broadening parameter (``None`` selects the smallest
subnormal of the dtype, mirroring torch_eig.py:28-33).

Forward-pass backends
---------------------
``'qr'``       TPU-native batched Hessenberg + implicitly-shifted QR +
               back-substitution eigenvectors (see ``eig_qr.py``).  Runs
               entirely on-device under jit/vmap; the production TPU path.
``'callback'`` ``jax.pure_callback`` to host LAPACK (numpy.linalg.eig).
               The natural choice on CPU and a cross-check oracle on TPU.
``'auto'``     'callback' on CPU, 'qr' on TPU.

The backward formula is backend-independent: it only consumes the forward
results, so gradients are identical (and identically stabilized) either way.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['eig', 'Eig']

# Smallest positive subnormals, mirroring the reference's fallback
# broadening (torch_eig.py:31-33).
_TINY = {np.dtype(np.complex64): 1.4e-45, np.dtype(np.complex128): 4.9e-324}


# ---------------------------------------------------------------------------
# Forward backends
# ---------------------------------------------------------------------------

def _eig_host(a):
    """Host LAPACK eig; handles arbitrary leading batch dims."""
    w, v = np.linalg.eig(a)
    return w.astype(a.dtype), v.astype(a.dtype)


def _eig_callback(A):
    n = A.shape[-1]
    result_shape = (
        jax.ShapeDtypeStruct(A.shape[:-1], A.dtype),      # eigvals
        jax.ShapeDtypeStruct(A.shape, A.dtype),           # eigvecs
    )
    return jax.pure_callback(_eig_host, result_shape, A,
                             vmap_method='broadcast_all')


def _resolve_backend(backend):
    if backend in (None, 'auto'):
        return 'callback' if jax.default_backend() == 'cpu' else 'qr'
    return backend


def _eig_fwd_impl(A, backend):
    backend = _resolve_backend(backend)
    if backend == 'callback':
        return _eig_callback(A)
    elif backend == 'qr':
        from . import eig_qr
        return eig_qr.eig_qr(A)
    else:
        raise ValueError(f'Unknown eig backend: {backend!r}')


# ---------------------------------------------------------------------------
# Custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def eig(A, broadening=1e-10, backend='auto'):
    """Eigendecomposition of a general complex matrix with stabilized VJP.

    Args:
      A: [..., n, n] complex64/complex128 matrix (batched ok).
      broadening: Lorentzian broadening parameter for the backward pass
        (static).  ``None`` uses the dtype's smallest subnormal.
      backend: 'auto' | 'qr' | 'callback' (static).

    Returns:
      (eigvals [..., n], eigvecs [..., n, n]) — column eigenvectors,
      unit 2-norm (up to backend-dependent phase).
    """
    return _eig_fwd_impl(A, backend)


def _eig_fwd(A, broadening, backend):
    w, v = _eig_fwd_impl(A, backend)
    return (w, v), (w, v)


def _eig_bwd(broadening, backend, res, cotangents):
    eigval, eigvec = res
    # JAX's VJP convention is the *transpose* of the JVP (no conjugation),
    # whereas the reference formula (torch_eig.py:19-44) is written in
    # torch's adjoint convention.  The exact adapter between the two is
    #   grad_jax = conj(grad_torch(conj(cotangents))),
    # which keeps the broadened-F semantics bit-identical to the reference.
    grad_eigval = jnp.conj(cotangents[0])
    grad_eigvec = jnp.conj(cotangents[1])

    if broadening is None:
        eps = _TINY[np.dtype(eigval.dtype)]
    else:
        eps = broadening

    # s[..., i, j] = lambda_j - lambda_i (torch_eig.py:25)
    s = eigval[..., None, :] - eigval[..., :, None]
    n = s.shape[-1]
    diag = jnp.eye(n, dtype=bool)
    # Mask the diagonal *before* dividing: with eps == 0 (unstabilized mode)
    # the diagonal would otherwise be 0/0 = nan, poisoning the whole grad.
    s_safe = jnp.where(diag, 1.0, s)
    F = jnp.conj(s_safe) / (jnp.abs(s_safe) ** 2 + eps)
    F = jnp.where(diag, 0.0, F)  # zero diagonal (torch_eig.py:35-36)

    XH = jnp.conj(jnp.swapaxes(eigvec, -2, -1))
    tmp = jnp.conj(F) * (XH @ grad_eigvec)
    inner = tmp + jnp.einsum('...i,ij->...ij', grad_eigval,
                             jnp.eye(n, dtype=grad_eigval.dtype))
    # X^-H @ inner @ X^H, via a solve for stability (same math as
    # torch_eig.py:40's explicit inverse).
    grad = jnp.linalg.solve(XH, inner @ XH)
    return (jnp.conj(grad),)


eig.defvjp(_eig_fwd, _eig_bwd)


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
