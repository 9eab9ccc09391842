"""Dispersive materials: wavelength-differentiable tabulated (n, k) data.

Replaces the reference's example-level ``aSiH(torch.autograd.Function)``
(/root/reference/example/Materials.py:5-53), which cubic-interpolates a
tabulated (wavelength, n, k) file with scipy and supplies an analytic
central-difference backward.  The TPU-native design precomputes natural
cubic-spline coefficients on the host once, and evaluates the spline with
pure jnp ops — jittable, vmappable over wavelength sweeps, and exactly
differentiable (the spline's own derivative, not a finite difference).

Out-of-range wavelengths clamp to the table edges, matching the
reference's behavior (Materials.py:30-43).
"""

import os

import numpy as np
import jax.numpy as jnp

__all__ = ['TabulatedMaterial', 'aSiH']


def _natural_cubic_coeffs(x, y):
    """Natural cubic spline coefficients (a, b, c, d) per interval:
    s(t) = a + b dt + c dt^2 + d dt^3, dt = t - x[i]."""
    n = len(x) - 1
    h = np.diff(x)
    # solve tridiagonal system for second derivatives (natural BCs)
    A = np.zeros((n + 1, n + 1))
    rhs = np.zeros(n + 1)
    A[0, 0] = 1.
    A[n, n] = 1.
    for i in range(1, n):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 3 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    c = np.linalg.solve(A, rhs)
    a = y[:-1]
    b = (y[1:] - y[:-1]) / h - h * (2 * c[:-1] + c[1:]) / 3
    d = (c[1:] - c[:-1]) / (3 * h)
    return a, b, c[:-1], d


class TabulatedMaterial:
    """Complex refractive index n(lambda) + i k(lambda) from a table.

    Args:
      wavelength: [M] sample points (ascending), any length unit — use the
        same unit when evaluating.
      n, k: [M] real refractive index and extinction samples.
    """

    def __init__(self, wavelength, n, k=None):
        wl = np.asarray(wavelength, np.float64)
        order = np.argsort(wl)
        wl = wl[order]
        n = np.asarray(n, np.float64)[order]
        k = (np.zeros_like(wl) if k is None
             else np.asarray(k, np.float64)[order])
        self.wl_min = float(wl[0])
        self.wl_max = float(wl[-1])
        self._knots = jnp.asarray(wl)
        self._coeff_n = tuple(jnp.asarray(c)
                              for c in _natural_cubic_coeffs(wl, n))
        self._coeff_k = tuple(jnp.asarray(c)
                              for c in _natural_cubic_coeffs(wl, k))

    @classmethod
    def from_file(cls, path, skiprows=0):
        """Load a whitespace table of columns (wavelength, n[, k]) — the
        reference's Materials_data format."""
        data = np.loadtxt(path, skiprows=skiprows)
        k = data[:, 2] if data.shape[1] > 2 else None
        return cls(data[:, 0], data[:, 1], k)

    def _eval(self, coeffs, lam):
        a, b, c, d = coeffs
        lam = jnp.clip(lam, self.wl_min, self.wl_max)
        i = jnp.clip(jnp.searchsorted(self._knots, lam, side='right') - 1,
                     0, len(a) - 1)
        dt = lam - self._knots[i]
        return a[i] + dt * (b[i] + dt * (c[i] + dt * d[i]))

    def n(self, wavelength):
        """Real refractive index at the given wavelength(s)."""
        return self._eval(self._coeff_n, jnp.asarray(wavelength))

    def k(self, wavelength):
        return self._eval(self._coeff_k, jnp.asarray(wavelength))

    def nk(self, wavelength):
        """Complex refractive index n + i k (reference: Materials.py:45)."""
        return self.n(wavelength) + 1j * self.k(wavelength)

    def eps(self, wavelength):
        """Complex permittivity (n + i k)^2."""
        return self.nk(wavelength) ** 2

    def eps_pair(self, wavelength):
        """(re, im) of the permittivity (n + i k)^2 as real arrays — the
        split-real form the TPU path consumes (complex dtypes do not
        cross the device boundary); jit/vmap/grad-safe in-trace."""
        nv = self.n(wavelength)
        kv = self.k(wavelength)
        return nv * nv - kv * kv, 2. * nv * kv

    # reference API shim: aSiH.apply(lamb0) returned the complex index
    def apply(self, wavelength):
        return self.nk(wavelength)

    def __call__(self, wavelength):
        return self.nk(wavelength)


# vendored table: Tauc-Lorentz a-Si:H (causal by construction), generated
# deterministically by scripts/gen_asih_table.py — the framework's
# dispersive examples run self-contained, no reference checkout needed
_ASIH_VENDORED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              'data', 'aSiH_nk.txt')


def aSiH(path=None):
    """Hydrogenated amorphous silicon (n, k) material.

    By default loads the vendored Tauc-Lorentz-derived table
    (``torcwa_tpu/data/aSiH_nk.txt``).  For bit-parity against the
    reference's measured table (the data contract at
    /root/reference/example/Materials.py:9-17), pass its path explicitly
    — the parity scripts under ``scripts/`` do.
    """
    p = path or _ASIH_VENDORED
    if not os.path.exists(p):
        raise FileNotFoundError(
            f'aSiH data table not found at {p}; pass path= explicitly')
    return TabulatedMaterial.from_file(p)
