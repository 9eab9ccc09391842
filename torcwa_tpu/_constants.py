"""Physical constants and dtype policy.

Unit conventions follow the reference implementation
(/root/reference/torcwa/rcwa.py:17-21):
  - Lorentz-Heaviside units, speed of light c = 1, eps0 = mu0 = 1
  - time-harmonic notation exp(-j w t)

Note on PI: the reference defines ``pi = 3.141592652589793``
(/root/reference/torcwa/rcwa.py:5), which drops a digit of the true value
(3.14159265358979...).  The relative error is ~3e-10 — invisible at
complex64 but measurable when bit-comparing float64 runs against the
reference.  We expose both and use the *reference* value by default so that
golden-file comparisons agree at complex128 too.
"""

import warnings

import jax
import jax.numpy as jnp

# The reference's (slightly wrong) pi — used for omega = 2*pi*freq to match
# the reference bit-for-bit at float64.
PI_REF = 3.141592652589793
# True pi, for anything not requiring reference parity.
PI = 3.14159265358979323846

# Degree <-> radian conversions use the reference pi for parity
# (/root/reference/torcwa/rcwa.py:259).
RAD2DEG = 180.0 / PI_REF


def validate_sim_dtype(dtype):
    """Validate the simulation dtype.

    Mirrors /root/reference/torcwa/rcwa.py:37-41: only complex64 and
    complex128 are allowed; anything else warns and falls back to complex64.
    Additionally, complex128 requires jax x64 mode (and is CPU-only in
    practice — TPU has no fp64).
    """
    dtype = jnp.dtype(dtype) if dtype is not None else jnp.dtype(jnp.complex64)
    if dtype not in (jnp.dtype(jnp.complex64), jnp.dtype(jnp.complex128)):
        warnings.warn('Invalid simulation data type. Set as complex64.', UserWarning)
        return jnp.complex64
    if dtype == jnp.dtype(jnp.complex128) and not jax.config.jax_enable_x64:
        warnings.warn(
            'complex128 requested but jax x64 mode is disabled '
            '(set jax.config.update("jax_enable_x64", True)). Set as complex64.',
            UserWarning,
        )
        return jnp.complex64
    return dtype.type


def real_dtype_of(cdtype):
    """float32 for complex64, float64 for complex128.

    Pure dtype math (numpy) — must not create a complex device array,
    which the TPU runtime here cannot hold."""
    import numpy as np
    return jnp.dtype(np.finfo(np.dtype(cdtype)).dtype)
