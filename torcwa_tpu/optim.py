"""Optimization helpers for shape/topology design loops.

The reference implements these inline in its notebooks: a hand-rolled
ADAM update (README.md:469-511, Example5/6), Gaussian blur through FFT
plus tanh projection for fabrication constraints (Example6 cell 2).
Here they are library functions — pure, jittable, differentiable.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['adam_init', 'adam_update', 'gaussian_blur', 'tanh_projection']


def adam_init(rho):
    """(m, v, step) moments for a parameter pytree."""
    zeros = jax.tree.map(jnp.zeros_like, rho)
    return zeros, jax.tree.map(jnp.zeros_like, rho), 0


@functools.partial(jax.jit, static_argnames=())
def adam_update(rho, grad, m, v, step, lr=0.02, beta1=0.9, beta2=0.999,
                eps=1e-8, lower=0., upper=1.):
    """One ADAM step with bias correction and clamping to [lower, upper]
    (the notebooks' ``rho[rho>1]=1`` idiom, functionalized)."""
    step = step + 1
    m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g, m, grad)
    v = jax.tree.map(lambda v_, g: beta2 * v_ + (1 - beta2) * g * g, v, grad)
    bc1 = 1 - beta1 ** step
    bc2 = 1 - beta2 ** step
    rho = jax.tree.map(
        lambda r, m_, v_: jnp.clip(
            r - lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + eps), lower, upper),
        rho, m, v)
    return rho, m, v, step


def gaussian_blur(rho, sigma_cells):
    """Periodic Gaussian blur of a [nx, ny] density via real FFTs
    (fabrication-radius filter; reference Example6 cell 2)."""
    nx, ny = rho.shape
    fx = jnp.fft.fftfreq(nx)
    fy = jnp.fft.rfftfreq(ny)
    g = jnp.exp(-2 * (np.pi ** 2) * (sigma_cells ** 2)
                * (fx[:, None] ** 2 + fy[None, :] ** 2))
    return jnp.fft.irfft2(jnp.fft.rfft2(rho) * g, s=(nx, ny))


def tanh_projection(rho, beta, eta=0.5):
    """Smoothed binarization (reference Example6's projection step)."""
    num = jnp.tanh(beta * eta) + jnp.tanh(beta * (rho - eta))
    den = jnp.tanh(beta * eta) + jnp.tanh(beta * (1 - eta))
    return num / den
