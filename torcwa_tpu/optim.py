"""Optimization helpers for shape/topology design loops.

The reference implements these inline in its notebooks: a hand-rolled
ADAM update (README.md:469-511, Example5/6), Gaussian blur through FFT
plus tanh projection for fabrication constraints (Example6 cell 2).
Here they are library functions — pure, jittable, differentiable.
"""

import functools
import time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['adam_init', 'adam_update', 'gaussian_blur', 'tanh_projection',
           'IterationRecord', 'maximize_adam']


def adam_init(rho):
    """(m, v, step) moments for a parameter pytree."""
    zeros = jax.tree.map(jnp.zeros_like, rho)
    return zeros, jax.tree.map(jnp.zeros_like, rho), 0


@functools.partial(jax.jit, static_argnames=('eps_in_sqrt',))
def adam_update(rho, grad, m, v, step, lr=0.02, beta1=0.9, beta2=0.999,
                eps=1e-8, lower=0., upper=1., eps_in_sqrt=False):
    """One ADAM step with bias correction and clamping to [lower, upper]
    (the notebooks' ``rho[rho>1]=1`` idiom, functionalized).

    ``eps_in_sqrt=True`` reproduces the reference notebooks' denominator
    ``sqrt(v_hat + eps)`` (Example5/6 cell 2) instead of the textbook
    ``sqrt(v_hat) + eps``."""
    step = step + 1
    m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g, m, grad)
    v = jax.tree.map(lambda v_, g: beta2 * v_ + (1 - beta2) * g * g, v, grad)
    bc1 = 1 - beta1 ** step
    bc2 = 1 - beta2 ** step
    if eps_in_sqrt:
        den = lambda v_: jnp.sqrt(v_ / bc2 + eps)
    else:
        den = lambda v_: jnp.sqrt(v_ / bc2) + eps
    rho = jax.tree.map(
        lambda r, m_, v_: jnp.clip(
            r - lr * (m_ / bc1) / den(v_), lower, upper),
        rho, m, v)
    return rho, m, v, step


class IterationRecord(NamedTuple):
    """Structured per-iteration metrics for optimization loops.

    Replaces the reference notebooks' ad-hoc ``print`` telemetry
    (Example5/6 cell 2) with a record a callback can log, plot, or stream
    (SURVEY §5 metrics/observability item)."""
    step: int
    fom: float
    grad_norm: float
    elapsed_s: float
    params: object           # current parameter pytree (post-update)
    opt_state: object = None  # (m, v, step) — for checkpoint/resume


def maximize_adam(fom_fn, params0, n_iters, *, lr=0.02, beta1=0.9,
                  beta2=0.999, eps=1e-8, lower=0., upper=1.,
                  lr_schedule=None, callback=None, post_update=None,
                  state=None, eps_in_sqrt=False, fom_args_schedule=None):
    """Gradient-ascent ADAM loop with structured per-iteration metrics.

    Mirrors the reference's hand-rolled notebook loops (Example5 cell 2,
    Example6 cell 2): jitted value-and-grad of ``fom_fn``, bias-corrected
    ADAM ascent, clamping to [lower, upper], optional per-iteration
    learning rate (``lr_schedule(it) -> lr``, e.g. Example5's linear
    decay or Example6's cosine), and an optional ``post_update(params,
    step)`` hook (e.g. Example6's mirror symmetrization).
    ``fom_args_schedule(it) -> tuple`` supplies extra per-iteration
    arguments to ``fom_fn`` (e.g. Example6's binarization beta);
    gradients are taken w.r.t. params only.  ``callback(IterationRecord)``
    fires every iteration.  ``state`` resumes from (params, m, v, step).

    Returns (params, (m, v, step), history) with history the list of
    (fom, grad_norm) per iteration.
    """
    if state is not None:
        params, m, v, step = state
    else:
        params = params0
        m, v, step = adam_init(params0)

    # One fused dispatch per iteration (value_and_grad + ADAM update +
    # grad norm) and ONE host sync for the (fom, grad_norm) scalars; on
    # the TPU tunnel runtime each extra dispatch/sync costs ~30-50 ms,
    # which dominated small-solve optimization loops.
    @functools.partial(jax.jit, static_argnums=(5,))
    def _step(params, m, v, step, lr_t, n_extra, *extra):
        f, g = jax.value_and_grad(fom_fn)(params, *extra)
        new = adam_update(params, jax.tree.map(jnp.negative, g), m, v,
                          step, lr=lr_t, beta1=beta1, beta2=beta2, eps=eps,
                          lower=lower, upper=upper, eps_in_sqrt=eps_in_sqrt)
        gn = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(g)))
        return new + (jnp.stack([f, gn]),)

    history = []
    step_h = int(step)      # host mirror of the step counter (schedules,
    t0 = time.time()        # records) — the device copy is never synced
    for it in range(n_iters):
        extra = fom_args_schedule(step_h) if fom_args_schedule else ()
        lr_t = lr_schedule(step_h) if lr_schedule is not None else lr
        # lr is traced (a new Python float per iteration would retrace);
        # cast to the param dtype so x64 schedules don't promote params
        lr_arr = jnp.asarray(lr_t, dtype=jax.tree.leaves(params)[0].dtype)
        params, m, v, step, scalars = _step(params, m, v, step, lr_arr,
                                            len(extra), *extra)
        step_h += 1
        if post_update is not None:
            params = post_update(params, step_h)
        fom, gn = (float(x) for x in np.asarray(scalars))
        history.append((fom, gn))
        if callback is not None:
            callback(IterationRecord(step=step_h, fom=fom, grad_norm=gn,
                                     elapsed_s=time.time() - t0,
                                     params=params,
                                     opt_state=(m, v, step_h)))
    return params, (m, v, step_h), history


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
