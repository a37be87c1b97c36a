"""Robust loss functions (the reference's disabled ``CauchyLoss(0.5)`` hook,
``src/sfm.cc:48-49``, as a first-class option).

Per-observation squared norm s = ||r||^2 is robustified to rho(s); the
solver uses IRLS-style reweighting, scaling the residual and its Jacobian
rows by w = sqrt(rho'(s)) (the first-order Triggs corrector — exact for the
gradient, Gauss-Newton-approximate for the Hessian, which is also what Ceres
does by default for its robustified normal equations).

Losses follow Ceres' definitions:
  trivial: rho(s) = s
  huber:   rho(s) = s                   for s <= a^2
           rho(s) = 2 a sqrt(s) - a^2   otherwise
  cauchy:  rho(s) = a^2 log(1 + s/a^2)
"""

from __future__ import annotations

import jax.numpy as jnp


def rho(s: jnp.ndarray, loss: str, scale: float) -> jnp.ndarray:
    if loss == "trivial":
        return s
    a2 = scale * scale
    if loss == "huber":
        return jnp.where(s <= a2, s, 2.0 * scale * jnp.sqrt(jnp.maximum(s, a2)) - a2)
    if loss == "cauchy":
        return a2 * jnp.log1p(s / a2)
    raise ValueError(f"unknown loss {loss!r}")


def weight(s: jnp.ndarray, loss: str, scale: float) -> jnp.ndarray:
    """w = sqrt(rho'(s)); multiplies residuals and Jacobian rows."""
    if loss == "trivial":
        return jnp.ones_like(s)
    a2 = scale * scale
    if loss == "huber":
        return jnp.where(
            s <= a2, 1.0, jnp.sqrt(scale / jnp.sqrt(jnp.maximum(s, a2)))
        )
    if loss == "cauchy":
        return jnp.sqrt(1.0 / (1.0 + s / a2))
    raise ValueError(f"unknown loss {loss!r}")
