"""Hemisphere-radius prior residual (sphere fit to camera centers).

Native equivalent of the reference's ``HemisphereRadius`` functor
(``src/hemisphere_radius.hh:19-28``): one residual per camera center,

    residual_i = sum_d (center_d - position_{i,d})^2  -  radius

Note (SURVEY.md section 2.1): the residual compares *squared* distance to the
raw radius parameter, so the converged "radius" is the mean squared distance
r^2 — the downstream hemisphere distance cut ``d^2 > radius / 2``
(``src/DeepArcManager.cc:387``) is consistent with that convention, and this
implementation preserves it for parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def hemisphere_residuals(
    params: jnp.ndarray, camera_centers: jnp.ndarray
) -> jnp.ndarray:
    """params = [cx, cy, cz, radius] (4,), camera_centers (C, 3) -> (C,)."""
    center = params[:3]
    radius = params[3]
    d2 = jnp.sum((center[None, :] - camera_centers) ** 2, axis=-1)
    return d2 - radius
