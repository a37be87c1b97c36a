"""Solver-state checkpoint/restore (SURVEY.md section 5).

The ``.deeparc`` file is the canonical scene checkpoint (the reference's
mid-pipeline writes are restartable inputs, ``src/sfm.cc:130`` +
``DeepArcManager::read``); this adds the LM solver-state sidecar (trust
region radius, iteration count, parameter pytree) as a plain .npz so an
interrupted solve resumes from the same trust-region state rather than
re-warming from scratch."""

from __future__ import annotations

import numpy as np

from deeparc_tpu.scene import BAParams


def save_solver_state(path: str, params: BAParams, radius: float,
                      decrease_factor: float, iteration: int,
                      cost: float) -> None:
    np.savez(
        path,
        points=np.asarray(params.points),
        ext_rot=np.asarray(params.ext_rot),
        ext_trans=np.asarray(params.ext_trans),
        center=np.asarray(params.center),
        focal=np.asarray(params.focal),
        dist=np.asarray(params.dist),
        radius=radius, decrease_factor=decrease_factor,
        iteration=iteration, cost=cost,
    )


def load_solver_state(path: str, dtype=None):
    """Returns (BAParams, dict of scalars)."""
    import jax.numpy as jnp

    z = np.load(path)
    dtype = dtype or jnp.float64
    params = BAParams(
        points=jnp.asarray(z["points"], dtype),
        ext_rot=jnp.asarray(z["ext_rot"], dtype),
        ext_trans=jnp.asarray(z["ext_trans"], dtype),
        center=jnp.asarray(z["center"], dtype),
        focal=jnp.asarray(z["focal"], dtype),
        dist=jnp.asarray(z["dist"], dtype),
    )
    scalars = {
        "radius": float(z["radius"]),
        "decrease_factor": float(z["decrease_factor"]),
        "iteration": int(z["iteration"]),
        "cost": float(z["cost"]),
    }
    return params, scalars
