"""Accuracy parity vs an independent CPU reference optimizer.

SURVEY.md section 4: integration tests need 'RMSE parity vs a CPU reference
LM on the same problem'. Ceres itself is not available in this image, so the
independent reference is scipy.optimize.least_squares (TRF trust region) run
on the identical residual function; both optimizers must reach the same
minimum (same final cost to ~1e-6 relative) on a noisy synthetic rig.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import least_squares

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io import make_hemisphere_rig
from deeparc_tpu.residuals import flatten_camera, residuals, unflatten_camera
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver import solve_ba


@pytest.fixture(scope="module")
def scipy_reference():
    """The scipy-TRF reference minimum, solved ONCE for both solver
    parametrizations (it is solver-independent and dominates wall time).

    The reference minimum is also disk-cached next to the JAX compile
    cache: the problem is fully deterministic (fixed seed, fixed scipy
    algorithm), so re-deriving the ~45 s scipy solve every run only
    re-verifies scipy against itself. Delete .jax_cache to force a
    recompute.
    """
    import json
    import os

    rig_kwargs = dict(
        n_arc=3, n_ring=5, n_points=40, pixel_noise=0.6, point_noise=0.05,
        seed=17,
    )
    rig = make_hemisphere_rig(**rig_kwargs)
    scene = from_deeparc(rig.data)
    free = freeze_masks(scene)
    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    cache_path = os.path.join(cache_dir, "scipy_reference_cost.json")
    # key derived from the actual fixture parameters: changing the problem
    # invalidates the cached scipy minimum automatically
    key = "trf_" + "_".join(
        f"{k}={rig_kwargs[k]}" for k in sorted(rig_kwargs))
    try:
        cached = json.load(open(cache_path))
        if cached.get("key") == key:
            return scene, free, cached["cost"]
    except Exception:
        pass
    ref_cost = _scipy_min_cost(scene, free)
    os.makedirs(cache_dir, exist_ok=True)
    with open(cache_path, "w") as f:
        json.dump({"key": key, "cost": float(ref_cost)}, f)
    return scene, free, ref_cost


@pytest.mark.parametrize("solver", ["dense_schur", "iterative_schur"])
def test_final_cost_matches_scipy_reference(solver, scipy_reference):
    scene, free, ref_cost = scipy_reference
    ours = solve_ba(
        scene.params, scene.index, free,
        SolverOptions(max_iterations=100, linear_solver=solver),
    )
    assert float(ours.cost) == pytest.approx(ref_cost, rel=1e-5)


def _scipy_min_cost(scene, free):
    # scipy reference on the identical free parameters (points + non-gauge
    # extrinsics), same residual evaluation.
    cam_free = np.asarray(flatten_camera(free)) > 0.5
    pt_free = np.asarray(free.points).reshape(-1) > 0.5
    cam0 = np.asarray(flatten_camera(scene.params))
    pts0 = np.asarray(scene.params.points).reshape(-1)
    x0 = np.concatenate([pts0[pt_free], cam0[cam_free]])
    n_pt_free = int(pt_free.sum())

    def unpack(x):
        pts = pts0.copy()
        pts[pt_free] = x[:n_pt_free]
        cam = cam0.copy()
        cam[cam_free] = x[n_pt_free:]
        params = unflatten_camera(jnp.asarray(cam), scene.params)
        return dataclasses.replace(
            params, points=jnp.asarray(pts.reshape(-1, 3))
        )

    def fun(x):
        return np.asarray(residuals(unpack(x), scene.index)).reshape(-1)

    ref = least_squares(fun, x0, method="trf", xtol=1e-12, ftol=1e-12,
                        gtol=1e-12, max_nfev=4000)
    # scipy's .cost is 0.5 * sum(r^2) — the same convention as ours
    return float(ref.cost)
