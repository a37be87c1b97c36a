"""Solver tests: dense LM, hemisphere fit, Schur vs dense normal equations,
end-to-end BA convergence on synthetic rigs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.geometry import hemisphere_camera_centers
from deeparc_tpu.io import make_hemisphere_rig
from deeparc_tpu.residuals import (
    camera_col_indices,
    camera_dim,
    cost,
    flatten_camera,
    jacobian_blocks,
    residuals,
)
from deeparc_tpu.scene import from_deeparc, freeze_masks
from deeparc_tpu.solver import levenberg_marquardt, solve_ba
from deeparc_tpu.solver.lm import fit_hemisphere
from deeparc_tpu.solver.schur import build_system, solve_schur
from deeparc_tpu.solver.linalg import inv3x3, pcg


def rmse_px(params, index):
    r = residuals(params, index)
    m = index.obs_mask
    return float(jnp.sqrt(jnp.sum(r * r) / jnp.maximum(jnp.sum(m), 1)))


def test_inv3x3():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(10, 3, 3))
    A = A @ np.transpose(A, (0, 2, 1)) + 3 * np.eye(3)
    got = np.asarray(inv3x3(jnp.asarray(A)))
    np.testing.assert_allclose(got, np.linalg.inv(A), rtol=1e-10)


def test_pcg_matches_direct():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(30, 30))
    A = A @ A.T + 5 * np.eye(30)
    b = rng.normal(size=30)
    res = pcg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-8)


def test_dense_lm_converges_exponential_fit():
    t = jnp.linspace(0, 1, 50)
    y = 2.5 * jnp.exp(-1.3 * t)

    def resid(x, t, y):
        return x[0] * jnp.exp(x[1] * t) - y

    out = levenberg_marquardt(
        resid, jnp.array([1.0, 0.0]), SolverOptions(max_iterations=100),
        None, t, y,
    )
    np.testing.assert_allclose(np.asarray(out.x), [2.5, -1.3], rtol=1e-6)
    assert float(out.cost) < 1e-12


def test_hemisphere_fit_recovers_rig_sphere():
    rig = make_hemisphere_rig(n_arc=4, n_ring=8, n_points=50, rho=2.0, seed=0)
    scene = from_deeparc(rig.data)
    centers = hemisphere_camera_centers(
        scene.params.ext_rot[:-1], scene.params.ext_trans[:-1], 4, 8
    )
    x = fit_hemisphere(centers)
    # center ~ object center (0, 0, rho); "radius" is mean squared distance
    np.testing.assert_allclose(np.asarray(x[:3]), [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(float(x[3]), 4.0, rtol=1e-6)


def _tiny_scene(**kw):
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=4, n_points=25, seed=7, **kw
    )
    return rig, from_deeparc(rig.data)


def test_schur_step_matches_dense_normal_equations():
    """The Schur-eliminated step equals the direct dense solve of the full
    augmented normal equations (small problem, exact property)."""
    rig, scene = _tiny_scene(pixel_noise=1.0, point_noise=0.05)
    free = freeze_masks(scene)
    cam_free = flatten_camera(free)
    point_free = free.points
    N, C = scene.n_points, camera_dim(scene.params)

    blocks = jacobian_blocks(scene.params, scene.index)
    sys = build_system(
        blocks.r, blocks.j_point, blocks.j_cam, scene.index,
        N, scene.params.ext_rot.shape[0], scene.params.center.shape[0],
        cam_free, point_free,
    )
    radius = jnp.asarray(1e4, scene.params.points.dtype)
    opts = SolverOptions()
    dp, dc = solve_schur(sys, radius, opts)

    # dense reference solve
    from deeparc_tpu.solver.schur import sys_cols, sys_jc, sys_jp, sys_r

    M = scene.n_obs
    P = 3 * N + C
    J = np.zeros((2 * M, P))
    jp = np.asarray(sys_jp(sys)).reshape(M, 2, 3)
    jc = np.asarray(sys_jc(sys)).reshape(M, 2, 18)
    op = np.asarray(sys.obs_point)
    cl = np.asarray(sys_cols(sys))
    for m in range(M):
        J[2 * m: 2 * m + 2, 3 * op[m]: 3 * op[m] + 3] = jp[m]
        for j in range(18):
            J[2 * m: 2 * m + 2, 3 * N + cl[m, j]] += jc[m, :, j]
    r = np.asarray(sys_r(sys)).reshape(-1)
    g = J.T @ r
    H = J.T @ J
    d2 = np.clip(np.diag(H), opts.min_lm_diagonal, opts.max_lm_diagonal)
    H_aug = H + np.diag(d2) / float(radius)
    fm = np.concatenate([np.asarray(point_free).reshape(-1), np.asarray(cam_free)])
    H_m = H_aug * np.outer(fm, fm) + np.diag(1 - fm)
    delta = np.linalg.solve(H_m, -g * fm) * fm

    np.testing.assert_allclose(
        np.asarray(dp).reshape(-1), delta[: 3 * N], rtol=1e-6, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(dc), delta[3 * N:], rtol=1e-6, atol=1e-10
    )


@pytest.mark.parametrize("solver", ["dense_schur", "iterative_schur"])
def test_ba_drives_cost_to_zero_noise_free_measurements(solver):
    """Perturbed points + exact measurements -> BA reaches the global minimum
    (cost ~ 0). Structure matches ground truth only up to the similarity
    gauge (fixing extrinsic 0 pins 6 DOF but not scale), so we check the
    reprojection optimum, not raw point equality."""
    rig, scene = _tiny_scene(point_noise=0.05)
    free = freeze_masks(scene)
    opts = SolverOptions(
        max_iterations=50, linear_solver=solver, progress_to_stdout=False
    )
    out = solve_ba(scene.params, scene.index, free, opts)
    assert rmse_px(out.params, scene.index) < 1e-6


def test_ba_exact_structure_recovery_with_frozen_cameras():
    """With cameras frozen at ground truth the minimum is unique: perturbed
    points must return exactly to the ground-truth structure."""
    rig, scene = _tiny_scene(point_noise=0.05)
    free = freeze_masks(scene, freeze_camera=True)
    out = solve_ba(
        scene.params, scene.index, free, SolverOptions(max_iterations=50)
    )
    assert rmse_px(out.params, scene.index) < 1e-8
    np.testing.assert_allclose(
        np.asarray(out.params.points), rig.gt_points, atol=1e-6
    )


def test_ba_with_pixel_noise_reaches_noise_floor():
    rig, scene = _tiny_scene(point_noise=0.03, pixel_noise=0.5)
    free = freeze_masks(scene)
    out = solve_ba(
        scene.params, scene.index, free,
        SolverOptions(max_iterations=50),
    )
    # converged residual RMSE should be at the injected noise level
    assert rmse_px(out.params, scene.index) < 0.7


def test_freeze_camera_only_moves_points():
    """freeze_camera pre-solve (sfm.cc:54-57): everything but points frozen."""
    rig, scene = _tiny_scene(point_noise=0.05, pixel_noise=0.2)
    free = freeze_masks(scene, freeze_camera=True)
    out = solve_ba(
        scene.params, scene.index, free, SolverOptions(max_iterations=20)
    )
    for name in ("ext_rot", "ext_trans", "center", "focal", "dist"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out.params, name)),
            np.asarray(getattr(scene.params, name)),
        )
    assert not np.allclose(
        np.asarray(out.params.points), np.asarray(scene.params.points)
    )
    assert rmse_px(out.params, scene.index) < rmse_px(scene.params, scene.index)


def test_gauge_extrinsic_held_constant():
    """Extrinsic record 0 is the gauge (sfm.cc:50-53) and must not move."""
    rig, scene = _tiny_scene(point_noise=0.02, pixel_noise=0.3)
    # perturb extrinsics so the solver has camera work to do
    bump = np.zeros_like(np.asarray(scene.params.ext_rot))
    bump[:-1] = 1e-3  # perturb real extrinsics, never the identity slot
    params = dataclasses.replace(
        scene.params,
        ext_rot=scene.params.ext_rot + bump,
        ext_trans=scene.params.ext_trans + bump,
    )
    free = freeze_masks(scene)
    out = solve_ba(params, scene.index, free, SolverOptions(max_iterations=30))
    np.testing.assert_array_equal(
        np.asarray(out.params.ext_rot[0]), np.asarray(params.ext_rot[0])
    )
    np.testing.assert_array_equal(
        np.asarray(out.params.ext_trans[0]), np.asarray(params.ext_trans[0])
    )
    # identity slot untouched too
    np.testing.assert_array_equal(
        np.asarray(out.params.ext_rot[-1]), np.zeros(3)
    )


def test_while_loop_driver_matches_python_driver():
    rig, scene = _tiny_scene(point_noise=0.04, pixel_noise=0.4)
    free = freeze_masks(scene)
    opts = SolverOptions(max_iterations=15)
    a = solve_ba(scene.params, scene.index, free, opts, driver="python")
    b = solve_ba(scene.params, scene.index, free, opts, driver="while_loop")
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(a.params.points), np.asarray(b.params.points), atol=1e-12
    )


def test_cauchy_loss_downweights_outliers():
    """Robust loss (the reference's commented-out CauchyLoss, sfm.cc:49):
    with corrupted observations, cauchy recovers structure closer to ground
    truth than the trivial loss."""
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=5, n_points=40, pixel_noise=0.2, point_noise=0.03,
        seed=55,
    )
    # corrupt 5% of observations badly
    rng = np.random.default_rng(0)
    bad = rng.choice(rig.data.n_obs, size=rig.data.n_obs // 20, replace=False)
    rig.data.obs_xy[bad] += 80.0
    scene = from_deeparc(rig.data)
    free = freeze_masks(scene, freeze_camera=True)  # unique minimum

    plain = solve_ba(
        scene.params, scene.index, free, SolverOptions(max_iterations=40)
    )
    robust = solve_ba(
        scene.params, scene.index, free,
        SolverOptions(max_iterations=40, loss="cauchy", loss_scale=2.0),
    )
    err_plain = np.linalg.norm(np.asarray(plain.params.points) - rig.gt_points, axis=1)
    err_robust = np.linalg.norm(np.asarray(robust.params.points) - rig.gt_points, axis=1)
    assert np.median(err_robust) < np.median(err_plain)


def test_grid_engine_robust_loss_matches_indexed():
    from deeparc_tpu.solver.rig_grid import grid_from_scene, solve_ba_grid

    rig = make_hemisphere_rig(
        n_arc=3, n_ring=5, n_points=30, pixel_noise=1.0, point_noise=0.03,
        seed=56,
    )
    scene = from_deeparc(rig.data)
    free = freeze_masks(scene)
    opts = SolverOptions(max_iterations=8, loss="huber", loss_scale=1.5)
    a = solve_ba(scene.params, scene.index, free, opts)
    grid = grid_from_scene(scene)
    b = solve_ba_grid(scene.params, grid, free, opts, chunk_size=16)
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-7)
