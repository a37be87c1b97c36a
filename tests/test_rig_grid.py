"""Grid engine vs indexed engine: residuals, analytic Jacobians, normal
equations, LM steps, and full solves must agree."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io import make_hemisphere_rig
from deeparc_tpu.residuals import (
    flatten_camera,
    jacobian_blocks,
    residuals,
)
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver import solve_ba
from deeparc_tpu.solver.ba import init_state, make_step_pure
from deeparc_tpu.solver.rig_grid import (
    assemble_grid_system,
    grid_from_scene,
    grid_jacobians,
    grid_residuals,
    init_grid_state,
    make_grid_step,
    slot_params,
    solve_ba_grid,
)
from deeparc_tpu.solver.schur import build_system


@pytest.fixture(scope="module", params=[
    dict(focal_size=1, dist_size=0),
    dict(focal_size=2, dist_size=2),
])
def problem(request):
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=5, n_points=40, pixel_noise=0.5, point_noise=0.04,
        seed=23, **request.param,
    )
    scene = from_deeparc(rig.data)
    grid = grid_from_scene(scene)
    free = freeze_masks(scene)
    return scene, grid, free


def _obs_to_grid(scene):
    """(point, cell) coordinates of each live indexed observation."""
    R = scene.meta.ring_size
    cell = scene.meta.obs_arc.astype(int) * R + scene.meta.obs_ring.astype(int)
    return np.asarray(scene.index.obs_point), cell


def test_grid_residuals_match_indexed(problem):
    scene, grid, _ = problem
    r_idx = np.asarray(residuals(scene.params, scene.index))
    sp = slot_params(scene.params, grid)
    r_grid = np.asarray(grid_residuals(scene.params.points, sp, grid))
    p, t = _obs_to_grid(scene)
    np.testing.assert_allclose(r_grid[p, t], r_idx, atol=1e-10)
    # slots without observations contribute exactly zero
    total_idx = np.sum(r_idx * r_idx)
    total_grid = np.sum(r_grid * r_grid)
    np.testing.assert_allclose(total_grid, total_idx, rtol=1e-12)


def test_grid_analytic_jacobians_match_autodiff(problem):
    scene, grid, _ = problem
    blocks_idx = jacobian_blocks(scene.params, scene.index)
    sp = slot_params(scene.params, grid)
    gb = grid_jacobians(scene.params.points, sp, grid)
    p, t = _obs_to_grid(scene)

    np.testing.assert_allclose(
        np.asarray(gb.j_x)[p, t], np.asarray(blocks_idx.j_point),
        rtol=1e-6, atol=1e-9,
    )
    j_cam_grid = np.concatenate(
        [np.asarray(gb.j_wo), np.asarray(gb.j_to), np.asarray(gb.j_wi),
         np.asarray(gb.j_ti), np.asarray(gb.j_intr)], axis=-1
    )
    np.testing.assert_allclose(
        j_cam_grid[p, t], np.asarray(blocks_idx.j_cam),
        rtol=1e-6, atol=1e-9,
    )


def test_grid_normal_equations_match_indexed(problem):
    scene, grid, free = problem
    cam_free = flatten_camera(free)
    point_free = free.points
    sp = slot_params(scene.params, grid)
    sys_g = assemble_grid_system(
        scene.params.points, sp, grid, cam_free, point_free, chunk_size=16
    )

    blocks = jacobian_blocks(scene.params, scene.index)
    sys_i = build_system(
        blocks.r, blocks.j_point, blocks.j_cam, scene.index,
        scene.n_points, scene.params.ext_rot.shape[0],
        scene.params.center.shape[0], cam_free, point_free,
    )
    np.testing.assert_allclose(
        np.asarray(sys_g.g_p), np.asarray(sys_i.g_p), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sys_g.g_c), np.asarray(sys_i.g_c), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sys_g.hpp), np.asarray(sys_i.hpp), rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(sys_g.hcc)), np.asarray(sys_i.hcc_diag),
        rtol=1e-7, atol=1e-10,
    )
    # E against the dense-path materialization
    from deeparc_tpu.solver.schur import _dense_E

    np.testing.assert_allclose(
        np.asarray(sys_g.E), np.asarray(_dense_E(sys_i)),
        rtol=1e-7, atol=1e-10,
    )


def test_grid_step_matches_indexed_step(problem):
    scene, grid, free = problem
    opts = SolverOptions(linear_solver="dense_schur")
    cam_free = flatten_camera(free)

    s_idx = init_state(scene.params, scene.index, opts)
    idx_step = jax.jit(make_step_pure(opts))
    s_idx2, info_idx = idx_step(s_idx, scene.index, cam_free, free.points)

    s_g = init_grid_state(scene.params, grid, opts)
    np.testing.assert_allclose(
        float(s_g.cost), float(s_idx.cost), rtol=1e-10
    )
    g_step = jax.jit(make_grid_step(opts, scene.params, chunk_size=16))
    s_g2, info_g = g_step(s_g, grid, cam_free, free.points)

    np.testing.assert_allclose(
        float(info_g.cost), float(info_idx.cost), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(s_g2.points),
        np.asarray(s_idx2.params.points), rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(s_g2.cam_vec),
        np.asarray(flatten_camera(s_idx2.params)), rtol=1e-6, atol=1e-9,
    )


def test_grid_solve_reaches_same_minimum(problem):
    scene, grid, free = problem
    opts = SolverOptions(max_iterations=40)
    ref = solve_ba(scene.params, scene.index, free, opts)
    out = solve_ba_grid(scene.params, grid, free, opts, chunk_size=16)
    np.testing.assert_allclose(float(out.cost), float(ref.cost), rtol=1e-8)


def test_grid_while_loop_driver(problem):
    scene, grid, free = problem
    opts = SolverOptions(max_iterations=5)
    a = solve_ba_grid(scene.params, grid, free, opts, driver="python")
    b = solve_ba_grid(scene.params, grid, free, opts, driver="while_loop")
    np.testing.assert_allclose(float(a.cost), float(b.cost), rtol=1e-10)


def test_planes_impl_matches_einsum_impl(problem):
    """The structure-of-arrays linearization (rig_planes.py) must reproduce
    the einsum formulation field-for-field, including robust loss weighting
    and freeze masks."""
    scene, grid, free = problem
    cam_free = flatten_camera(free)
    point_free = free.points
    sp = slot_params(scene.params, grid)
    from deeparc_tpu.solver.rig_grid import grid_cost

    for loss in ("trivial", "cauchy"):
        kw = dict(chunk_size=16, loss=loss, loss_scale=0.7)
        sys_p = assemble_grid_system(
            scene.params.points, sp, grid, cam_free, point_free, **kw)
        sys_e = assemble_grid_system(
            scene.params.points, sp, grid, cam_free, point_free,
            impl="einsum", **kw)
        for name in ("cost", "g_p", "hpp", "g_c", "hcc", "E"):
            np.testing.assert_allclose(
                np.asarray(getattr(sys_p, name)),
                np.asarray(getattr(sys_e, name)),
                rtol=1e-7, atol=1e-10, err_msg=f"{name} ({loss})",
            )
        c_p = grid_cost(scene.params.points, sp, grid, chunk_size=16,
                        loss=loss, loss_scale=0.7, impl="planes")
        c_e = grid_cost(scene.params.points, sp, grid, chunk_size=16,
                        loss=loss, loss_scale=0.7, impl="einsum")
        np.testing.assert_allclose(float(c_p), float(c_e), rtol=1e-12)


def test_fused_trial_step_matches_classic(problem):
    """make_grid_step(fuse_trial=True) — the state carries the
    linearization and the trial evaluation IS the next linearize — must
    reproduce the classic linearize+cost-pass step: same costs, same
    accept decisions, same iterates."""
    from deeparc_tpu.residuals.reprojection import flatten_camera
    from deeparc_tpu.solver.rig_grid import (
        GridStateF,
        init_grid_state,
        init_grid_state_fused,
        make_grid_step,
    )

    scene, grid, free = problem
    cam_free = flatten_camera(free)
    point_free = free.points
    opts = SolverOptions()

    step_c = make_grid_step(opts, scene.params, impl="planes")
    step_f = make_grid_step(opts, scene.params, impl="planes",
                            fuse_trial=True)
    sc = init_grid_state(scene.params, grid, opts, impl="planes")
    sf = init_grid_state_fused(scene.params, grid, opts, cam_free,
                               point_free, impl="planes")
    np.testing.assert_allclose(float(sf.cost), float(sc.cost), rtol=1e-12)
    for _ in range(4):
        sc, ic = step_c(sc, grid, cam_free, point_free)
        sf, if_ = step_f(sf, grid, cam_free, point_free)
        assert bool(ic.accepted) == bool(if_.accepted)
        np.testing.assert_allclose(float(sf.cost), float(sc.cost),
                                   rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sf.points), np.asarray(sc.points),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sf.cam_vec),
                               np.asarray(sc.cam_vec), rtol=1e-8,
                               atol=1e-12)
    # the carried system IS the linearization at the final iterate
    assert isinstance(sf, GridStateF)
    np.testing.assert_allclose(float(sf.sys.cost), float(sf.cost),
                               rtol=1e-12)
