"""Pose-graph refinement and BFS incremental BA tests."""

import jax.numpy as jnp
import numpy as np

from deeparc_tpu.config import PipelineOptions, SolverOptions
from deeparc_tpu.geometry.rotation import angle_axis_to_matrix
from deeparc_tpu.io import make_hemisphere_rig
from deeparc_tpu.pipeline.incremental import bfs_cell_order, run_incremental
from deeparc_tpu.residuals.pose_graph import (
    PoseGraph,
    pose_graph_residuals,
    relative_pose,
    solve_pose_graph,
)


def _random_poses(rng, n):
    rot = rng.normal(scale=0.5, size=(n, 3))
    trans = rng.normal(scale=1.0, size=(n, 3))
    return np.concatenate([rot, trans], axis=1)


def _make_graph(poses, edges):
    i, j = edges[:, 0], edges[:, 1]
    rot = jnp.asarray(poses[:, :3])
    trans = jnp.asarray(poses[:, 3:])
    meas_rot, meas_trans = relative_pose(rot[i], trans[i], rot[j], trans[j])
    return PoseGraph(
        edges=jnp.asarray(edges, jnp.int32),
        meas_rot=meas_rot, meas_trans=meas_trans,
    )


def test_pose_graph_residuals_zero_at_truth():
    rng = np.random.default_rng(0)
    poses = _random_poses(rng, 6)
    edges = np.array([[i, (i + 1) % 6] for i in range(6)] + [[0, 3]])
    graph = _make_graph(poses, edges)
    r = pose_graph_residuals(jnp.asarray(poses.reshape(-1)), graph)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


def test_pose_graph_recovers_perturbed_poses():
    rng = np.random.default_rng(1)
    n = 8
    poses = _random_poses(rng, n)
    # chain + loop closures: odometry-style graph
    edges = np.array(
        [[i, i + 1] for i in range(n - 1)]
        + [[0, n - 1], [0, n // 2], [2, n - 2]]
    )
    graph = _make_graph(poses, edges)
    noisy = poses.copy()
    noisy[1:] += rng.normal(scale=0.05, size=(n - 1, 6))
    anchor = np.zeros(n, dtype=bool)
    anchor[0] = True  # gauge
    refined = solve_pose_graph(jnp.asarray(noisy), graph, jnp.asarray(anchor))
    r = pose_graph_residuals(refined.reshape(-1), graph)
    assert float(jnp.max(jnp.abs(r))) < 1e-8
    np.testing.assert_allclose(np.asarray(refined), poses, atol=1e-6)


def test_pose_graph_anchor_respected():
    rng = np.random.default_rng(2)
    poses = _random_poses(rng, 5)
    edges = np.array([[i, (i + 1) % 5] for i in range(5)])
    graph = _make_graph(poses, edges)
    noisy = poses + rng.normal(scale=0.03, size=poses.shape)
    anchor = np.zeros(5, dtype=bool)
    anchor[0] = True
    refined = solve_pose_graph(jnp.asarray(noisy), graph, jnp.asarray(anchor))
    np.testing.assert_array_equal(np.asarray(refined[0]), noisy[0])


def test_bfs_order_visits_all_cells_covisibility_first():
    rig = make_hemisphere_rig(n_arc=3, n_ring=6, n_points=60, seed=5)
    from deeparc_tpu.scene import from_deeparc
    from deeparc_tpu.solver.rig_grid import grid_from_scene

    scene = from_deeparc(rig.data)
    grid = grid_from_scene(scene)
    mask = np.asarray(grid.mask)
    order = bfs_cell_order(mask, mask.shape[1], start=0)
    assert sorted(order.tolist()) == list(range(mask.shape[1]))
    assert order[0] == 0


def test_incremental_converges_to_batch_quality():
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=5, n_points=56, pixel_noise=0.5, point_noise=0.04,
        seed=6,
    )
    opts = PipelineOptions(
        solver=SolverOptions(max_iterations=6, progress_to_stdout=False)
    )
    result = run_incremental(rig.data, opts, verbose=False)
    assert result.batches >= 2
    # full-problem quality: noise floor ~ sqrt(2)*0.5
    assert result.final_rmse_px < 1.0
    assert len(result.history) == result.batches
    costs = [h["cost"] for h in result.history]
    assert all(np.isfinite(costs))


import pytest


@pytest.mark.slow
def test_incremental_free_with_pose_graph_never_hurts():
    """Config 3 on a free-camera scene: incremental BA with the pose-graph
    stage wired in (run_incremental_free) must match or beat the same loop
    without it on a noisy-registration problem."""
    from deeparc_tpu.config import PipelineOptions, SolverOptions
    from deeparc_tpu.io.synthetic import make_bal_synthetic
    from deeparc_tpu.pipeline.incremental import run_incremental

    rig = make_bal_synthetic(
        n_cameras=8, n_points=80, track_length=5.0,
        pixel_noise=0.3, point_noise=0.02, ext_noise=0.01, seed=7,
    )
    opts = PipelineOptions(solver=SolverOptions(
        max_iterations=5, linear_solver="iterative_schur",
        cg_max_iterations=50,
    ))
    with_pg = run_incremental(rig.data, opts, batch_size=4, verbose=False,
                              pose_graph=True)
    without_pg = run_incremental(rig.data, opts, batch_size=4, verbose=False,
                                 pose_graph=False)
    assert with_pg.batches == without_pg.batches
    # pose-graph refinement improves (or at worst matches) the final fit
    assert with_pg.final_rmse_px <= without_pg.final_rmse_px * 1.02
    # and the incremental result is a genuinely adjusted scene
    assert with_pg.final_rmse_px < 2.0


def test_incremental_free_converges_to_full_solve_cost():
    """Config-3 parity bar (VERDICT r5 item 6): BFS incremental BA on a
    non-shared scene must land at (or below) the one-shot full-solve cost
    within a small multiple — the incremental path is a registration
    strategy, not a different objective (reference runs the same loop on
    the bfs dataset, src/sfm.cc:13-21 + ParameterBlock.hh:52-55)."""
    import dataclasses

    from deeparc_tpu.config import PipelineOptions, SolverOptions
    from deeparc_tpu.io.synthetic import make_bal_synthetic
    from deeparc_tpu.pipeline.incremental import run_incremental
    from deeparc_tpu.scene import freeze_masks, from_deeparc
    from deeparc_tpu.solver.tiles import solve_ba_tiles

    rig = make_bal_synthetic(
        n_cameras=6, n_points=60, track_length=4.0,
        pixel_noise=0.2, point_noise=0.01, ext_noise=0.005, seed=11,
    )
    sopts = SolverOptions(
        max_iterations=8, linear_solver="iterative_schur",
        cg_max_iterations=50,
    )
    inc = run_incremental(
        rig.data, PipelineOptions(solver=sopts), batch_size=2,
        verbose=False, pose_graph=True,
    )
    scene = from_deeparc(rig.data)
    full = solve_ba_tiles(scene, freeze_masks(scene), sopts)
    assert inc.batches == 3
    # same objective, same data: the incremental result must reach the
    # full-solve cost basin
    assert inc.final_cost <= full.cost * 1.5 + 1e-6
    assert inc.final_rmse_px < 1.0
