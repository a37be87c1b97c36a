"""Tests for the aux subsystems: checkpoint/resume, logging, profiling."""

import json

import numpy as np
import pytest

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io import make_hemisphere_rig
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver import solve_ba
from deeparc_tpu.utils import (
    JsonlLogger,
    load_solver_state,
    phase_timer,
    save_solver_state,
)
from deeparc_tpu.utils.profiling import phase_report, reset_phases


def _problem():
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=4, n_points=30, point_noise=0.05, pixel_noise=0.4,
        seed=31,
    )
    scene = from_deeparc(rig.data)
    return scene, freeze_masks(scene)


def test_checkpoint_roundtrip(tmp_path):
    scene, free = _problem()
    path = str(tmp_path / "state.npz")
    save_solver_state(path, scene.params, 123.0, 4.0, 7, 55.5)
    params, scal = load_solver_state(path)
    np.testing.assert_allclose(
        np.asarray(params.points), np.asarray(scene.params.points)
    )
    assert scal == {
        "radius": 123.0, "decrease_factor": 4.0, "iteration": 7, "cost": 55.5
    }


def test_solve_resume_from_checkpoint(tmp_path):
    scene, free = _problem()
    path = str(tmp_path / "ck.npz")
    opts = SolverOptions(max_iterations=3)
    a = solve_ba(
        scene.params, scene.index, free, opts,
        checkpoint_path=path, checkpoint_every=1,
    )
    # resume with a larger budget continues from iteration 3
    opts2 = SolverOptions(max_iterations=10)
    b = solve_ba(
        scene.params, scene.index, free, opts2,
        checkpoint_path=path, checkpoint_every=100, resume=True,
    )
    assert b.iterations >= 3
    assert float(b.cost) <= float(a.cost) + 1e-9


def test_jsonl_logger(tmp_path):
    scene, free = _problem()
    path = str(tmp_path / "log.jsonl")
    with JsonlLogger(path) as logger:
        solve_ba(
            scene.params, scene.index, free,
            SolverOptions(max_iterations=4), logger=logger,
        )
    records = [json.loads(line) for line in open(path)]
    assert len(records) >= 1
    assert all(r["event"] == "lm_iteration" for r in records)
    assert set(records[0]) >= {
        "iter", "cost", "grad_max", "radius", "rho", "accepted"
    }
    costs = [r["cost"] for r in records if r["accepted"]]
    assert costs == sorted(costs, reverse=True)


def test_phase_timer():
    reset_phases()
    with phase_timer("stage_a"):
        pass
    with phase_timer("stage_a"):
        pass
    rep = phase_report()
    assert rep["stage_a"]["count"] == 2


@pytest.mark.slow
def test_nan_debugging_fails_loudly_on_degenerate_point():
    """A point at z=0 hits the unguarded perspective divide
    (src/snavely_reprojection_error.hh:49-50); with the NaN-debug toggle on
    this must raise instead of silently propagating NaNs."""
    import jax.numpy as jnp
    import pytest

    from deeparc_tpu.residuals.reprojection import residuals as residuals_fn
    from deeparc_tpu.utils.debug import nan_debugging

    scene, free = _problem()
    # drive one point onto the z=0 plane of camera (0,0) (world frame ==
    # camera (0,0) frame, so world z=0 is exactly the degenerate depth)
    bad_points = scene.params.points.at[0].set(
        jnp.asarray([0.3, 0.3, 0.0], scene.params.points.dtype)
    )
    import dataclasses

    bad_params = dataclasses.replace(scene.params, points=bad_points)
    import jax

    # executables compiled before the toggle don't carry the NaN checks
    jax.clear_caches()
    with nan_debugging(True):
        with pytest.raises(FloatingPointError):
            r = residuals_fn(bad_params, scene.index)
            r.block_until_ready()
    # toggle restored: the same evaluation only produces NaNs silently
    r = residuals_fn(bad_params, scene.index)
    assert not bool(jnp.all(jnp.isfinite(r)))


def _grid_problem():
    from deeparc_tpu.solver.rig_grid import grid_from_scene

    scene, free = _problem()
    return scene, free, grid_from_scene(scene)


def test_grid_solve_resume_from_checkpoint(tmp_path):
    """Grid-engine driver parity: checkpoint/resume like solve_ba."""
    from deeparc_tpu.solver.rig_grid import solve_ba_grid

    scene, free, grid = _grid_problem()
    path = str(tmp_path / "ck_grid.npz")
    opts = SolverOptions(max_iterations=3)
    a = solve_ba_grid(scene.params, grid, free, opts, chunk_size=16,
                      checkpoint_path=path, checkpoint_every=1)
    opts2 = SolverOptions(max_iterations=10)
    b = solve_ba_grid(scene.params, grid, free, opts2, chunk_size=16,
                      checkpoint_path=path, checkpoint_every=100, resume=True)
    assert b.iterations >= 3
    assert float(b.cost) <= float(a.cost) + 1e-9


def test_grid_jsonl_logger_and_while_block(tmp_path):
    from deeparc_tpu.solver.rig_grid import solve_ba_grid
    from deeparc_tpu.utils import JsonlLogger

    scene, free, grid = _grid_problem()
    path = str(tmp_path / "grid_log.jsonl")
    with JsonlLogger(path) as logger:
        a = solve_ba_grid(scene.params, grid, free,
                          SolverOptions(max_iterations=4), chunk_size=16,
                          logger=logger)
    records = [json.loads(line) for line in open(path)]
    assert len(records) >= 1
    assert all(r["event"] == "lm_iteration" for r in records)
    # block-dispatched while_loop driver reaches the same state
    b = solve_ba_grid(scene.params, grid, free,
                      SolverOptions(max_iterations=4), chunk_size=16,
                      driver="while_loop", while_block=2)
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-9)
    assert b.iterations == a.iterations


def test_grid_while_loop_respects_max_seconds():
    from deeparc_tpu.solver.rig_grid import solve_ba_grid

    scene, free, grid = _grid_problem()
    # zero budget: the driver must stop after at most one block
    out = solve_ba_grid(scene.params, grid, free,
                        SolverOptions(max_iterations=100, max_seconds=0.0),
                        chunk_size=16, driver="while_loop", while_block=2)
    assert out.iterations == 0


def test_tiles_solve_resume_and_logger(tmp_path):
    """Tile-engine driver parity: checkpoint/resume + JSONL logging.

    Checkpoints are written in ORIGINAL point order (engine-agnostic
    sidecar); resume must re-permute into tile row space and continue
    from the saved trust-region state.
    """
    from deeparc_tpu.solver.tiles import solve_ba_tiles
    from deeparc_tpu.utils import JsonlLogger, load_solver_state

    scene, free = _problem()
    path = str(tmp_path / "ck_tiles.npz")
    log_path = str(tmp_path / "tiles_log.jsonl")
    opts = SolverOptions(max_iterations=3)
    with JsonlLogger(log_path) as logger:
        a = solve_ba_tiles(scene, free, opts, chunk_obs=16,
                           checkpoint_path=path, checkpoint_every=1,
                           logger=logger)
    records = [json.loads(line) for line in open(log_path)]
    assert len(records) == a.iterations
    assert all(r["event"] == "lm_iteration" for r in records)
    # the sidecar holds original-order points (same count as the scene)
    ck_params, scal = load_solver_state(path)
    assert ck_params.points.shape == scene.params.points.shape
    assert scal["iteration"] == a.iterations
    b = solve_ba_tiles(scene, free, SolverOptions(max_iterations=10),
                       chunk_obs=16, checkpoint_path=path,
                       checkpoint_every=100, resume=True)
    assert b.iterations >= 3
    assert float(b.cost) <= float(a.cost) + 1e-9


def test_tiles_while_loop_blocked_driver_matches():
    from deeparc_tpu.solver.tiles import solve_ba_tiles

    scene, free = _problem()
    a = solve_ba_tiles(scene, free, SolverOptions(max_iterations=4),
                       chunk_obs=16)
    b = solve_ba_tiles(scene, free, SolverOptions(max_iterations=4),
                       chunk_obs=16, driver="while_loop", while_block=2)
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-9)
    assert b.iterations == a.iterations
    # zero wall-clock budget stops before the first block
    c = solve_ba_tiles(scene, free,
                       SolverOptions(max_iterations=100, max_seconds=0.0),
                       chunk_obs=16, driver="while_loop", while_block=2)
    assert c.iterations == 0


def test_sharded_grid_operational_parity(tmp_path):
    """The SHARDED grid solver honors max_seconds, checkpoints between
    blocks, resumes, and logs per block (VERDICT r2 task 5) on the virtual
    8-device mesh."""
    from deeparc_tpu.parallel.sharded_ba import make_mesh
    from deeparc_tpu.parallel.sharded_grid import solve_ba_grid_sharded
    from deeparc_tpu.utils import JsonlLogger, load_solver_state

    scene, free, grid = _grid_problem()
    mesh = make_mesh(4)
    path = str(tmp_path / "ck_sharded.npz")
    log_path = str(tmp_path / "sharded_log.jsonl")

    # zero budget: must stop before running a single block
    out0 = solve_ba_grid_sharded(
        scene.params, grid, free,
        SolverOptions(max_iterations=100, max_seconds=0.0),
        mesh=mesh, chunk_size=16, while_block=2)
    assert out0.iterations == 0

    with JsonlLogger(log_path) as logger:
        a = solve_ba_grid_sharded(
            scene.params, grid, free, SolverOptions(max_iterations=4),
            mesh=mesh, chunk_size=16, while_block=2,
            checkpoint_path=path, logger=logger)
    records = [json.loads(line) for line in open(log_path)]
    assert len(records) >= 2 and all(r["event"] == "lm_block"
                                     for r in records)
    ck_params, scal = load_solver_state(path)
    assert ck_params.points.shape == scene.params.points.shape
    assert scal["iteration"] == a.iterations

    b = solve_ba_grid_sharded(
        scene.params, grid, free, SolverOptions(max_iterations=8),
        mesh=mesh, chunk_size=16, while_block=2,
        checkpoint_path=path, resume=True)
    assert b.iterations >= a.iterations
    assert float(b.cost) <= float(a.cost) + 1e-9


def test_sharded_tiles_operational_parity(tmp_path):
    """Same guarantees for the sharded tile solver."""
    from deeparc_tpu.parallel.sharded_ba import make_mesh
    from deeparc_tpu.parallel.sharded_tiles import solve_ba_tiles_sharded
    from deeparc_tpu.residuals.reprojection import flatten_camera
    from deeparc_tpu.solver.tiles import tiles_from_scene
    from deeparc_tpu.utils import JsonlLogger

    scene, free = _problem()
    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=16)
    cam_free = flatten_camera(free)
    mesh = make_mesh(4)
    path = str(tmp_path / "ck_tiles_sh.npz")
    log_path = str(tmp_path / "tiles_sh_log.jsonl")
    opts = SolverOptions(linear_solver="iterative_schur",
                         cg_max_iterations=40, max_iterations=4)
    with JsonlLogger(log_path) as logger:
        a = solve_ba_tiles_sharded(
            params_t, tiles, free_t, cam_free, opts, mesh=mesh,
            chunk_obs=16, while_block=2, checkpoint_path=path,
            logger=logger)
    records = [json.loads(line) for line in open(log_path)]
    assert len(records) >= 2 and all(r["event"] == "lm_block"
                                     for r in records)
    b = solve_ba_tiles_sharded(
        params_t, tiles, free_t, cam_free,
        SolverOptions(linear_solver="iterative_schur",
                      cg_max_iterations=40, max_iterations=8),
        mesh=mesh, chunk_obs=16, while_block=2,
        checkpoint_path=path, resume=True)
    assert b.iterations >= a.iterations
    assert float(b.cost) <= float(a.cost) + 1e-9
