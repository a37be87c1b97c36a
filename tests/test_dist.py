"""Distributed Schur tests on the virtual 8-device CPU mesh.

SURVEY.md section 4: sharded Schur must equal single-device Schur
bit-for-tolerance; runs under XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""

import jax
import numpy as np
import pytest

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io import make_hemisphere_rig
from deeparc_tpu.parallel import make_mesh, shard_scene, solve_ba_sharded
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver import solve_ba


@pytest.fixture(scope="module")
def problem():
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=6, n_points=120, pixel_noise=0.4, point_noise=0.04,
        seed=21,
    )
    scene = from_deeparc(rig.data)
    free = freeze_masks(scene)
    return scene, free


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_single_device(problem, n_dev):
    scene, free = problem
    assert len(jax.devices()) >= n_dev, "virtual device mesh missing"
    opts = SolverOptions(max_iterations=12)

    ref = solve_ba(scene.params, scene.index, free, opts, driver="while_loop")

    mesh = make_mesh(n_dev)
    sharded = shard_scene(scene, free, n_dev)
    out = solve_ba_sharded(sharded, opts, mesh)

    assert int(out.iterations) == ref.iterations
    np.testing.assert_allclose(float(out.cost), float(ref.cost), rtol=1e-9)
    # reassemble sharded points and compare to the single-device result
    pts = np.asarray(out.points).reshape(-1, 3)[: scene.n_points]
    np.testing.assert_allclose(
        pts, np.asarray(ref.params.points), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.cam_vec),
        np.asarray(
            __import__("deeparc_tpu.residuals", fromlist=["flatten_camera"])
            .flatten_camera(ref.params)
        ),
        rtol=1e-7, atol=1e-9,
    )


def test_shard_scene_partitions_all_observations(problem):
    scene, free = problem
    sharded = shard_scene(scene, free, 4)
    alive = sum(
        int(np.asarray(sharded.obs_mask[s]).sum()) for s in range(4)
    )
    assert alive == int(np.asarray(scene.index.obs_mask).sum())
    # every local point index within range
    assert (sharded.obs_point < sharded.points.shape[1]).all()


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_grid_matches_single_device_grid(problem, n_dev):
    """The distributed grid engine (points over the mesh, psum'd camera
    system) must reproduce the single-device grid solve."""
    from deeparc_tpu.parallel.sharded_grid import solve_ba_grid_sharded
    from deeparc_tpu.solver.rig_grid import grid_from_scene, solve_ba_grid

    scene, free = problem
    assert len(jax.devices()) >= n_dev, "virtual device mesh missing"
    opts = SolverOptions(max_iterations=10)
    grid = grid_from_scene(scene)

    ref = solve_ba_grid(scene.params, grid, free, opts, driver="while_loop",
                        chunk_size=32)
    mesh = make_mesh(n_dev)
    out = solve_ba_grid_sharded(scene.params, grid, free, opts, mesh,
                                chunk_size=16)

    assert out.iterations == ref.iterations
    np.testing.assert_allclose(out.cost, ref.cost, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(out.params.points), np.asarray(ref.params.points),
        rtol=1e-7, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(out.params.ext_rot), np.asarray(ref.params.ext_rot),
        rtol=1e-7, atol=1e-9,
    )
