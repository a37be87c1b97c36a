"""Fused Pallas linearization vs the plane-form XLA reference.

Runs the kernels in interpreter mode on CPU (the real-TPU path compiles the
same program); every output of ``kernels.linearize_grid`` must match
``rig_planes.linearize_planes`` bit-for-tolerance, including the E column
permutation (SURVEY.md section 7 stage 6).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deeparc_tpu.io import make_hemisphere_rig
from deeparc_tpu.kernels import cost_grid, linearize_grid, native_of_flat
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver.rig_grid import grid_from_scene, slot_params
from deeparc_tpu.solver.rig_planes import cost_planes, linearize_planes


@pytest.fixture(scope="module", params=[
    dict(focal_size=1, dist_size=0),
    dict(focal_size=2, dist_size=2),
])
def problem(request):
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=5, n_points=50, pixel_noise=0.5, point_noise=0.04,
        visibility=0.8, seed=31, **request.param,
    )
    scene = from_deeparc(rig.data)
    grid = grid_from_scene(scene)
    free = freeze_masks(scene)
    return scene, grid, free


def _free_tables(scene, grid, free):
    from deeparc_tpu.residuals.reprojection import flatten_camera

    cam_free = flatten_camera(free)
    R_rows = grid.onehot_outer.shape[1]
    K = grid.onehot_intr.shape[1]
    rows = cam_free[: 6 * R_rows].reshape(R_rows, 6)
    intr = cam_free[6 * R_rows:].reshape(K, 6)
    return rows[grid.slot_outer], rows[grid.slot_inner], intr[grid.slot_intr]


@pytest.mark.parametrize("loss,scale", [("trivial", 0.5), ("cauchy", 2.0)])
def test_linearize_matches_planes(problem, loss, scale):
    scene, grid, free = problem
    sp = slot_params(scene.params, grid)
    fo, fi, fk = _free_tables(scene, grid, free)
    pts = scene.params.points
    pf = free.points

    ref = linearize_planes(
        pts, sp, grid, grid.xy0, grid.xy1, grid.mask, fo, fi, fk, pf,
        loss=loss, loss_scale=scale,
    )
    got = linearize_grid(
        pts, pf, sp, grid, fo, fi, fk, loss=loss, loss_scale=scale,
        block_np=16, interpret=True,
    )
    cost_r, gp_r, hpp_r, gs_r, hcc_r, e_r = ref
    cost_g, gp_g, hpp_g, gs_g, hcc_g, e_g = got

    np.testing.assert_allclose(cost_g, cost_r, rtol=1e-9)
    np.testing.assert_allclose(gp_g, gp_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(hpp_g, hpp_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(gs_g, gs_r, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(hcc_g, hcc_r, rtol=1e-8, atol=1e-9)

    R_rows = grid.onehot_outer.shape[1]
    K = grid.onehot_intr.shape[1]
    e_flat = np.asarray(e_g)[..., native_of_flat(R_rows, K)]
    np.testing.assert_allclose(e_flat, np.asarray(e_r), rtol=1e-8, atol=1e-10)


def test_cost_matches_planes(problem):
    scene, grid, _ = problem
    sp = slot_params(scene.params, grid)
    ref = cost_planes(scene.params.points, sp, grid.xy0, grid.xy1, grid.mask,
                      loss="huber", loss_scale=3.0)
    got = cost_grid(scene.params.points, sp, grid, loss="huber",
                    loss_scale=3.0, block_np=16, interpret=True)
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_perm_roundtrip():
    from deeparc_tpu.kernels import flat_of_native

    R, K = 7, 3
    nof = native_of_flat(R, K)
    fon = flat_of_native(R, K)
    assert (fon[nof] == np.arange(6 * (R + K))).all()
    assert (nof[fon] == np.arange(6 * (R + K))).all()


def test_grid_step_pallas_matches_planes(problem):
    """Full LM step through the solver with impl='pallas' (interpreted on
    CPU) must produce the same accept decision, cost, and iterates as the
    plane-form XLA path — exercises the E native-order wiring end to end."""
    import jax

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.residuals.reprojection import flatten_camera
    from deeparc_tpu.solver.rig_grid import init_grid_state, make_grid_step

    scene, grid, free = problem
    options = SolverOptions(linear_solver="dense_schur")
    cam_free = flatten_camera(free)
    point_free = free.points

    outs = {}
    for impl in ("planes", "pallas"):
        step = make_grid_step(options, scene.params, chunk_size=32, impl=impl)
        state = init_grid_state(scene.params, grid, options)
        state, info = jax.jit(step)(state, grid, cam_free, point_free)
        state, info = jax.jit(step)(state, grid, cam_free, point_free)
        outs[impl] = (state, info)

    s_p, i_p = outs["planes"]
    s_k, i_k = outs["pallas"]
    assert bool(i_p.accepted) == bool(i_k.accepted)
    np.testing.assert_allclose(s_k.cost, s_p.cost, rtol=1e-6)
    np.testing.assert_allclose(s_k.points, s_p.points, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(s_k.cam_vec, s_p.cam_vec, rtol=1e-5, atol=1e-8)
