"""Pallas tile-sweep kernel (kernels/tile_pallas.py) parity vs the XLA
sweeps in solver/tiles.py. Interpret mode on CPU; the same code lowers
natively on TPU (benched by bench.py --engine tiles)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io.synthetic import make_bal_synthetic
from deeparc_tpu.kernels.tile_pallas import pack_bucket_planes, tile_sweep
from deeparc_tpu.residuals.reprojection import camera_dim, flatten_camera
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver.linalg import inv3x3
from deeparc_tpu.solver.tiles import (
    _e_dot_cells,
    _e_sweep,
    flat_to_cells,
    linearize_tiles,
    pack_cells,
    tiles_from_scene,
)

CHUNK = 64


@pytest.fixture(scope="module")
def sweep_problem():
    rig = make_bal_synthetic(
        n_cameras=10, n_points=90, track_length=5.0,
        pixel_noise=0.5, point_noise=0.03, seed=9,
    )
    scene = from_deeparc(rig.data, dtype=jnp.float64)
    free = freeze_masks(scene)
    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=CHUNK)
    from deeparc_tpu.solver.rig_grid import slot_params

    cam_free = flatten_camera(free)
    packed = pack_cells(slot_params(params_t, tiles.cells), tiles.cells,
                        cam_free)
    C = camera_dim(params_t)
    sys = linearize_tiles(params_t.points, packed, tiles, free_t, C, CHUNK)
    binv = inv3x3(sys.hpp + 0.1 * jnp.eye(3, dtype=jnp.float64))
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(C,)))
    v_cells = flat_to_cells(v, tiles.cells.cols)
    return tiles, sys, binv, v_cells


def _kernel_sweep_all(tiles, sys, binv, v_cells, mode):
    """Run the kernel per bucket and accumulate like _e_sweep does."""
    V = v_cells.shape[0]
    out = jnp.zeros((V, 18), jnp.float64)
    ev_rows = []
    offset = 0
    for b, blk in zip(tiles.buckets, sys.blocks):
        Nb, W = b.cell.shape
        cell_t, jcam_t, jx_t = pack_bucket_planes(blk.j_x, blk.j_cam, b.cell)
        binv_t = binv[offset: offset + Nb].reshape(Nb, 9).T
        gp_t = sys.g_p[offset: offset + Nb].T
        res = tile_sweep(cell_t, jcam_t, jx_t, binv_t, gp_t, v_cells,
                         mode=mode, block_n=128, interpret=True)
        if mode == "edot":
            ev_rows.append(res)
        else:
            out = out + res
        offset += Nb
    if mode == "edot":
        tail = sys.g_p.shape[0] - offset
        if tail > 0:
            ev_rows.append(jnp.zeros((tail, 3), jnp.float64))
        return jnp.concatenate(ev_rows)
    return out


@pytest.mark.parametrize("mode", ["rhs", "matvec", "edot"])
def test_tile_sweep_kernel_matches_xla(sweep_problem, mode):
    tiles, sys, binv, v_cells = sweep_problem
    if mode == "rhs":
        expected = _e_sweep(tiles, sys, binv, None, True, CHUNK)
    elif mode == "matvec":
        expected = _e_sweep(tiles, sys, binv, v_cells, False, CHUNK)
    else:
        expected = _e_dot_cells(tiles, sys, v_cells, CHUNK)
    got = _kernel_sweep_all(tiles, sys, binv, v_cells, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-10, atol=1e-12)


@pytest.fixture(scope="module")
def fused_problem():
    from deeparc_tpu.io.synthetic import make_bal_tile_device
    from deeparc_tpu.solver.rig_grid import slot_params

    # smallest shape that still exercises multi-chunk accumulation and
    # the local->global scatter: 2 chunks, W=4, V_local=8 (interpret-mode
    # execution cost scales with tiles x W-unroll)
    params, tiles, _, cam_free = make_bal_tile_device(
        n_cameras=24, n_points=128, track_length=3, window=8,
        chunk_obs=256, dtype=jnp.float64,
    )
    point_free = jnp.ones_like(params.points)
    C = camera_dim(params)
    packed = pack_cells(slot_params(params, tiles.cells), tiles.cells,
                        cam_free)
    return params, tiles, packed, point_free, C


def test_fused_linearize_matches_xla(fused_problem):
    """tile_linearize_local (fused Pallas linearize) == linearize_tiles on
    a tiny locality-blocked BAL problem, f64 interpret mode. The planes it
    emits must equal pack_bucket_planes of the XLA system's blocks."""
    from deeparc_tpu.solver.tiles import (
        fused_linearize_ok, linearize_tiles_fused,
    )

    params, tiles, packed, point_free, C = fused_problem
    assert fused_linearize_ok(tiles)

    ref = linearize_tiles(params.points, packed, tiles, point_free, C)
    sys_f, planes = linearize_tiles_fused(
        params.points, packed, tiles, point_free, C, interpret=True)

    np.testing.assert_allclose(sys_f.cost, ref.cost, rtol=1e-12)
    np.testing.assert_allclose(sys_f.g_p, ref.g_p, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(sys_f.hpp, ref.hpp, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(sys_f.g_c, ref.g_c, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(sys_f.hcc_cells, ref.hcc_cells,
                               rtol=1e-9, atol=1e-9)

    b, blk = tiles.buckets[0], ref.blocks[0]
    cell_t, jcam_t, jx_t = pack_bucket_planes(blk.j_x, blk.j_cam, b.loc[0])
    np.testing.assert_array_equal(planes[0][0], cell_t)
    np.testing.assert_allclose(planes[0][1], jcam_t, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(planes[0][2], jx_t, rtol=1e-9, atol=1e-12)
    r_t = blk.r.transpose(1, 2, 0).reshape(-1, blk.r.shape[0])
    np.testing.assert_allclose(planes[0][3], r_t, rtol=1e-9, atol=1e-12)


def test_bf16_sweep_planes_step(fused_problem):
    """Full LM step with bf16-stored sweep planes (sweep_dtype): the PCG
    direction is perturbed at bf16 resolution but the step must still be
    accepted and land within ~1e-2 relative of the f32-plane step — the
    traffic optimization must not change solver behavior."""
    import jax

    from deeparc_tpu.solver.tiles import init_tile_state, make_tile_step

    from deeparc_tpu.io.synthetic import make_bal_tile_device

    params32, tiles, _, cam_free = make_bal_tile_device(
        n_cameras=24, n_points=128, track_length=3, window=8,
        chunk_obs=256, point_noise=0.05, dtype=jnp.float32,
    )
    C = camera_dim(params32)
    point_free = jnp.ones_like(params32.points)
    cam_free = cam_free.at[:6].set(0.0)
    options = SolverOptions(linear_solver="iterative_schur",
                            cg_max_iterations=10)

    outs = {}
    for name, sd in (("f32", None), ("bf16", jnp.bfloat16)):
        step = make_tile_step(options, params32, impl="pallas",
                              sweep_dtype=sd)
        state = init_tile_state(params32, tiles, options, cam_free)
        state, info = jax.jit(step)(state, tiles, cam_free, point_free)
        outs[name] = (state, info)
    s32, i32 = outs["f32"]
    sbf, ibf = outs["bf16"]
    assert bool(i32.accepted) and bool(ibf.accepted)
    # the bf16 PCG direction differs at bf16 resolution (on the far-from-
    # converged first iterate the inexact-Newton direction is genuinely
    # ill-determined; with bf16 MXU operands the matvec itself is bf16-
    # rounded), so iterates are not pointwise comparable; solver BEHAVIOR
    # must match: same accept, equivalent cost reduction (both ~98% here),
    # and a step of the same scale. Convergence QUALITY is measured by the
    # BAL time-to-RMSE row (bench.py --time-to-rmse --bal --sweep-dtype
    # bf16), not this unit test.
    np.testing.assert_allclose(float(sbf.cost), float(s32.cost), rtol=0.05)
    np.testing.assert_allclose(float(ibf.step_norm), float(i32.step_norm),
                               rtol=0.35)


def test_fused_linearize_robust_loss(fused_problem):
    """Fused kernel parity under the cauchy loss (weights enter r and J)."""
    from deeparc_tpu.solver.tiles import linearize_tiles_fused

    params, tiles, packed, point_free, C = fused_problem
    ref = linearize_tiles(params.points, packed, tiles, point_free, C,
                          loss="cauchy", loss_scale=2.0)
    sys_f, _ = linearize_tiles_fused(
        params.points, packed, tiles, point_free, C,
        loss="cauchy", loss_scale=2.0, interpret=True)
    np.testing.assert_allclose(sys_f.cost, ref.cost, rtol=1e-12)
    np.testing.assert_allclose(sys_f.g_c, ref.g_c, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(sys_f.hcc_cells, ref.hcc_cells,
                               rtol=1e-9, atol=1e-9)
