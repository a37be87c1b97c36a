"""Tile engine (solver/tiles.py) parity vs the indexed engine.

The tile engine must reproduce the observation-list engine's math exactly
(same residual model, same LM law, same ITERATIVE_SCHUR solve) on ANY scene:
BAL-style non-shared camera graphs and shared-extrinsic rigs alike.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io.synthetic import make_bal_synthetic, make_hemisphere_rig
from deeparc_tpu.residuals.reprojection import flatten_camera
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver.ba import (
    init_state, make_step_pure, robust_cost, solve_ba,
)
from deeparc_tpu.solver.tiles import (
    init_tile_state,
    make_tile_step,
    solve_ba_tiles,
    tiles_from_scene,
    unpermute_points,
)

CHUNK = 256  # small enough that every bucket still spans 2+ chunks


@pytest.fixture(scope="module", params=["bal", "rig"])
def problem(request):
    if request.param == "bal":
        rig = make_bal_synthetic(
            n_cameras=12, n_points=150, track_length=5.0,
            pixel_noise=0.5, point_noise=0.03, seed=3,
        )
    else:
        rig = make_hemisphere_rig(
            n_arc=3, n_ring=5, n_points=80, pixel_noise=0.5,
            point_noise=0.03, visibility=0.7, seed=3,
        )
    scene = from_deeparc(rig.data)
    free = freeze_masks(scene)
    return scene, free


def test_tile_layout_roundtrip(problem):
    scene, free = problem
    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=CHUNK)
    # every original point appears exactly once in row space
    rows = np.asarray(tiles.row_of_point)
    assert np.unique(rows).size == scene.n_points
    back = unpermute_points(params_t.points, tiles)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(scene.params.points), rtol=0, atol=0)
    # observation count preserved
    n_slots = sum(float(jnp.sum(b.mask)) for b in tiles.buckets)
    assert int(n_slots) == scene.n_obs


def test_tile_cost_matches_indexed(problem):
    scene, free = problem
    opts = SolverOptions()
    tiles, params_t, _ = tiles_from_scene(scene, free, chunk_obs=CHUNK)
    st = init_tile_state(params_t, tiles, opts, flatten_camera(free),
                         chunk_obs=CHUNK)
    expected = robust_cost(scene.params, scene.index, opts)
    np.testing.assert_allclose(float(st.cost), float(expected), rtol=1e-12)


@pytest.mark.parametrize("loss", ["trivial", "cauchy"])
def test_tile_step_matches_indexed_step(problem, loss):
    scene, free = problem
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=40,
        cg_tolerance=1e-14, loss=loss,
    )
    cam_free = flatten_camera(free)

    i_step = jax.jit(make_step_pure(opts))
    i_state = init_state(scene.params, scene.index, opts)
    i_next, i_info = i_step(i_state, scene.index, cam_free, free.points)

    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=CHUNK)
    t_step = jax.jit(make_tile_step(opts, params_t, chunk_obs=CHUNK))
    t_state = init_tile_state(params_t, tiles, opts, cam_free,
                              chunk_obs=CHUNK)
    t_next, t_info = t_step(t_state, tiles, cam_free, free_t)

    np.testing.assert_allclose(
        float(t_info.cost), float(i_info.cost), rtol=1e-9)
    np.testing.assert_allclose(
        float(t_info.rho), float(i_info.rho), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(unpermute_points(t_next.points, tiles)),
        np.asarray(i_next.params.points), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(t_next.cam_vec),
        np.asarray(flatten_camera(i_next.params)), rtol=1e-7, atol=1e-10)


def test_tile_solve_reaches_same_minimum(problem):
    scene, free = problem
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=40,
        cg_tolerance=1e-12, max_iterations=25,
    )
    a = solve_ba(scene.params, scene.index, free, opts)
    b = solve_ba_tiles(scene, free, opts, chunk_obs=CHUNK)
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-6)


def test_tile_while_loop_driver(problem):
    scene, free = problem
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=60,
        max_iterations=5,
    )
    a = solve_ba_tiles(scene, free, opts, chunk_obs=CHUNK)
    b = solve_ba_tiles(scene, free, opts, driver="while_loop",
                       chunk_obs=CHUNK)
    np.testing.assert_allclose(float(b.cost), float(a.cost), rtol=1e-9)


def test_tile_freeze_camera_presolve(problem):
    """freeze_camera=True (the reference's triangulation-only pre-solve,
    src/sfm.cc:54-57) must leave every camera parameter bit-identical."""
    scene, free_all = problem
    free = freeze_masks(scene, freeze_camera=True)
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=40,
        max_iterations=3,
    )
    out = solve_ba_tiles(scene, free, opts, chunk_obs=CHUNK)
    np.testing.assert_array_equal(
        np.asarray(out.params.ext_rot), np.asarray(scene.params.ext_rot))
    np.testing.assert_array_equal(
        np.asarray(out.params.focal), np.asarray(scene.params.focal))
    assert float(out.cost) <= float(
        robust_cost(scene.params, scene.index, opts)) + 1e-9


@pytest.mark.parametrize("n_dev", [2, 8])
def test_tile_sharded_matches_single(problem, n_dev):
    """Distributed tile engine: row-sharded solve over an n-device mesh
    reproduces the single-device solve (cell-space psums only)."""
    from deeparc_tpu.parallel.sharded_ba import make_mesh
    from deeparc_tpu.parallel.sharded_tiles import solve_ba_tiles_sharded
    from deeparc_tpu.residuals.reprojection import flatten_camera

    scene, free = problem
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=60,
        max_iterations=4,
    )
    single = solve_ba_tiles(scene, free, opts, chunk_obs=CHUNK)

    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=CHUNK)
    sharded = solve_ba_tiles_sharded(
        params_t, tiles, free_t, flatten_camera(free), opts,
        mesh=make_mesh(n_dev), chunk_obs=CHUNK,
    )
    np.testing.assert_allclose(float(sharded.cost), float(single.cost),
                               rtol=1e-9)
    assert sharded.iterations == single.iterations
    np.testing.assert_allclose(
        np.asarray(sharded.params.ext_rot), np.asarray(single.params.ext_rot),
        rtol=1e-8, atol=1e-12)


def test_locality_blocking_matches_global(problem):
    """Local-table (TileBucket.loc) sweeps == global-table sweeps exactly
    (the blocking only reorders which MXU tiles do the lookups)."""
    scene, free = problem
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=40,
        max_iterations=3,
    )
    loc = solve_ba_tiles(scene, free, opts, chunk_obs=CHUNK)
    # strip loc + locality ordering: the global path
    from deeparc_tpu.parallel.sharded_ba import make_mesh  # noqa: F401

    import deeparc_tpu.solver.tiles as tiles_mod

    tiles, params_t, free_t = tiles_from_scene(
        scene, free, chunk_obs=CHUNK, locality=False)
    assert all(not b.loc for b in tiles.buckets)
    cam_free = flatten_camera(free)
    step = tiles_mod.make_tile_step(opts, params_t, CHUNK)
    state = init_tile_state(params_t, tiles, opts, cam_free, chunk_obs=CHUNK)
    import jax

    jit_step = jax.jit(step)
    for _ in range(3):
        state, _ = jit_step(state, tiles, cam_free, free_t)
    np.testing.assert_allclose(float(state.cost), float(loc.cost), rtol=1e-8)


def test_windowed_bal_generator_loc():
    """make_bal_tile_device(window=...) carries exact loc tables and the
    local-path step matches the loc-stripped global-path step."""
    import jax

    from deeparc_tpu.io.synthetic import make_bal_tile_device

    params, tiles, gt, cam_free = make_bal_tile_device(
        n_cameras=24, n_points=200, track_length=4, window=8,
        chunk_obs=CHUNK, dtype=jnp.float64,
    )
    b = tiles.buckets[0]
    assert b.loc, "windowed generator must attach loc tables"
    local, chunk_cells = b.loc
    # loc tables are consistent with the global cell plane
    rpc = b.cell.shape[0] // chunk_cells.shape[0]
    cells_np = np.asarray(b.cell)
    local_np = np.asarray(local)
    cc_np = np.asarray(chunk_cells)
    for c in range(cc_np.shape[0]):
        sl = slice(c * rpc, (c + 1) * rpc)
        np.testing.assert_array_equal(cc_np[c][local_np[sl]], cells_np[sl])

    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=30,
        max_iterations=2, min_relative_decrease=-1.0,
    )
    n_ext = params.ext_rot.shape[0]
    cam_free = cam_free.at[:6].set(0.0)
    cam_free = cam_free.at[6 * n_ext:].set(0.0)
    point_free = jnp.ones_like(params.points)

    step = make_tile_step(opts, params, CHUNK)
    st = init_tile_state(params, tiles, opts, cam_free, chunk_obs=CHUNK)
    st, _ = jax.jit(step)(st, tiles, cam_free, point_free)

    tiles_g = tiles._replace(buckets=(b._replace(loc=()),))
    st_g = init_tile_state(params, tiles_g, opts, cam_free, chunk_obs=CHUNK)
    st_g, _ = jax.jit(step)(st_g, tiles_g, cam_free, point_free)
    np.testing.assert_allclose(float(st.cost), float(st_g.cost), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(st.points), np.asarray(st_g.points), rtol=1e-8, atol=1e-12)


def test_rcm_cell_reordering_recovers_locality():
    """Cells are RCM-renumbered by co-visibility in tiles_from_scene: a
    windowed-co-visibility scene whose camera ids have been shuffled must
    still produce narrow per-chunk local tables (without the reordering
    every chunk would touch ~the whole camera list)."""
    from deeparc_tpu.io.deeparc_format import DeepArcData

    rng = np.random.default_rng(0)
    n_cam, n_pts, track, window = 64, 512, 4, 8
    latent_start = (np.arange(n_pts) * (n_cam - window)) // (n_pts - 1)
    cams_latent = np.stack([
        latent_start[i] + rng.choice(window, track, replace=False)
        for i in range(n_pts)
    ])
    shuffle = rng.permutation(n_cam)
    obs_cam = shuffle[cams_latent].reshape(-1).astype(np.int32)
    obs_point = np.repeat(np.arange(n_pts, dtype=np.int32), track)
    obs_xy = rng.uniform(100.0, 900.0, size=(obs_point.size, 2))
    data = DeepArcData(
        version=0.01, share_extrinsic=False, arc_size=n_cam, ring_size=0,
        obs_arc=obs_cam, obs_ring=obs_cam.copy(), obs_point=obs_point,
        obs_xy=obs_xy,
        center=np.tile([512.0, 512.0], (n_cam, 1)),
        focal=np.concatenate(
            [np.full((n_cam, 1), 800.0), np.zeros((n_cam, 1))], axis=1),
        focal_size=np.ones(n_cam, dtype=np.int32),
        dist=np.zeros((n_cam, 2)),
        dist_size=np.zeros(n_cam, dtype=np.int32),
        ext_rot=rng.normal(scale=0.1, size=(n_cam, 3)),
        ext_trans=np.concatenate(
            [rng.normal(scale=0.1, size=(n_cam, 2)),
             np.full((n_cam, 1), 3.0)], axis=1),
        points=rng.normal(scale=0.3, size=(n_pts, 3)),
        colors=rng.integers(0, 256, size=(n_pts, 3)).astype(np.int32),
    )
    scene = from_deeparc(data)
    free = freeze_masks(scene)
    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=512)
    b = tiles.buckets[0]
    assert b.loc, "locality blocking must engage after RCM reordering"
    local, chunk_cells = b.loc
    Vl = chunk_cells.shape[1]
    assert Vl <= 32, f"expected narrow local tables, got V_local={Vl}"
    # loc tables must stay consistent with the global cell plane
    rpc = b.cell.shape[0] // chunk_cells.shape[0]
    cells_np, local_np = np.asarray(b.cell), np.asarray(local)
    cc_np = np.asarray(chunk_cells)
    for c in range(cc_np.shape[0]):
        sl = slice(c * rpc, (c + 1) * rpc)
        np.testing.assert_array_equal(cc_np[c][local_np[sl]], cells_np[sl])


def test_dual_layout_step_matches_xla(problem):
    """impl='dual' (camera-major layout, no one-hot sweeps) reproduces the
    XLA one-hot step: same costs, same iterates, same accept decisions.
    The dual sweeps are a pure re-binning of identical per-slot algebra
    (solver/tiles.py dual-layout section)."""
    from deeparc_tpu.residuals.reprojection import flatten_camera
    from deeparc_tpu.solver.tiles import with_cam_layout

    scene, free = problem
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=40,
        min_relative_decrease=-1.0,
        function_tolerance=0.0, gradient_tolerance=0.0,
        parameter_tolerance=0.0,
    )
    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=CHUNK)
    tiles_d = with_cam_layout(tiles)
    cam_free = flatten_camera(free)

    step_x = make_tile_step(opts, params_t, chunk_obs=CHUNK, impl="xla")
    step_d = make_tile_step(opts, params_t, chunk_obs=CHUNK, impl="dual")
    sx = init_tile_state(params_t, tiles, opts, cam_free, chunk_obs=CHUNK)
    sd = init_tile_state(params_t, tiles_d, opts, cam_free, chunk_obs=CHUNK)
    for _ in range(3):
        sx, ix = step_x(sx, tiles, cam_free, free_t)
        sd, idl = step_d(sd, tiles_d, cam_free, free_t)
        np.testing.assert_allclose(float(sd.cost), float(sx.cost),
                                   rtol=1e-8)
        assert bool(idl.accepted) == bool(ix.accepted)
    np.testing.assert_allclose(np.asarray(sd.points),
                               np.asarray(sx.points), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sd.cam_vec),
                               np.asarray(sx.cam_vec), rtol=1e-6, atol=1e-9)


def test_hub_robust_locality_ordering():
    """Graph-partitioning fallback (VERDICT r5 item 5): a windowed scene
    CONTAMINATED with hub cameras (popular views seen by most points —
    they densify the co-visibility graph and wreck plain RCM bandwidth)
    must still produce narrow per-chunk tables: hubs are stripped before
    RCM, appended last, and excluded from the point locality key; the
    exact per-chunk tables absorb the few hub ids each chunk touches."""
    from deeparc_tpu.io.deeparc_format import DeepArcData
    from deeparc_tpu.residuals.reprojection import flatten_camera

    rng = np.random.default_rng(1)
    n_win, n_hub, n_pts, track, window = 96, 4, 768, 4, 8
    n_cam = n_win + n_hub
    latent_start = (np.arange(n_pts) * (n_win - window)) // (n_pts - 1)
    cams_latent = np.stack([
        np.concatenate([
            latent_start[i] + rng.choice(window, track - 1, replace=False),
            [n_win + rng.integers(n_hub)],      # one hub obs per point
        ]) for i in range(n_pts)
    ])
    shuffle = rng.permutation(n_cam)
    obs_cam = shuffle[cams_latent].reshape(-1).astype(np.int32)
    obs_point = np.repeat(np.arange(n_pts, dtype=np.int32), track)
    obs_xy = rng.uniform(100.0, 900.0, size=(obs_point.size, 2))
    data = DeepArcData(
        version=0.01, share_extrinsic=False, arc_size=n_cam, ring_size=0,
        obs_arc=obs_cam, obs_ring=obs_cam.copy(), obs_point=obs_point,
        obs_xy=obs_xy,
        center=np.tile([512.0, 512.0], (n_cam, 1)),
        focal=np.concatenate(
            [np.full((n_cam, 1), 800.0), np.zeros((n_cam, 1))], axis=1),
        focal_size=np.ones(n_cam, dtype=np.int32),
        dist=np.zeros((n_cam, 2)),
        dist_size=np.zeros(n_cam, dtype=np.int32),
        ext_rot=rng.normal(scale=0.1, size=(n_cam, 3)),
        ext_trans=np.concatenate(
            [rng.normal(scale=0.1, size=(n_cam, 2)),
             np.full((n_cam, 1), 3.0)], axis=1),
        points=rng.normal(scale=0.3, size=(n_pts, 3)),
        colors=rng.integers(0, 256, size=(n_pts, 3)).astype(np.int32),
    )
    scene = from_deeparc(data)
    free = freeze_masks(scene)
    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=512)
    b = tiles.buckets[0]
    assert b.loc, "locality blocking must engage despite the hubs"
    Vl = b.loc[1].shape[1]
    assert Vl <= 64, f"hub-robust ordering must stay narrow, V_local={Vl}"

    # correctness: hub-ordered localized step == locality-free global step
    opts = SolverOptions(
        linear_solver="iterative_schur", cg_max_iterations=40,
        min_relative_decrease=-1.0, function_tolerance=0.0,
        gradient_tolerance=0.0, parameter_tolerance=0.0,
    )
    cam_free = flatten_camera(free)
    tiles_g, params_g, free_g = tiles_from_scene(
        scene, free, chunk_obs=512, locality=False)
    step_l = make_tile_step(opts, params_t, chunk_obs=512)
    step_g = make_tile_step(opts, params_g, chunk_obs=512)
    sl = init_tile_state(params_t, tiles, opts, cam_free, chunk_obs=512)
    sg = init_tile_state(params_g, tiles_g, opts, cam_free, chunk_obs=512)
    for _ in range(2):
        sl, _ = step_l(sl, tiles, cam_free, free_t)
        sg, _ = step_g(sg, tiles_g, cam_free, free_g)
        np.testing.assert_allclose(float(sl.cost), float(sg.cost),
                                   rtol=1e-9)


def test_bal_windowed_host_generator():
    """make_bal_windowed_host: geometrically consistent (initial RMSE ~
    focal * point_noise / rho), hub-contaminated, id-shuffled — and
    tiles_from_scene recovers narrow chunk tables from it."""
    from deeparc_tpu.io.synthetic import make_bal_windowed_host
    from deeparc_tpu.residuals import cost as scene_cost

    d = make_bal_windowed_host(
        n_cameras=256, n_points=4000, track_length=8, window=48,
        n_hubs=4, hub_frac=0.15, pixel_noise=0.0, point_noise=0.0, seed=5)
    scene = from_deeparc(d)
    c = float(scene_cost(scene.params, scene.index))
    # noise-free: exact reprojections
    assert c < 1e-6 * d.n_obs
    free = freeze_masks(scene)
    tiles, params_t, free_t = tiles_from_scene(scene, free, chunk_obs=2048)
    b = tiles.buckets[0]
    assert b.loc, "hub-robust locality must engage"
    assert b.loc[1].shape[1] <= 128, b.loc[1].shape
