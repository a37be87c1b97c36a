"""Pipeline tests: filtering semantics, compaction, end-to-end driver, CLI."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from deeparc_tpu.config import FilterOptions, PipelineOptions, SolverOptions
from deeparc_tpu.io import make_hemisphere_rig, read_deeparc
from deeparc_tpu.pipeline import filter_outliers, run_pipeline
from deeparc_tpu.residuals import residuals
from deeparc_tpu.scene import compact, from_deeparc


def _scene(**kw):
    rig = make_hemisphere_rig(n_arc=3, n_ring=4, n_points=40, seed=11, **kw)
    return rig, from_deeparc(rig.data)


def test_filter_removes_high_error_observations():
    rig, scene = _scene(pixel_noise=0.1)
    # corrupt a handful of measurements -> large residuals
    xy = np.asarray(scene.index.obs_xy).copy()
    xy[:5] += 40.0
    scene = dataclasses.replace(
        scene, index=dataclasses.replace(scene.index, obs_xy=jnp.asarray(xy))
    )
    filtered, stats = filter_outliers(
        scene, np.zeros(3), 1e9, FilterOptions(error_boundary=5.0)
    )
    mask = np.asarray(filtered.index.obs_mask)
    assert (mask[:5] == 0).all()
    assert mask[5:].sum() == scene.n_obs - 5


def test_filter_parity_inverted_reproduces_reference_direction():
    """parity mode removes the WELL-fitting observations (mse < boundary),
    literally as DeepArcManager.cc:347-349."""
    rig, scene = _scene(pixel_noise=0.1)
    filtered, stats = filter_outliers(
        scene, np.zeros(3), 1e9,
        FilterOptions(error_boundary=5.0, parity_inverted=True),
    )
    # everything fits well (0.1 px noise), so parity mode kills everything
    assert int(stats.obs_alive) == 0
    assert int(stats.points_alive) == 0


def test_filter_hemisphere_cut_cascades_to_observations():
    rig, scene = _scene()
    pts = np.asarray(scene.params.points).copy()
    pts[3] = [100.0, 100.0, 100.0]  # fling one point far away
    scene = dataclasses.replace(
        scene, params=dataclasses.replace(scene.params, points=jnp.asarray(pts))
    )
    # hemisphere centered at the object, r^2 = 4 -> cut at d^2 > 2
    filtered, stats = filter_outliers(
        scene, np.array([0.0, 0.0, 2.0]), 4.0,
        FilterOptions(error_boundary=1e9),
    )
    pm = np.asarray(filtered.index.point_mask)
    assert pm[3] == 0
    om = np.asarray(filtered.index.obs_mask)
    op = np.asarray(scene.index.obs_point)
    assert (om[op == 3] == 0).all()
    # near-object points survive
    assert pm.sum() == scene.n_points - 1


def test_compact_drops_dead_and_reindexes():
    rig, scene = _scene()
    filtered, _ = filter_outliers(
        scene, np.array([0.0, 0.0, 2.0]), 4.0, FilterOptions(error_boundary=1e9)
    )
    pts_before = np.asarray(filtered.index.point_mask).sum()
    c = compact(filtered, obs_bucket=64, point_bucket=16)
    assert c.n_points % 16 == 0
    assert c.n_obs % 64 == 0
    assert np.asarray(c.index.point_mask).sum() == pts_before
    # residuals of live observations unchanged by compaction
    r_old = np.asarray(residuals(filtered.params, filtered.index))
    r_new = np.asarray(residuals(c.params, c.index))
    alive_old = np.asarray(filtered.index.obs_mask) > 0.5
    alive_new = np.asarray(c.index.obs_mask) > 0.5
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(r_old[alive_old], axis=1)),
        np.sort(np.linalg.norm(r_new[alive_new], axis=1)),
        atol=1e-12,
    )


def test_end_to_end_pipeline_writes_loadable_output(tmp_path):
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=6, n_points=150, pixel_noise=0.5, point_noise=0.03,
        seed=12,
    )
    opts = PipelineOptions(
        solver=SolverOptions(max_iterations=20, progress_to_stdout=False),
    )
    result = run_pipeline(
        rig.data, opts, output_dir=str(tmp_path), basename="t", verbose=False
    )
    # converged near the noise floor (0.5 px/axis -> ~0.7 px rmse over 2 dims)
    assert result.final_rmse_px < 1.0
    assert result.filter_rounds >= 1
    out = read_deeparc(str(tmp_path / "t_output.deeparc"))
    assert out.n_points == int(np.asarray(result.scene.index.point_mask).sum())
    assert (tmp_path / "t_init.ply").exists()
    assert (tmp_path / "t_clear.ply").exists()
    assert (tmp_path / "t_state.json").exists()
    # the output is itself a valid restart checkpoint
    scene2 = from_deeparc(out)
    r = residuals(scene2.params, scene2.index)
    rmse2 = float(jnp.sqrt(jnp.mean(jnp.sum(r * r, axis=-1))))
    assert rmse2 < 1.5


def test_cli_smoke(tmp_path, capsys):
    from deeparc_tpu.pipeline.cli import main

    rc = main([
        "--synthetic", "--n-arc", "3", "--n-ring", "4", "--n-points", "60",
        "--pixel-noise", "0.3", "--max-iterations", "10",
        "-o", str(tmp_path), "--quiet",
    ])
    assert rc == 0
    captured = capsys.readouterr()
    assert "done:" in captured.out
    assert (tmp_path / "synthetic_output.deeparc").exists()


@pytest.mark.slow
def test_grid_and_indexed_pipelines_agree(tmp_path):
    import dataclasses as dc

    rig = make_hemisphere_rig(
        n_arc=3, n_ring=5, n_points=80, pixel_noise=0.6, point_noise=0.04,
        seed=41,
    )
    base = PipelineOptions(
        solver=SolverOptions(max_iterations=25, progress_to_stdout=False),
        write_snapshots=False,
    )
    res_grid = run_pipeline(
        rig.data, dc.replace(base, engine="grid"), verbose=False
    )
    res_idx = run_pipeline(
        rig.data, dc.replace(base, engine="indexed"), verbose=False
    )
    assert res_grid.filter_rounds == res_idx.filter_rounds
    np.testing.assert_allclose(
        res_grid.final_rmse_px, res_idx.final_rmse_px, rtol=1e-5
    )
    n_grid = int(np.asarray(res_grid.scene.index.point_mask).sum())
    n_idx = int(np.asarray(res_idx.scene.index.point_mask).sum())
    assert n_grid == n_idx


def test_grid_driver_multi_round_filtering_with_snapshots(tmp_path):
    """>=2 grid filter rounds with snapshots on: pins the driver's
    late-binding closures (run_solve/run_filter/point_free_of capture
    ``scene``/``grid`` which are REASSIGNED each round,
    pipeline/driver.py:159-210) and the per-round snapshot/sidecar paths.

    Multi-round removal is forced with the reference-literal
    ``parity_inverted`` filter (DeepArcManager.cc:347-349 removes the
    WELL-fitting observations) on a rig with noisy camera init: round 0's
    freeze solve leaves most residuals above the boundary (camera error
    dominates, points-only BA cannot fix it) so little is removed; round
    1's full BA fixes the cameras, the survivors now fit well, and parity
    mode removes them — the point count changes again, so the loop takes a
    further round to stabilize. A converging solve + a
    fit-quality-dependent filter is exactly the coupling the closures must
    track across reassignments."""
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=6, n_points=120, pixel_noise=0.3, point_noise=0.05,
        ext_noise=0.01, visibility=0.4, seed=7,
    )
    opts = PipelineOptions(
        engine="grid",
        solver=SolverOptions(max_iterations=12, progress_to_stdout=False),
        filter=FilterOptions(error_boundary=2.0, parity_inverted=True),
        max_filter_rounds=8,
    )
    result = run_pipeline(
        rig.data, opts, output_dir=str(tmp_path), basename="m", verbose=False
    )
    assert result.filter_rounds >= 2, result.filter_rounds
    # one snapshot per round, all non-empty
    for step in range(result.filter_rounds + 1):
        p = tmp_path / f"m_adjust_point_{step}.ply"
        assert p.exists() and p.stat().st_size > 0, p
    import json as _json

    sidecar = _json.loads((tmp_path / "m_state.json").read_text())
    assert sidecar["round"] == result.filter_rounds
    # masks stayed consistent across reassignments: grid-space live counts
    # equal the scene-space ones the sidecar recorded
    assert sidecar["points_alive"] == int(
        np.asarray(result.scene.index.point_mask).sum())
    # and the final scene still converges/export-parses
    out = read_deeparc(str(tmp_path / "m_output.deeparc"))
    assert out.n_points == sidecar["points_alive"]


@pytest.mark.slow
def test_random_point_init_recovers_structure():
    """Config 2 (teabottle_green_randompoint): structure initialized
    uniformly at random in the object box must converge to the same minimum
    as near-truth init, via the reference's freeze-camera pre-solve
    (src/sfm.cc:111 exists precisely for this)."""
    import dataclasses

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_hemisphere_rig
    from deeparc_tpu.scene import freeze_masks, from_deeparc
    from deeparc_tpu.solver.rig_grid import grid_from_scene, solve_ba_grid

    common = dict(n_arc=3, n_ring=6, n_points=60, pixel_noise=0.4, seed=21)
    rig_rand = make_hemisphere_rig(random_points=True, **common)
    rig_near = make_hemisphere_rig(point_noise=0.02, **common)

    def solve(rig):
        scene = from_deeparc(rig.data)
        grid = grid_from_scene(scene)
        opts = SolverOptions(max_iterations=100)
        # triangulation-only pre-solve, then full BA (the reference pipeline)
        pre = solve_ba_grid(scene.params, grid,
                            freeze_masks(scene, freeze_camera=True), opts,
                            chunk_size=16)
        out = solve_ba_grid(pre.params, grid, freeze_masks(scene), opts,
                            chunk_size=16)
        return out

    a = solve(rig_rand)
    b = solve(rig_near)
    # same minimum from a random basin start (the trust region's robustness
    # claim); tolerance covers a handful of stray points caught in local
    # minima out of 60
    import numpy as np  # noqa: F401
    assert a.cost <= b.cost * 1.05, (a.cost, b.cost)


def test_bal_scene_pipeline_uses_tiles(tmp_path, capsys):
    """Non-shared scenes route to the tile engine under engine='auto' and
    the full solve/filter pipeline runs end to end (VERDICT r2 task 2)."""
    import dataclasses as dc

    from deeparc_tpu.config import (
        FilterOptions, PipelineOptions, SolverOptions,
    )
    from deeparc_tpu.io.deeparc_format import read_deeparc
    from deeparc_tpu.io.synthetic import make_bal_synthetic
    from deeparc_tpu.pipeline.driver import run_pipeline

    rig = make_bal_synthetic(
        n_cameras=10, n_points=150, track_length=5.0,
        pixel_noise=0.5, point_noise=0.05, seed=7,
    )
    opts = PipelineOptions(
        solver=SolverOptions(
            linear_solver="iterative_schur", max_iterations=8,
            cg_max_iterations=40, progress_to_stdout=False,
        ),
        filter=FilterOptions(error_boundary=5.0, hemisphere_cut=True),
        max_filter_rounds=3,
    )
    out_dir = str(tmp_path / "bal_out")
    result = run_pipeline(rig.data, opts, output_dir=out_dir,
                          basename="bal", verbose=True)
    captured = capsys.readouterr().out
    assert "engine=tiles" in captured
    assert result.final_rmse_px < 2.0   # 0.5 px/axis noise floor ~ 0.7
    # the written .deeparc is loadable and consistent
    back = read_deeparc(out_dir + "/bal_output.deeparc")
    assert back.obs_point.shape[0] > 0
    assert not back.share_extrinsic

    # the indexed engine agrees on the same problem
    res_idx = run_pipeline(
        rig.data, dc.replace(opts, engine="indexed"), verbose=False)
    assert abs(result.final_rmse_px - res_idx.final_rmse_px) < 0.2


def test_bal_file_cli_roundtrip(tmp_path):
    """A real .bal FILE through the CLI exercises read_bal -> tiles engine
    -> refined output (the config-5 entry path, cli.py)."""
    import numpy as np  # noqa: F401

    rng = np.random.default_rng(1)
    n_cam, n_pts, track = 6, 80, 4
    rho, f = 4.0, 500.0
    # BAL convention: P = R X + t, p = -P / P.z (cameras look down -z)
    rots = 0.05 * rng.normal(size=(n_cam, 3))
    ts = np.stack([
        0.3 * rng.normal(size=n_cam), 0.3 * rng.normal(size=n_cam),
        -rho + 0.2 * rng.normal(size=n_cam)], axis=1)
    X = 0.5 * rng.normal(size=(n_pts, 3))

    def aa_rot(aa, x):
        th = np.linalg.norm(aa)
        if th < 1e-12:
            return x
        w = aa / th
        return (x * np.cos(th) + np.cross(w, x) * np.sin(th)
                + w * (w @ x) * (1 - np.cos(th)))

    lines = []
    obs = []
    for i in range(n_pts):
        cams = rng.choice(n_cam, size=track, replace=False)
        for c in cams:
            P = aa_rot(rots[c], X[i]) + ts[c]
            p = -P[:2] / P[2]
            uv = f * p + 0.3 * rng.normal(size=2)
            obs.append((c, i, uv[0], uv[1]))
    lines.append(f"{n_cam} {n_pts} {len(obs)}")
    lines += [f"{c} {i} {u:.6f} {v:.6f}" for c, i, u, v in obs]
    for c in range(n_cam):
        for val in (*rots[c], *ts[c], f, 0.0, 0.0):
            lines.append(f"{val:.12f}")
    noisy = X + 0.02 * rng.normal(size=X.shape)
    for i in range(n_pts):
        for val in noisy[i]:
            lines.append(f"{val:.12f}")
    bal_path = tmp_path / "toy.bal"
    bal_path.write_text("\n".join(lines) + "\n")

    from deeparc_tpu.pipeline.cli import main

    out_dir = str(tmp_path / "out")
    rc = main([str(bal_path), "-o", out_dir, "--max-iterations", "6",
               "--linear-solver", "iterative_schur", "--no-snapshots",
               "--quiet"])
    assert rc == 0
    import os

    assert os.path.exists(out_dir + "/toy_output.deeparc")


def test_sharded_tiles_pipeline(tmp_path, capsys):
    """engine='tiles-sharded': the FULL pipeline loop (freeze solve,
    solve/filter rounds, snapshots, export) with every solve SPMD over the
    virtual 8-device mesh (VERDICT r3 item 4). Must agree with the
    single-device tile pipeline on final RMSE."""
    import dataclasses as dc

    from deeparc_tpu.config import (
        FilterOptions, PipelineOptions, SolverOptions,
    )
    from deeparc_tpu.io.deeparc_format import read_deeparc
    from deeparc_tpu.io.synthetic import make_bal_synthetic
    from deeparc_tpu.pipeline.driver import run_pipeline

    rig = make_bal_synthetic(
        n_cameras=10, n_points=150, track_length=5.0,
        pixel_noise=0.5, point_noise=0.05, seed=7,
    )
    opts = PipelineOptions(
        solver=SolverOptions(
            linear_solver="iterative_schur", max_iterations=8,
            cg_max_iterations=40, progress_to_stdout=False,
        ),
        filter=FilterOptions(error_boundary=5.0, hemisphere_cut=True),
        max_filter_rounds=2,
        engine="tiles-sharded",
    )
    out_dir = str(tmp_path / "shard_out")
    result = run_pipeline(rig.data, opts, output_dir=out_dir,
                          basename="shard", verbose=True)
    captured = capsys.readouterr().out
    assert "mesh: 8 devices" in captured
    assert result.final_rmse_px < 2.0
    back = read_deeparc(out_dir + "/shard_output.deeparc")
    assert back.obs_point.shape[0] > 0

    res_single = run_pipeline(
        rig.data, dc.replace(opts, engine="tiles"), verbose=False)
    assert abs(result.final_rmse_px - res_single.final_rmse_px) < 0.1


def test_sharded_grid_pipeline(tmp_path, capsys):
    """engine='grid-sharded' on a shared rig: distributed solves inside the
    reference pipeline loop, output loadable, RMSE at the noise floor."""
    from deeparc_tpu.config import (
        FilterOptions, PipelineOptions, SolverOptions,
    )
    from deeparc_tpu.io.deeparc_format import read_deeparc
    from deeparc_tpu.pipeline.driver import run_pipeline

    rig = make_hemisphere_rig(
        n_arc=3, n_ring=6, n_points=120, pixel_noise=0.5, point_noise=0.03,
        seed=13,
    )
    opts = PipelineOptions(
        solver=SolverOptions(max_iterations=8, progress_to_stdout=False),
        filter=FilterOptions(error_boundary=5.0, hemisphere_cut=True),
        max_filter_rounds=2,
        engine="grid-sharded",
    )
    out_dir = str(tmp_path / "gshard_out")
    result = run_pipeline(rig.data, opts, output_dir=out_dir,
                          basename="gshard", verbose=True)
    captured = capsys.readouterr().out
    assert "mesh: 8 devices" in captured
    assert result.final_rmse_px < 1.5
    back = read_deeparc(out_dir + "/gshard_output.deeparc")
    assert back.obs_point.shape[0] > 0
