"""BFS-ordered incremental bundle adjustment (BASELINE.json config 3).

The reference's ``teabottle_green_bfs.deeparc`` is the same rig with
observations ordered breadth-first over the camera graph; the north star
promotes that to a capability: register cameras incrementally in BFS order
over the covisibility graph, bundle-adjusting after each activation batch,
with an optional pose-graph refinement stage between batches (non-shared
scenes).

On the grid engine this is free of data movement: activating cameras =
turning on columns of the (points x cells) visibility mask; every
incremental solve reuses the same compiled LM step.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from deeparc_tpu.config import PipelineOptions
from deeparc_tpu.io.deeparc_format import DeepArcData
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver.rig_grid import grid_from_scene, solve_ba_grid


class IncrementalResult(NamedTuple):
    scene: object
    batches: int
    order: np.ndarray        # BFS cell order
    final_cost: float
    final_rmse_px: float
    history: list            # per-batch dicts


def bfs_cell_order(mask: np.ndarray, n_cells: int, start: int = 0) -> np.ndarray:
    """BFS over the cell covisibility graph (cells sharing >= 1 point).

    ``mask`` is the (N, T) visibility grid. Returns a permutation of all
    cells; unreachable cells are appended in index order.
    """
    vis = mask > 0.5
    # covisibility counts between cells: (T, T) = vis^T vis
    covis = vis.T.astype(np.int64) @ vis.astype(np.int64)
    np.fill_diagonal(covis, 0)
    seen = np.zeros(n_cells, dtype=bool)
    order = []
    queue = [start]
    seen[start] = True
    while queue:
        c = queue.pop(0)
        order.append(c)
        neighbors = np.nonzero(covis[c] > 0)[0]
        # visit strongest-covisibility neighbors first (stable order)
        neighbors = neighbors[np.argsort(-covis[c][neighbors], kind="stable")]
        for n in neighbors:
            if not seen[n]:
                seen[n] = True
                queue.append(int(n))
    for c in range(n_cells):
        if not seen[c]:
            order.append(c)
    return np.asarray(order, dtype=np.int64)


def run_incremental(
    data: DeepArcData,
    options: PipelineOptions = PipelineOptions(),
    batch_size: int = None,
    dtype=jnp.float64,
    verbose: bool = True,
    pose_graph: bool = True,
) -> IncrementalResult:
    """Incremental BA over BFS-ordered cameras (BASELINE.json config 3).

    Shared rigs run on the grid engine (activating cameras = turning on
    visibility-mask columns). Non-shared (free-camera) scenes run on the
    tile engine with an optional POSE-GRAPH refinement stage between batches
    (``pose_graph=True``; see :func:`run_incremental_free`). Pose-graph
    refinement does not apply to shared rigs: their extrinsic records are
    globally coupled by rig sharing, a strictly stronger constraint than any
    pairwise pose graph.

    Each batch activates ``batch_size`` more cameras, runs a structure-only
    solve on the newly visible points (freeze_camera, the reference's
    pre-solve pattern sfm.cc:111), then a full BA over everything activated
    so far.
    """
    if not data.share_extrinsic:
        return run_incremental_free(
            data, options, batch_size=batch_size, dtype=dtype,
            verbose=verbose, pose_graph=pose_graph,
        )
    from deeparc_tpu.pipeline.driver import rmse_px

    log = print if verbose else (lambda *a, **k: None)
    scene = from_deeparc(data, dtype=dtype)
    if not scene.meta.share_extrinsic:
        raise ValueError("incremental grid BA requires a shared rig; "
                         "use pose-graph + indexed BA for free cameras")
    grid = grid_from_scene(scene)
    T = grid.mask.shape[1]
    full_mask = np.asarray(grid.mask)
    order = bfs_cell_order(full_mask, T, start=0)
    if batch_size is None:
        batch_size = scene.meta.ring_size

    active = np.zeros(T)
    history = []
    params = scene.params
    n_batches = -(-T // batch_size)
    for b in range(n_batches):
        newly = order[b * batch_size: (b + 1) * batch_size]
        active[newly] = 1.0
        masked_grid = grid._replace(
            mask=jnp.asarray(full_mask * active[None, :], params.points.dtype)
        )
        scene_b = dataclasses.replace(scene, params=params)
        # points with no active observation must stay frozen
        live = (full_mask * active[None, :]).sum(axis=1) > 0
        live = jnp.asarray(live, params.points.dtype)

        free_structure = freeze_masks(scene_b, freeze_camera=True)
        free_structure = dataclasses.replace(
            free_structure, points=free_structure.points * live[:, None]
        )
        res = solve_ba_grid(params, masked_grid, free_structure, options.solver)
        params = res.params

        free_full = freeze_masks(scene_b)
        free_full = dataclasses.replace(
            free_full, points=free_full.points * live[:, None]
        )
        res = solve_ba_grid(params, masked_grid, free_full, options.solver)
        params = res.params
        history.append({
            "batch": b, "active_cells": int(active.sum()),
            "cost": float(res.cost), "iterations": res.iterations,
        })
        log(f"[incremental] batch {b + 1}/{n_batches}: "
            f"{int(active.sum())}/{T} cells, cost={float(res.cost):.6e}, "
            f"iters={res.iterations}")

    scene = dataclasses.replace(scene, params=params)
    final_cost = history[-1]["cost"] if history else 0.0
    return IncrementalResult(
        scene=scene, batches=n_batches, order=order,
        final_cost=final_cost, final_rmse_px=rmse_px(scene),
    history=history,
    )


def camera_covisibility(scene) -> np.ndarray:
    """(C, C) counts of shared points between cameras (non-shared scenes:
    camera == outer extrinsic record)."""
    obs_cam = np.asarray(scene.index.obs_outer)
    obs_point = np.asarray(scene.index.obs_point)
    alive = np.asarray(scene.index.obs_mask) > 0.5
    C = scene.n_extrinsics
    vis = np.zeros((scene.n_points, C), dtype=np.int64)
    vis[obs_point[alive], obs_cam[alive]] = 1
    covis = vis.T @ vis
    np.fill_diagonal(covis, 0)
    return covis


def run_incremental_free(
    data: DeepArcData,
    options: PipelineOptions = PipelineOptions(),
    batch_size: int = None,
    dtype=jnp.float64,
    verbose: bool = True,
    pose_graph: bool = True,
    min_covis: int = 3,
) -> IncrementalResult:
    """Incremental BA for free-camera (non-shared) scenes on the tile engine,
    with pose-graph refinement between batches.

    Pose-graph stage (the odometry-memory pattern): when a camera pair first
    becomes covisible, the relative pose of the CURRENT estimates is
    snapshotted as that edge's measurement. Between batches, all registered
    camera poses are refined to stay consistent with every snapshot (gauge:
    camera record 0 anchored, matching ``src/sfm.cc:50-53``), redistributing
    drift accumulated by per-batch BA before the next full solve.
    """
    import jax

    from deeparc_tpu.pipeline.driver import rmse_px
    from deeparc_tpu.residuals.pose_graph import (
        PoseGraph, relative_pose, solve_pose_graph,
    )
    from deeparc_tpu.solver.tiles import solve_ba_tiles

    log = print if verbose else (lambda *a, **k: None)
    scene = from_deeparc(data, dtype=dtype)
    if scene.meta.share_extrinsic:
        raise ValueError("run_incremental_free is the non-shared path")
    C = scene.n_extrinsics
    covis = camera_covisibility(scene)
    order = bfs_cell_order_from_covis(covis)
    if batch_size is None:
        batch_size = max(C // 8, 1)

    obs_cam = np.asarray(scene.index.obs_outer)
    obs_point = np.asarray(scene.index.obs_point)
    full_obs_mask = np.asarray(scene.index.obs_mask)

    active = np.zeros(C, dtype=bool)
    snapshots = {}          # edge (i, j) -> (meas_rot, meas_trans) at capture
    history = []
    params = scene.params
    n_batches = -(-C // batch_size)
    for b in range(n_batches):
        newly = order[b * batch_size: (b + 1) * batch_size]
        active[newly] = True

        # capture pose-graph measurements for edges that just became active
        if pose_graph:
            act = np.nonzero(active)[0]
            ii, jj = np.meshgrid(act, act, indexing="ij")
            cand = (ii < jj) & (covis[ii, jj] >= min_covis)
            new_edges = [
                (int(a), int(b))
                for a, b in zip(ii[cand], jj[cand])
                if (int(a), int(b)) not in snapshots
            ]
            if new_edges:
                e = np.asarray(new_edges)
                rot_np = jnp.asarray(np.asarray(params.ext_rot))
                tr_np = jnp.asarray(np.asarray(params.ext_trans))
                mr, mt = relative_pose(
                    rot_np[e[:, 0]], tr_np[e[:, 0]],
                    rot_np[e[:, 1]], tr_np[e[:, 1]])
                mr, mt = np.asarray(mr), np.asarray(mt)
                for k, edge in enumerate(new_edges):
                    snapshots[edge] = (mr[k], mt[k])

        obs_mask_b = full_obs_mask * active[obs_cam]
        live_counts = np.bincount(
            obs_point[obs_mask_b > 0.5], minlength=scene.n_points)
        live = jnp.asarray(live_counts >= 2, dtype)

        index_b = dataclasses.replace(
            scene.index, obs_mask=jnp.asarray(obs_mask_b, dtype))
        scene_b = dataclasses.replace(scene, params=params, index=index_b)

        active_rows = jnp.asarray(
            np.concatenate([active.astype(float), [0.0]]), dtype)  # + identity

        # structure-only pre-solve on newly visible points (sfm.cc:111)
        free_structure = freeze_masks(scene_b, freeze_camera=True)
        free_structure = dataclasses.replace(
            free_structure, points=free_structure.points * live[:, None])
        res = solve_ba_tiles(scene_b, free_structure, options.solver)
        params = res.params
        scene_b = dataclasses.replace(scene_b, params=params)

        # pose-graph refinement over registered cameras
        if pose_graph and snapshots:
            edges = np.asarray(sorted(snapshots), dtype=np.int32)
            meas_rot = np.stack([snapshots[tuple(e)][0] for e in edges])
            meas_trans = np.stack([snapshots[tuple(e)][1] for e in edges])
            graph = PoseGraph(
                edges=jnp.asarray(edges),
                meas_rot=jnp.asarray(meas_rot, dtype),
                meas_trans=jnp.asarray(meas_trans, dtype),
            )
            poses0 = jnp.concatenate(
                [params.ext_rot[:C], params.ext_trans[:C]], axis=1)
            anchor = jnp.asarray(
                (~active) | (np.arange(C) == 0), bool)
            refined = solve_pose_graph(poses0, graph, anchor,
                                       max_iterations=20)
            params = dataclasses.replace(
                params,
                ext_rot=params.ext_rot.at[:C].set(refined[:, :3]),
                ext_trans=params.ext_trans.at[:C].set(refined[:, 3:]),
            )
            scene_b = dataclasses.replace(scene_b, params=params)

        # full BA over everything registered so far (inactive cameras frozen)
        free_full = freeze_masks(scene_b)
        free_full = dataclasses.replace(
            free_full,
            points=free_full.points * live[:, None],
            ext_rot=free_full.ext_rot * active_rows[:, None],
            ext_trans=free_full.ext_trans * active_rows[:, None],
        )
        res = solve_ba_tiles(scene_b, free_full, options.solver)
        params = res.params
        history.append({
            "batch": b, "active_cells": int(active.sum()),
            "cost": float(res.cost), "iterations": res.iterations,
        })
        log(f"[incremental-free] batch {b + 1}/{n_batches}: "
            f"{int(active.sum())}/{C} cameras, cost={float(res.cost):.6e}, "
            f"iters={res.iterations}")

    scene = dataclasses.replace(scene, params=params)
    final_cost = history[-1]["cost"] if history else 0.0
    return IncrementalResult(
        scene=scene, batches=n_batches, order=order,
        final_cost=final_cost, final_rmse_px=rmse_px(scene),
        history=history,
    )


def bfs_cell_order_from_covis(covis: np.ndarray, start: int = 0) -> np.ndarray:
    """BFS over an explicit covisibility-count matrix."""
    C = covis.shape[0]
    seen = np.zeros(C, dtype=bool)
    order = []
    queue = [start]
    seen[start] = True
    while queue:
        c = queue.pop(0)
        order.append(c)
        neighbors = np.nonzero(covis[c] > 0)[0]
        neighbors = neighbors[np.argsort(-covis[c][neighbors], kind="stable")]
        for n in neighbors:
            if not seen[n]:
                seen[n] = True
                queue.append(int(n))
    for c in range(C):
        if not seen[c]:
            order.append(c)
    return np.asarray(order, dtype=np.int64)
