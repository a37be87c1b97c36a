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
) -> IncrementalResult:
    """Incremental BA over BFS-ordered camera cells (shared rigs).

    Each batch activates ``batch_size`` more cells (default: one ring's
    worth), runs a structure-only solve on the newly visible points
    (freeze_camera, the reference's pre-solve pattern sfm.cc:111), then a
    full BA over everything activated so far.
    """
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
