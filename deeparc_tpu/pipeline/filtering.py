"""Outlier filtering as mask updates (the reference's filterPoint3d).

Native equivalent of ``DeepArcManager::filterPoint3d``
(``src/DeepArcManager.cc:331-424``; call sites ``src/sfm.cc:112,122``) with
pointer surgery replaced by boolean masks over the flat scene
(SURVEY.md section 7 design stance). The four passes become three vectorized
mask updates:

  1. re-evaluate every live observation's residual with current parameters
     and mark observations by the per-observation MSE ``(r0^2 + r1^2) / 2``
     against ``error_boundary`` (cc:347-349). NOTE the reference removes
     observations with mse < boundary — an inverted-looking comparison
     (SURVEY.md section 2.4); the direction is an explicit option here,
     defaulting to the sane ``>``.
  2. points left with zero live observations die (``Point3d::empty``,
     cc:368-378).
  3. points farther than ``hemisphere_radius / 2`` in SQUARED distance from
     the hemisphere center die, cascading to their observations
     (cc:380-408; the fitted "radius" is r^2, hemisphere_radius.hh:26).

Physical compaction (the erase passes) happens separately in
``scene.compact`` between solves.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deeparc_tpu.config import FilterOptions
from deeparc_tpu.residuals.reprojection import residuals
from deeparc_tpu.scene import BAParams, Scene, SceneIndex


class FilterStats(NamedTuple):
    obs_alive: jnp.ndarray
    points_alive: jnp.ndarray


def filter_masks(
    params: BAParams,
    index: SceneIndex,
    hemisphere_center: jnp.ndarray,
    hemisphere_radius: jnp.ndarray,
    options: FilterOptions = FilterOptions(),
) -> tuple:
    """Compute updated (obs_mask, point_mask); pure jnp, jit-friendly."""
    r = residuals(params, index)
    mse = 0.5 * jnp.sum(r * r, axis=-1)
    if options.parity_inverted:
        # literal reference comparison, DeepArcManager.cc:348
        bad_obs = mse < options.error_boundary
    else:
        bad_obs = mse > options.error_boundary
    obs_mask = index.obs_mask * (1.0 - bad_obs.astype(index.obs_mask.dtype))

    n_points = index.point_mask.shape[0]
    live_counts = jax.ops.segment_sum(
        obs_mask, index.obs_point, num_segments=n_points
    )
    point_mask = index.point_mask * (live_counts > 0)

    if options.hemisphere_cut:
        d2 = jnp.sum((params.points - hemisphere_center[None, :]) ** 2, axis=-1)
        far = d2 > hemisphere_radius / 2.0
        point_mask = point_mask * (1.0 - far.astype(point_mask.dtype))

    # cascade: observations of dead points die (Point3d::total_link removal)
    obs_mask = obs_mask * point_mask[index.obs_point]
    return obs_mask, point_mask


def filter_outliers(
    scene: Scene,
    hemisphere_center,
    hemisphere_radius,
    options: FilterOptions = FilterOptions(),
) -> tuple:
    """Apply the filter to a Scene; returns (scene_with_new_masks, stats)."""
    obs_mask, point_mask = filter_masks(
        scene.params,
        scene.index,
        jnp.asarray(hemisphere_center, scene.params.points.dtype),
        jnp.asarray(hemisphere_radius, scene.params.points.dtype),
        options,
    )
    index = dataclasses.replace(
        scene.index, obs_mask=obs_mask, point_mask=point_mask
    )
    stats = FilterStats(
        obs_alive=jnp.sum(obs_mask).astype(jnp.int32),
        points_alive=jnp.sum(point_mask).astype(jnp.int32),
    )
    return dataclasses.replace(scene, index=index), stats


def filter_masks_tiles(
    points_t: jnp.ndarray,
    params: BAParams,
    tiles,
    hemisphere_center: jnp.ndarray,
    hemisphere_radius,
    options: FilterOptions = FilterOptions(),
):
    """Tile-row-space filterPoint3d: returns (new mask planes, row_mask).

    The ``filterPoint3d`` semantics (``src/DeepArcManager.cc:331-424``)
    evaluated on the tile engine's bucket planes, so the solve/filter loop
    runs at BAL scale without ever leaving the tile layout: (1) per-slot
    MSE against ``error_boundary`` (cc:347-349, threshold direction
    explicit), (2) rows with zero live slots die (cc:368-378), (3) the
    hemisphere distance cut with cascade to the row's slots (cc:380-408).
    Mask updates only — shapes never change, so repeated rounds reuse the
    compiled step.
    """
    import dataclasses as _dc

    from deeparc_tpu.solver.rig_grid import slot_params
    from deeparc_tpu.solver.tiles import pack_cells, tile_mse_planes

    params_rows = _dc.replace(params, points=points_t)
    sp = slot_params(params_rows, tiles.cells)
    cam_ones = jnp.ones(
        6 * params.ext_rot.shape[0] + 6 * params.center.shape[0],
        points_t.dtype)
    packed = pack_cells(sp, tiles.cells, cam_ones)
    mse_planes = tile_mse_planes(points_t, packed, tiles)

    new_masks = []
    live_rows = []
    offset = 0
    for b, mse in zip(tiles.buckets, mse_planes):
        if options.parity_inverted:
            bad = (mse < options.error_boundary) & (b.mask > 0.5)
        else:
            bad = mse > options.error_boundary
        m = b.mask * (1.0 - bad.astype(b.mask.dtype))
        new_masks.append(m)
        live_rows.append(jnp.sum(m, axis=1) > 0)
        offset += b.cell.shape[0]

    tail = points_t.shape[0] - offset
    if tail > 0:
        live_rows.append(jnp.zeros((tail,), bool))
    row_mask = jnp.concatenate(live_rows).astype(points_t.dtype)
    if options.hemisphere_cut:
        d2 = jnp.sum((points_t - hemisphere_center[None, :]) ** 2, axis=-1)
        far = d2 > hemisphere_radius / 2.0
        row_mask = row_mask * (1.0 - far.astype(row_mask.dtype))

    # cascade: slots of dead rows die
    out_masks = []
    off = 0
    for m in new_masks:
        nb = m.shape[0]
        out_masks.append(m * row_mask[off: off + nb, None])
        off += nb
    return tuple(out_masks), row_mask


def filter_masks_grid(
    params: BAParams,
    grid,
    hemisphere_center: jnp.ndarray,
    hemisphere_radius,
    options: FilterOptions = FilterOptions(),
):
    """Grid-space filterPoint3d: returns (grid_mask', point_mask').

    Same semantics as :func:`filter_masks` but evaluated on the dense
    (points x cells) grid — mask updates only, so repeated filter rounds
    never change array shapes (zero recompiles, unlike the reference's
    erase passes).
    """
    from deeparc_tpu.solver.rig_grid import grid_residuals, slot_params

    sp = slot_params(params, grid)
    r = grid_residuals(params.points, sp, grid)
    mse = 0.5 * jnp.sum(r * r, axis=-1)          # (N, T)
    if options.parity_inverted:
        bad = (mse < options.error_boundary) & (grid.mask > 0.5)
    else:
        bad = mse > options.error_boundary
    mask = grid.mask * (1.0 - bad.astype(grid.mask.dtype))

    point_mask = grid.point_mask * (jnp.sum(mask, axis=1) > 0)
    if options.hemisphere_cut:
        d2 = jnp.sum(
            (params.points - hemisphere_center[None, :]) ** 2, axis=-1
        )
        far = d2 > hemisphere_radius / 2.0
        point_mask = point_mask * (1.0 - far.astype(point_mask.dtype))
    mask = mask * point_mask[:, None]
    return mask, point_mask
