#!/usr/bin/env python
"""Sub-phase timing inside the plane-form linearization (one chunk)."""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from deeparc_tpu.io.synthetic import make_grid_rig_device
    from deeparc_tpu.solver import rig_grid as rg
    from deeparc_tpu.solver import rig_planes as rp

    print(f"device: {jax.devices()[0]}", flush=True)
    params, grid, _ = make_grid_rig_device(
        n_arc=8, n_ring=24, n_points=args.n_points,
        visibility=10.0 / 192, pixel_noise=1.0, point_noise=0.02, seed=0,
        dtype=jnp.float32,
    )
    sp = jax.jit(rg.slot_params)(params, grid)
    jax.block_until_ready(sp)
    points = params.points
    xy0, xy1 = grid.xy0, grid.xy1
    mask = grid.mask
    T = mask.shape[1]
    R_rows = grid.onehot_outer.shape[1]
    K = grid.onehot_intr.shape[1]
    free_outer = jnp.ones((T, 6), jnp.float32)
    free_inner = jnp.ones((T, 6), jnp.float32)
    free_intr = jnp.ones((T, 6), jnp.float32)
    point_free = jnp.ones_like(points)
    results = {}

    full = jax.jit(lambda p: rp.linearize_planes(
        p, sp, grid, xy0, xy1, mask, free_outer, free_inner, free_intr,
        point_free))
    results["linearize_full_ms"] = timed(full, points, reps=args.reps)

    results["cost_only_ms"] = timed(
        jax.jit(lambda p: rp.cost_planes(p, sp, xy0, xy1, mask)),
        points, reps=args.reps)

    # pieces: run linearize but return only selected outputs so XLA DCEs
    # the rest
    for name, idx in [("point_side", (1, 2)), ("cam_gram", (3, 4)),
                      ("E_only", (5,))]:
        f = jax.jit(lambda p, idx=idx: tuple(
            rp.linearize_planes(
                p, sp, grid, xy0, xy1, mask, free_outer, free_inner,
                free_intr, point_free)[i] for i in idx))
        results[f"{name}_ms"] = timed(f, points, reps=args.reps)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
