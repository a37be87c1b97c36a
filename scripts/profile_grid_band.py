#!/usr/bin/env python
"""Scan (slab, block_np) for the banded grid kernels on the chip.

The banded linearize trades slots skipped (narrower bands) against
per-grid-step overhead (slab x block_np bodies); this measures both kernels
at several operating points against the monolithic baselines so bench.py
defaults are chosen from data. Prints one JSON line.

Run: python scripts/profile_grid_band.py [--n-points 400000]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

_T0 = time.time()


def note(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def timed(fn, *args, reps=5, label=""):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _i in range(reps):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / reps
    note(f"{label}: {dt * 1e3:.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-points", type=int, default=400_000)
    p.add_argument("--occlusion-rings", type=int, default=6)
    args = p.parse_args()

    from deeparc_tpu.io.synthetic import make_grid_rig_device
    from deeparc_tpu.kernels.rig_pallas import (
        cost_grid, cost_grid_banded, linearize_grid, linearize_grid_banded,
    )
    from deeparc_tpu.solver.rig_band import band_grid
    from deeparc_tpu.solver.rig_grid import slot_params

    note("synthesizing ...")
    params, grid0, _ = make_grid_rig_device(
        n_points=args.n_points, occlusion_rings=args.occlusion_rings,
        visibility=10.0 / (8 * args.occlusion_rings), dtype=jnp.float32,
    )
    jax.block_until_ready(grid0.mask)
    note("problem on device")
    T = grid0.mask.shape[1]
    res = {"t_cells": T, "n_obs": int(jnp.sum(grid0.mask))}

    sp0 = slot_params(params, grid0)
    ones6 = jnp.ones((T, 6), jnp.float32)
    pf = jnp.ones_like(params.points)

    lin_full = jax.jit(lambda pts, s, g: linearize_grid(
        pts, pf, s, g, ones6, ones6, ones6))
    res["lin_full_ms"] = 1e3 * timed(
        lin_full, params.points, sp0, grid0, label="lin monolithic")
    cost_full = jax.jit(lambda pts, s, g: cost_grid(pts, s, g))
    res["cost_full_ms"] = 1e3 * timed(
        cost_full, params.points, sp0, grid0, label="cost monolithic")

    for bn in (256, 512):
        prep = band_grid(grid0, block_np=bn, cost_block_np=1024)
        if prep is None:
            continue
        g = prep.grid
        pts = params.points[prep.perm]
        sp = slot_params(params, g)
        key = f"b{bn}"
        res[f"wband_{key}"] = prep.w_band

        lin_b = jax.jit(lambda pts, s, g, st, px: linearize_grid_banded(
            pts, pf, s, g, ones6, ones6, ones6, st,
            w_band=prep.w_band, block_np=bn, intr_frozen=True, pxm=px))
        res[f"lin_{key}_ms"] = 1e3 * timed(
            lin_b, pts, sp, g, g.band[0], g.band[2],
            label=f"lin banded {key}")
        cost_b = jax.jit(lambda pts, s, g, st, px: cost_grid_banded(
            pts, s, g, st, w_band=prep.w_band_cost, block_np=1024, pxm=px))
        res[f"cost_{key}_ms"] = 1e3 * timed(
            cost_b, pts, sp, g, g.band[1], g.band[3],
            label=f"cost banded {key}")
    res = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in res.items()}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
