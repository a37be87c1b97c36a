#!/usr/bin/env python
"""Phase-level timing for the dense-grid LM step on the current device.

Times each hot component of one grid LM iteration separately (linearize +
assemble, trial cost, Schur solve pieces) so kernel work targets the real
bottleneck. Prints a JSON dict of milliseconds per phase.

Usage: python scripts/profile_grid.py [--n-points 100000] [--reps 5]
"""

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
    ap.add_argument("--n-points", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunk-size", type=int, default=8192)
    args = ap.parse_args()

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_grid_rig_device
    from deeparc_tpu.solver import rig_grid as rg

    print(f"device: {jax.devices()[0]}", flush=True)
    params, grid, _ = make_grid_rig_device(
        n_arc=8, n_ring=24, n_points=args.n_points,
        visibility=10.0 / 192, pixel_noise=1.0, point_noise=0.02, seed=0,
        dtype=jnp.float32,
    )
    n_ext_rows = params.ext_rot.shape[0]
    cam_free = jnp.ones(6 * n_ext_rows + 6 * params.center.shape[0],
                        jnp.float32)
    cam_free = cam_free.at[:6].set(0.0)
    cam_free = cam_free.at[6 * (n_ext_rows - 1): 6 * n_ext_rows].set(0.0)
    cam_free = cam_free.at[6 * n_ext_rows:].set(0.0)
    point_free = jnp.ones_like(params.points)
    options = SolverOptions()

    results = {}

    sp = jax.jit(rg.slot_params)(params, grid)
    jax.block_until_ready(sp)
    results["slot_params_ms"] = timed(
        jax.jit(rg.slot_params), params, grid, reps=args.reps)

    assemble = jax.jit(
        lambda pts, s: rg.assemble_grid_system(
            pts, s, grid, cam_free, point_free, args.chunk_size)
    )
    results["assemble_ms"] = timed(assemble, params.points, sp, reps=args.reps)

    cost_fn = jax.jit(lambda pts, s: rg.grid_cost(pts, s, grid))
    results["trial_cost_ms"] = timed(cost_fn, params.points, sp, reps=args.reps)

    sysm = assemble(params.points, sp)
    jax.block_until_ready(sysm)

    from deeparc_tpu.solver.linalg import inv3x3, masked_spd_solve
    from deeparc_tpu.solver.trust_region import lm_diagonal

    def schur_solve(sys):
        diag = jnp.diagonal(sys.hpp, axis1=-2, axis2=-1)
        d2p = lm_diagonal(diag, options.min_lm_diagonal,
                          options.max_lm_diagonal)
        eye3 = jnp.eye(3, dtype=sys.g_p.dtype)
        aug = sys.hpp + eye3 * d2p[:, :, None]
        aug = aug + (1.0 - point_free)[:, :, None] * eye3
        binv = inv3x3(aug)
        rhs = (-sys.g_c
               + jnp.einsum("pic,pij,pj->c", sys.E, binv, sys.g_p)) * cam_free
        corr = jnp.einsum("pic,pij,pjd->cd", sys.E, binv, sys.E)
        S = sys.hcc + jnp.eye(sys.hcc.shape[0], dtype=sys.hcc.dtype) - corr
        dc = masked_spd_solve(S, rhs, cam_free)
        e_dc = jnp.einsum("pic,c->pi", sys.E, dc)
        dp = -jnp.einsum("pij,pj->pi", binv, sys.g_p + e_dc) * point_free
        return dc, dp

    results["schur_solve_ms"] = timed(jax.jit(schur_solve), sysm,
                                      reps=args.reps)

    step = rg.make_grid_step(options, params, args.chunk_size)
    state = rg.init_grid_state(params, grid, options)
    jstep = jax.jit(step)
    out = jstep(state, grid, cam_free, point_free)
    jax.block_until_ready(out)
    results["full_step_ms"] = timed(
        lambda s: jstep(s, grid, cam_free, point_free)[0], state,
        reps=args.reps)

    n_obs = float(jnp.sum(grid.mask))
    results["n_points"] = args.n_points
    results["n_cells"] = int(grid.mask.shape[1])
    results["n_obs_alive"] = n_obs
    results["grid_slots"] = args.n_points * int(grid.mask.shape[1])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
