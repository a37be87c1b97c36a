#!/usr/bin/env python
"""Time the pieces of one tile-engine LM step at BAL scale on the chip.

Splits the step into: linearize (system build), one PCG sweep (matvec via
the impl's sweep path), rhs sweep, edot, trial-cost pass — so optimization
targets the measured hot piece, not a guess. Prints one JSON line.

Run: python scripts/profile_tiles_step.py [--n-points 1000000] [--impl pallas]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    return (time.time() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-points", type=int, default=1_000_000)
    p.add_argument("--n-cameras", type=int, default=2000)
    p.add_argument("--window", type=int, default=128)
    p.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    p.add_argument("--cg-iters", type=int, default=30)
    args = p.parse_args()

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_bal_tile_device
    from deeparc_tpu.solver import tiles as T
    from deeparc_tpu.solver.linalg import inv3x3
    from deeparc_tpu.solver.trust_region import lm_diagonal

    params, tiles, _, cam_free = make_bal_tile_device(
        n_cameras=args.n_cameras, n_points=args.n_points, track_length=8,
        window=args.window, dtype=jnp.float32,
    )
    n_ext = params.ext_rot.shape[0]
    cam_free = cam_free.at[:6].set(0.0)
    cam_free = cam_free.at[6 * (n_ext - 1): 6 * n_ext].set(0.0)
    cam_free = cam_free.at[6 * n_ext:].set(0.0)
    point_free = jnp.ones_like(params.points)
    opts = SolverOptions(linear_solver="iterative_schur",
                         cg_max_iterations=args.cg_iters)

    from deeparc_tpu.residuals.reprojection import camera_dim
    from deeparc_tpu.solver.rig_grid import slot_params

    C = camera_dim(params)
    sp = slot_params(params, tiles.cells)
    packed = T.pack_cells(sp, tiles.cells, cam_free)
    V = packed.shape[0]

    res = {}
    lin = jax.jit(lambda pts, pk: T.linearize_tiles(
        pts, pk, tiles, point_free, C))
    res["linearize_s"] = timed(lin, params.points, packed)
    sys = lin(params.points, packed)

    cost_fn = jax.jit(lambda pts, pk: T.tile_cost(pts, pk, tiles))
    res["trial_cost_s"] = timed(cost_fn, params.points, packed)

    diag = jnp.diagonal(sys.hpp, axis1=-2, axis2=-1)
    d2p = lm_diagonal(diag, opts.min_lm_diagonal, opts.max_lm_diagonal)
    aug = sys.hpp + jnp.eye(3, dtype=jnp.float32) * d2p[:, :, None] / 1e4
    binv = inv3x3(aug + (1.0 - point_free)[:, :, None] * jnp.eye(3))
    v_cells = jnp.ones((V, 18), jnp.float32)

    if args.impl == "pallas":
        step = T.make_tile_step(opts, params, impl="pallas")
        # reach into the kernel-sweep builder through a single step trace is
        # messy; time the public sweep paths instead via _e_sweep/_make
        from deeparc_tpu.kernels.tile_pallas import (
            pack_bucket_planes, tile_sweep_local,
        )

        b = tiles.buckets[0]
        blk = sys.blocks[0]
        plane = b.loc[0] if b.loc else b.cell
        cell_t, jcam_t, jx_t = pack_bucket_planes(blk.j_x, blk.j_cam, plane)
        binv_t = binv.reshape(-1, 9).T
        gp_t = sys.g_p[: b.cell.shape[0]].T
        cc = b.loc[1]
        v_locals = jnp.swapaxes(v_cells[cc], 1, 2)

        def sweep_matvec():
            bins = tile_sweep_local(cell_t, jcam_t, jx_t, binv_t, gp_t,
                                    v_locals, mode="matvec")
            return jnp.zeros((V, 18)).at[cc.reshape(-1)].add(
                bins.reshape(-1, 18))

        def sweep_rhs():
            bins = tile_sweep_local(cell_t, jcam_t, jx_t, binv_t, gp_t,
                                    jnp.zeros_like(v_locals), mode="rhs")
            return jnp.zeros((V, 18)).at[cc.reshape(-1)].add(
                bins.reshape(-1, 18))

        res["sweep_matvec_s"] = timed(jax.jit(sweep_matvec))
        res["sweep_rhs_s"] = timed(jax.jit(sweep_rhs))
        res["edot_s"] = timed(jax.jit(lambda: tile_sweep_local(
            cell_t, jcam_t, jx_t, binv_t, gp_t, v_locals, mode="edot")))
    else:
        sweep = jax.jit(lambda v, rm: T._e_sweep(
            tiles, sys, binv, v, rm), static_argnums=1)
        res["sweep_matvec_s"] = timed(sweep, v_cells, False)
        res["sweep_rhs_s"] = timed(sweep, v_cells, True)
        res["edot_s"] = timed(
            jax.jit(lambda v: T._e_dot_cells(tiles, sys, v)), v_cells)

    n_sweeps = args.cg_iters + 1
    res["est_step_s"] = (res["linearize_s"] + res["trial_cost_s"]
                         + res["sweep_rhs_s"] + res["edot_s"]
                         + n_sweeps * res["sweep_matvec_s"])
    res = {k: round(v, 4) for k, v in res.items()}
    res["impl"] = args.impl
    res["cg_iters"] = args.cg_iters
    print(json.dumps(res))


if __name__ == "__main__":
    main()
