#!/usr/bin/env python
"""Time the pieces of one tile-engine LM step at BAL scale on the chip.

Splits the step into: linearize (system build), one PCG sweep (matvec via
the impl's sweep path), rhs sweep, edot, trial-cost pass — so optimization
targets the measured hot piece, not a guess. Prints one JSON line.

All large arrays (tile planes, system blocks) are passed as jit ARGUMENTS —
closing over them would embed them as HLO constants (catastrophic
compile/upload through the tunneled TPU).

Run: python scripts/profile_tiles_step.py [--n-points 1000000] [--impl pallas]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


import sys as _sys

_T0 = time.time()


def note(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", file=_sys.stderr, flush=True)


def timed(fn, *args, reps=3, label="", **kw):
    note(f"{label}: compile+first call ...")
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    note(f"{label}: first call done, timing {reps} reps")
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    dt = (time.time() - t0) / reps
    note(f"{label}: {dt:.4f} s/rep")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-points", type=int, default=1_000_000)
    p.add_argument("--n-cameras", type=int, default=2000)
    p.add_argument("--window", type=int, default=128)
    p.add_argument("--impl", default="pallas",
                   choices=["pallas", "xla", "dual"])
    p.add_argument("--cg-iters", type=int, default=30)
    args = p.parse_args()

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_bal_tile_device
    from deeparc_tpu.solver import tiles as T
    from deeparc_tpu.solver.linalg import inv3x3
    from deeparc_tpu.solver.trust_region import lm_diagonal

    note("synthesizing problem ...")
    params, tiles, _, cam_free = make_bal_tile_device(
        n_cameras=args.n_cameras, n_points=args.n_points, track_length=8,
        window=args.window, dtype=jnp.float32,
    )
    jax.block_until_ready(params.points)
    note("problem on device")
    if args.impl == "dual":
        tiles = T.with_cam_layout(tiles)
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
    lin = jax.jit(
        lambda pts, pk, tl, pf: T.linearize_tiles(
            pts, pk, tl, pf, C, bin_cam=(args.impl != "dual")),
    )
    res["linearize_s"] = timed(lin, params.points, packed, tiles, point_free, label="linearize")
    sys = lin(params.points, packed, tiles, point_free)

    cost_fn = jax.jit(lambda pts, pk, tl: T.tile_cost(pts, pk, tl))
    res["trial_cost_s"] = timed(cost_fn, params.points, packed, tiles, label="trial_cost")

    diag = jnp.diagonal(sys.hpp, axis1=-2, axis2=-1)
    d2p = lm_diagonal(diag, opts.min_lm_diagonal, opts.max_lm_diagonal)
    aug = sys.hpp + jnp.eye(3, dtype=jnp.float32) * d2p[:, :, None] / 1e4
    binv = inv3x3(aug + (1.0 - point_free)[:, :, None] * jnp.eye(3))
    v_cells = jnp.ones((V, 18), jnp.float32)

    if args.impl == "pallas":
        from deeparc_tpu.kernels.tile_pallas import (
            pack_bucket_planes, tile_sweep_local,
        )

        b = tiles.buckets[0]
        blk = sys.blocks[0]
        plane = b.loc[0] if b.loc else b.cell

        pack = jax.jit(pack_bucket_planes)
        cell_t, jcam_t, jx_t = pack(blk.j_x, blk.j_cam, plane)
        res["pack_planes_s"] = timed(pack, blk.j_x, blk.j_cam, plane, label="pack_planes")
        binv_t = binv.reshape(-1, 9).T
        gp_t = sys.g_p[: b.cell.shape[0]].T
        cc = b.loc[1]
        v_locals = jnp.swapaxes(v_cells[cc], 1, 2)

        def sweep_matvec(ct, jc, jx, bt, gt, vl, ccells):
            bins = tile_sweep_local(ct, jc, jx, bt, gt, vl, mode="matvec")
            return jnp.zeros((V, 18)).at[ccells.reshape(-1)].add(
                bins.reshape(-1, 18))

        def sweep_rhs(ct, jc, jx, bt, gt, vl, ccells):
            bins = tile_sweep_local(ct, jc, jx, bt, gt,
                                    jnp.zeros_like(vl), mode="rhs")
            return jnp.zeros((V, 18)).at[ccells.reshape(-1)].add(
                bins.reshape(-1, 18))

        sweep_args = (cell_t, jcam_t, jx_t, binv_t, gp_t, v_locals, cc)
        res["sweep_matvec_s"] = timed(jax.jit(sweep_matvec), *sweep_args, label="sweep_matvec")
        res["sweep_rhs_s"] = timed(jax.jit(sweep_rhs), *sweep_args, label="sweep_rhs")
        res["edot_s"] = timed(
            jax.jit(lambda ct, jc, jx, bt, gt, vl: tile_sweep_local(
                ct, jc, jx, bt, gt, vl, mode="edot")),
            cell_t, jcam_t, jx_t, binv_t, gp_t, v_locals, label="edot")
    elif args.impl == "dual":
        prep = jax.jit(lambda tl, s: T._dual_prep(tl, s))
        jcam_cms = prep(tiles, sys)
        res["dual_prep_s"] = timed(prep, tiles, sys, label="dual_prep")
        res["dual_bin_system_s"] = timed(
            jax.jit(lambda tl, s, jc: T._dual_bin_system(tl, s, jc, V)),
            tiles, sys, jcam_cms, label="dual_bin_system")

        sweep = jax.jit(
            lambda tl, s, bi, jc, v, rm: T._dual_sweep(tl, s, bi, jc, v, rm),
            static_argnums=5)
        res["sweep_matvec_s"] = timed(
            sweep, tiles, sys, binv, jcam_cms, v_cells, False,
            label="sweep_matvec")
        res["sweep_rhs_s"] = timed(
            sweep, tiles, sys, binv, jcam_cms, v_cells, True,
            label="sweep_rhs")
        res["edot_s"] = timed(
            jax.jit(lambda tl, s, jc, v: T._dual_edot(tl, s, jc, v)),
            tiles, sys, jcam_cms, v_cells, label="edot")
    else:
        sweep = jax.jit(
            lambda tl, s, bi, v, rm: T._e_sweep(tl, s, bi, v, rm),
            static_argnums=4)
        res["sweep_matvec_s"] = timed(sweep, tiles, sys, binv, v_cells,
                                      False, label="sweep_matvec")
        res["sweep_rhs_s"] = timed(sweep, tiles, sys, binv, v_cells, True,
                                   label="sweep_rhs")
        res["edot_s"] = timed(
            jax.jit(lambda tl, s, v: T._e_dot_cells(tl, s, v)),
            tiles, sys, v_cells, label="edot")

    # per-step one-time pieces (pack_planes / dual prep+bin) + the sweeps
    n_sweeps = args.cg_iters + 1
    res["est_step_s"] = (res["linearize_s"] + res["trial_cost_s"]
                         + res["sweep_rhs_s"] + res["edot_s"]
                         + n_sweeps * res["sweep_matvec_s"]
                         + res.get("pack_planes_s", 0.0)
                         + res.get("dual_prep_s", 0.0)
                         + res.get("dual_bin_system_s", 0.0))
    res = {k: round(v, 4) for k, v in res.items()}
    res["impl"] = args.impl
    res["cg_iters"] = args.cg_iters
    print(json.dumps(res))


if __name__ == "__main__":
    main()
