#!/usr/bin/env python
"""Benchmark: BA LM iterations/sec on synthetic problems.

Prints ONE JSON line:
    {"metric": "ba_iterations_per_sec", "value": ..., "unit": "iter/s",
     "vs_baseline": ...}

The reference publishes no numbers (BASELINE.md); the operative target is
>= 5x CPU-Ceres-equivalent BA iterations/sec (BASELINE.json). ``vs_baseline``
is TPU-iter/s over the same solver on the CPU backend (measured once per
problem config in a subprocess, cached in .bench_cache.json).

One "iteration" = one full LM step: residual + Jacobian blocks, Schur
elimination of all points, reduced camera solve, trial cost, trust-region
update — the same unit Ceres reports per line of its minimizer progress.

Engines / configs:
  --engine grid   dense (N x cells) rig engine. Default config is the
                  SPARSE-visibility rig with occlusion-windowed visibility
                  (mean track ~10; each point visible from a cyclic window
                  of turntable steps — what a real capture has), solved
                  with the live-band kernels (solver/rig_band.py);
                  --sparse-random keeps the uniform-random no-locality
                  worst case; --dense benches the full-visibility rig
                  where every slot is live.
  --engine tiles  the general-sparsity tile engine (BAL configs: --bal /
                  --bal-heavytail / --bal-random; --sweep-dtype bf16).
  --engine indexed  the observation-list engine (gather/segment-sum bound).

The JSON detail includes ``live_obs_per_sec`` (live observations x iter/s —
the layout-independent useful-work metric) and ``est_tflops`` from a
documented analytic FLOP count.

Usage:
    python bench.py                 # sparse grid config (~400k pts) on TPU
    python bench.py --engine tiles  # tile engine, same problem shape
    python bench.py --dense         # dense-rig grid config
    python bench.py --scaling       # 1..8 virtual-device efficiency sweep
    python bench.py --quick         # small smoke config
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "axon"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--n-points", type=int, default=None)
    p.add_argument("--measure-only", action="store_true",
                   help="print raw iter/s only (used for the CPU subprocess)")
    p.add_argument("--no-baseline", action="store_true")
    p.add_argument("--engine", default=None,
                   choices=["grid", "indexed", "tiles"],
                   help="default: grid (tiles when --bal is passed)")
    p.add_argument("--dense", action="store_true",
                   help="grid engine: full-visibility rig (no masked waste)")
    p.add_argument("--sparse-random", action="store_true",
                   help="grid engine: round-3 uniform-random sparse "
                        "visibility (no locality anywhere — the worst case; "
                        "the default sparse config models self-occlusion: "
                        "each point visible from a cyclic window of "
                        "--occlusion-rings turntable steps)")
    p.add_argument("--occlusion-rings", type=int, default=6,
                   help="sparse grid config: visible-window width in rings")
    p.add_argument("--no-band", action="store_true",
                   help="grid engine: disable the live-band kernel path "
                        "(solver/rig_band.py) even when the mask has "
                        "locality")
    p.add_argument("--bal", action="store_true",
                   help="tiles engine: BAL-scale non-shared config "
                        "(1M points, 2000 free cameras, track 8, windowed "
                        "co-visibility — the locality real BAL scenes have)")
    p.add_argument("--bal-hub", action="store_true",
                   help="tiles: hub-contaminated windowed camera graph "
                        "with shuffled ids, built host-side through "
                        "tiles_from_scene (exercises the hub-robust "
                        "locality fallback)")
    p.add_argument("--bal-random", action="store_true",
                   help="--bal with the round-2 uniform-random camera graph "
                        "(no locality; engines use global cell tables)")
    p.add_argument("--bal-heavytail", action="store_true",
                   help="--bal with a clipped log-normal track distribution "
                        "(2..512, venice-like): multiple width buckets incl. "
                        "wide tails; exercises the mixed per-bucket "
                        "fused/XLA engine path")
    p.add_argument("--window", type=int, default=128,
                   help="--bal co-visibility window (cameras per chunk "
                        "neighborhood)")
    p.add_argument("--chunk-size", type=int, default=8192)
    p.add_argument("--impl", default=None,
                   choices=["planes", "einsum", "pallas", "xla", "dual"],
                   help="kernel implementation. grid engine: planes | "
                        "einsum | pallas (default pallas — measured 4.8x "
                        "planes on the v5e). tiles engine: xla | pallas "
                        "(default pallas on TPU: fused VMEM sweep kernel) "
                        "| dual (camera-major layout, no one-hot sweeps)")
    p.add_argument("--cg-iters", type=int, default=30,
                   help="fixed PCG iterations (tiles/indexed engines)")
    p.add_argument("--sweep-dtype", default="f32", choices=["f32", "bf16"],
                   help="tiles engine: storage dtype of the per-slot "
                        "Jacobian planes the PCG sweeps read (bf16 halves "
                        "the sweeps' HBM traffic; accumulation stays f32)")
    p.add_argument("--fuse-trial", action="store_true",
                   help="grid engine: fused-trial step (state carries the "
                        "linearization; the trial evaluation IS the next "
                        "linearize). Measured slower than the classic step "
                        "on the v5e pallas path (the big-system select "
                        "outweighs the saved cost pass)")
    p.add_argument("--no-phase-split", action="store_true",
                   help="skip the per-phase timing + VPU-roofline passes "
                        "(they add a few compiles per row)")
    p.add_argument("--sweep-block", type=int, default=256,
                   help="tiles engine: sweep-kernel lane-block size")
    p.add_argument("--scaling", action="store_true",
                   help="sweep 1..8 virtual devices (CPU) and print the "
                        "scaling-efficiency curve")
    p.add_argument("--pipeline", action="store_true",
                   help="run the FULL pipeline loop (hemisphere fit, "
                        "freeze solve, solve/filter rounds, outputs) at "
                        "flagship scale and report wall-clock + per-round "
                        "breakdown")
    p.add_argument("--golden", action="store_true",
                   help="--pipeline: run on the hand-authored golden "
                        ".deeparc fixture instead of a synthesized rig")
    p.add_argument("--pipeline-iters", type=int, default=100,
                   help="--pipeline: per-solve LM iteration cap "
                        "(reference default 100, src/sfm.cc:111,121)")
    p.add_argument("--time-to-rmse", action="store_true",
                   help="BASELINE row 4: run the grid engine from the noisy "
                        "init with real convergence tolerances and report "
                        "seconds until reprojection RMSE <= --target-rmse")
    p.add_argument("--target-rmse", type=float, default=1.5,
                   help="time-to-rmse target in px (default 1.5: just above "
                        "the sqrt(2)*sigma noise floor of the 1 px/axis rig)")
    p.add_argument("--matrix", action="store_true",
                   help="run the full benchmark matrix (every BASELINE row) "
                        "in subprocesses and write BENCH.md + "
                        "BENCH_MATRIX.json")
    p.add_argument("--with-ceres-equiv", action="store_true",
                   help="measure the Ceres-equivalent CPU DENSE_SCHUR anchor "
                        "if not cached (scripts/ceres_equiv_cpu.py; minutes)")
    return p.parse_args(argv)


def build_config(args):
    if args.bal_random or args.bal_heavytail or args.bal_hub:
        args.bal = True
    if args.engine is None:
        args.engine = "tiles" if args.bal else "grid"
    elif args.bal and args.engine != "tiles":
        # --bal is a tiles-engine config; refuse contradictory flags rather
        # than silently rewriting an EXPLICIT --engine choice
        raise SystemExit(
            f"--bal is a tiles-engine config; drop --engine {args.engine} "
            "or use --engine tiles")
    n_points = args.n_points or (2_000 if args.quick else 400_000)
    # 8 arcs x 24 rings; sparse config thins visibility to mean track ~ 10.
    # Default sparse visibility is occlusion-windowed (each point visible
    # from a cyclic window of --occlusion-rings turntable steps — what a
    # real capture has); --sparse-random reproduces the uniform-random
    # no-locality worst case. Both have the same n_obs.
    # occlusion windows are a grid-engine config; the indexed/tiles sparse
    # configs keep the legacy uniform visibility (mean track 10 of 192)
    occl = (None if (args.dense or args.sparse_random
                     or args.engine != "grid")
            else args.occlusion_rings)
    if args.dense:
        vis = None
    elif occl is not None:
        vis = 10.0 / (8 * occl)     # thin inside the n_arc * occl window
    else:
        vis = 10.0 / (8 * 24)
    return dict(
        n_arc=8, n_ring=24, n_points=n_points,
        visibility=vis,
        occlusion_rings=occl,
        track_length=10,
        pixel_noise=1.0, point_noise=0.02, seed=0,
    )


def band_eff_width(groups, fallback):
    """Average paid cells per point tile for a grouped band spec (tuple of
    (w, tile_lo, tile_hi)), an int width, or 0 -> fallback."""
    if isinstance(groups, tuple) and groups:
        tiles = groups[-1][2]
        return sum(w * (hi - lo) for w, lo, hi in groups) / max(tiles, 1)
    return groups or fallback


def grid_flops_per_step(n_points, T, R, K, n_live, w_lin=0, w_cost=0):
    """Analytic EXECUTED FLOPs for one grid-engine LM step.

    Dominated by: the E one-hot contractions (per (i,j) of 3x6 columns, an
    (N,T)@(T,R|K) matmul), the (2N,18,T) slot Gram, the Jacobian plane
    algebra (~650 flop/slot), and the trial-cost pass (~120 flop/slot).
    Slots = N*T regardless of visibility (the mask eats dead slots) —
    UNLESS the live-band kernels run, in which case only N*w_band slots
    execute per pass (w_lin/w_cost from solver/rig_band.band_grid).
    """
    slots = n_points * (w_lin or T)
    e_flops = slots * (36 * 2 * R + 18 * 2 * K)
    gram = slots * 2 * 342
    jac = slots * 650
    cost_pass = n_points * (w_cost or T) * 120
    schur = n_points * 200 + (6 * (R + K)) ** 3 / 3
    return e_flops + gram + jac + cost_pass + schur


def tile_flops_per_step(n_rows, W, V, cg_iters):
    """Analytic FLOPs for one tile-engine LM step.

    Per slot: one-hot lookup (2*78*V) + camera binning (2*(18+171)*V) at
    linearize; each PCG matvec sweep costs ~2*2*18*V per slot (one-hot
    lookup of v + binned scatter) plus ~200 flop of einsum work; the rhs,
    back-substitution, and trial-cost sweeps add ~3 lookup-weight sweeps.
    With locality blocking V here is V_LOCAL (the per-chunk table width),
    not the global cell count — that reduction IS the optimization.
    """
    slots = n_rows * W
    lin = slots * (2 * 78 * V + 2 * 189 * V + 700)
    sweep = slots * (2 * 2 * 18 * V + 200)
    return lin + (cg_iters + 3) * sweep


def useful_flops_per_step(n_live_obs, n_points, cg_iters=0):
    """ENGINE-INDEPENDENT useful work for one LM step (VERDICT r3 item 8).

    Counts only arithmetic any implementation of the same algorithm must do
    on LIVE observations — no masked slots, no one-hot selection overhead,
    no padding: closed-form Jacobian chain (~650 FLOP/obs), camera-side
    Gram/gradient accumulation (2*(171+18) = 378), point-side g/H (~60),
    trial-cost re-evaluation (~120); for iterative-Schur engines each PCG
    sweep touches every live obs once (~200 FLOP: E v, B^-1, E^T w), with
    rhs/back-substitution/cost ~3 sweep-equivalents; plus ~200 FLOP/point
    for the 3x3 elimination. mfu_useful = useful work rate / measured peak
    — the cross-engine comparable number (executed MFU rewards overcompute).
    """
    per_obs = 650 + 378 + 60 + 120
    sweeps = 200 * (cg_iters + 3) if cg_iters else 0
    return n_live_obs * (per_obs + sweeps) + n_points * 200


def measure_peak_tflops() -> dict:
    """Measured MXU anchor: big square matmuls in f32 and bf16.

    'Speed of light' claims are made against this MEASURED rate, not a
    datasheet number — the ratio est_tflops / peak is the reported MFU.
    """
    import time as _t

    import jax
    import jax.numpy as jnp

    out = {}
    n = 8192
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        a = jnp.ones((n, n), dt)
        f = jax.jit(lambda x: x @ x)
        x = f(a)
        _ = float(jnp.sum(x[:1, :1]))
        t0 = _t.time()
        for _i in range(3):
            x = f(x)
        _ = float(jnp.sum(x[:1, :1]))
        out[name] = 3 * 2 * n ** 3 / (_t.time() - t0) / 1e12
    return out


def measure(args) -> dict:
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_hemisphere_rig
    from deeparc_tpu.residuals.reprojection import flatten_camera
    from deeparc_tpu.scene import freeze_masks, from_deeparc

    cfg = build_config(args)
    band_detail = None

    valid_impls = {"grid": {"planes", "einsum", "pallas"},
                   "tiles": {"xla", "pallas", "dual"},
                   "indexed": set()}
    if args.impl is not None and args.impl not in valid_impls[args.engine]:
        raise SystemExit(
            f"--impl {args.impl} is not valid for --engine {args.engine} "
            f"(choices: {sorted(valid_impls[args.engine]) or 'none'})"
        )
    if args.impl is None:
        args.impl = {"grid": "pallas", "tiles": "pallas",
                     "indexed": None}[args.engine]

    est_flops = None
    if args.engine == "grid":
        from deeparc_tpu.io.synthetic import make_grid_rig_device
        from deeparc_tpu.solver.rig_grid import init_grid_state, make_grid_step

        # device-side problem synthesis: only tiny camera tables cross the
        # host->device boundary (a tunneled TPU uploads at ~MB/s)
        params, grid, _ = make_grid_rig_device(
            n_arc=cfg["n_arc"], n_ring=cfg["n_ring"],
            n_points=cfg["n_points"], visibility=cfg["visibility"],
            occlusion_rings=cfg["occlusion_rings"],
            pixel_noise=cfg["pixel_noise"], point_noise=cfg["point_noise"],
            seed=cfg["seed"], dtype=jnp.float32,
        )
        # live-band prep: skip dead cell slabs in the pallas kernels when
        # the visibility mask has locality (solver/rig_band.py); falls back
        # to the monolithic kernels automatically when it does not
        band_widths = band_blocks = (0, 0)
        band_detail = None
        if args.impl == "pallas" and not args.dense and not args.no_band:
            import dataclasses as _dc

            from deeparc_tpu.solver.rig_band import band_grid

            prep = band_grid(grid)
            if prep is not None:
                grid = prep.grid
                params = _dc.replace(params,
                                     points=params.points[prep.perm])
                band_widths, band_blocks = prep.widths
                paid_lin, uniform_lin = prep.slot_work
                band_detail = {"w_band": prep.w_band,
                               "w_band_cost": prep.w_band_cost,
                               "lin_groups": list(map(list, prep.lin_groups)),
                               "cost_groups": list(map(list, prep.cost_groups)),
                               "w_lin_eff": round(band_eff_width(
                                   band_widths[0], 0), 1),
                               "w_cost_eff": round(band_eff_width(
                                   band_widths[1], 0), 1),
                               "t_cells": int(grid.mask.shape[1])}
        n_ext_rows = params.ext_rot.shape[0]
        K = params.center.shape[0]
        cam_free = jnp.ones(6 * n_ext_rows + 6 * K, jnp.float32)
        cam_free = cam_free.at[: 6].set(0.0)                  # gauge ext 0
        cam_free = cam_free.at[6 * (n_ext_rows - 1): 6 * n_ext_rows].set(0.0)
        cam_free = cam_free.at[6 * n_ext_rows:].set(0.0)      # intrinsics
        point_free = jnp.ones_like(params.points)

        # exact dense Schur every step (the grid engine's native solve)
        options = SolverOptions(
            linear_solver="dense_schur",
            min_relative_decrease=-1.0,  # never reject: constant per-step work
            function_tolerance=0.0, gradient_tolerance=0.0,
            parameter_tolerance=0.0,
        )
        # intrinsics are frozen in this config (the reference's standard BA
        # mode, src/sfm.cc:60-62) -> the banded kernel skips their E columns
        fused = args.fuse_trial
        g_step = make_grid_step(options, params, args.chunk_size,
                                impl=args.impl, band_widths=band_widths,
                                band_blocks=band_blocks,
                                band_intr_frozen=True, fuse_trial=fused)
        step = jax.jit(lambda s, g, cf, pf: g_step(s, g, cf, pf)[0],
                       donate_argnums=(0,))
        if fused:
            from deeparc_tpu.solver.rig_grid import init_grid_state_fused

            state = init_grid_state_fused(
                params, grid, options, cam_free, point_free,
                impl=args.impl, band_widths=band_widths,
                band_blocks=band_blocks, band_intr_frozen=True,
                chunk_size=args.chunk_size)
        else:
            state = init_grid_state(params, grid, options, impl=args.impl,
                                    band_widths=band_widths,
                                    band_blocks=band_blocks)
        step_args = (grid, cam_free, point_free)
        n_obs_real = int(jnp.sum(grid.mask))
        n_points_real = cfg["n_points"]
        T = cfg["n_arc"] * cfg["n_ring"]
        w_lin_eff = band_eff_width(band_widths[0], T)
        w_cost_eff = band_eff_width(band_widths[1], T)
        slot_obs = int(cfg["n_points"] * w_lin_eff)
        est_flops = grid_flops_per_step(
            cfg["n_points"], T, n_ext_rows, K, n_obs_real,
            w_lin_eff, w_cost_eff)
    elif args.engine == "tiles":
        from deeparc_tpu.solver.tiles import (
            init_tile_state, make_tile_step,
        )

        if args.bal_hub:
            # hub-contaminated windowed graph with SHUFFLED camera ids:
            # built host-side through tiles_from_scene so the bench
            # exercises the hub-robust locality ordering itself
            # (solver/tiles._locality_cell_order), not a pre-known window
            from deeparc_tpu.io.synthetic import make_bal_windowed_host
            from deeparc_tpu.residuals.reprojection import flatten_camera
            from deeparc_tpu.scene import freeze_masks, from_deeparc
            from deeparc_tpu.solver.tiles import tiles_from_scene

            n_pts = args.n_points or (4_000 if args.quick else 250_000)
            n_cam = 64 if args.quick else 2000
            data = make_bal_windowed_host(
                n_cameras=n_cam, n_points=n_pts, track_length=8,
                window=args.window, n_hubs=max(n_cam // 250, 2),
                hub_frac=0.15, pixel_noise=cfg["pixel_noise"],
                point_noise=cfg["point_noise"], seed=cfg["seed"])
            scene = from_deeparc(data, dtype=jnp.float32)
            free0 = freeze_masks(scene)
            tiles, params, free_pts = tiles_from_scene(scene, free0)
            cam_free = flatten_camera(free0).astype(jnp.float32)
        elif args.bal_heavytail:
            from deeparc_tpu.io.synthetic import make_bal_heavytail_device

            n_pts = args.n_points or (4_000 if args.quick else 1_000_000)
            n_cam = 64 if args.quick else 2000
            params, tiles, _, cam_free = make_bal_heavytail_device(
                n_cameras=n_cam, n_points=n_pts, mean_track=8.0,
                pixel_noise=cfg["pixel_noise"],
                point_noise=cfg["point_noise"],
                seed=cfg["seed"], dtype=jnp.float32, window=args.window,
            )
        elif args.bal:
            from deeparc_tpu.io.synthetic import make_bal_tile_device

            n_pts = args.n_points or (4_000 if args.quick else 1_000_000)
            n_cam = 64 if args.quick else 2000
            params, tiles, _, cam_free = make_bal_tile_device(
                n_cameras=n_cam, n_points=n_pts, track_length=8,
                pixel_noise=cfg["pixel_noise"],
                point_noise=cfg["point_noise"],
                seed=cfg["seed"], dtype=jnp.float32,
                window=None if args.bal_random else args.window,
            )
        else:
            from deeparc_tpu.io.synthetic import make_tile_rig_device

            params, tiles, _, cam_free = make_tile_rig_device(
                n_arc=cfg["n_arc"], n_ring=cfg["n_ring"],
                n_points=cfg["n_points"], track_length=cfg["track_length"],
                pixel_noise=cfg["pixel_noise"],
                point_noise=cfg["point_noise"],
                seed=cfg["seed"], dtype=jnp.float32,
            )
        if args.impl == "dual":
            from deeparc_tpu.solver.tiles import with_cam_layout

            tiles = with_cam_layout(tiles)
        n_ext_rows = params.ext_rot.shape[0]
        cam_free = cam_free.at[: 6].set(0.0)                  # gauge ext 0
        cam_free = cam_free.at[6 * (n_ext_rows - 1): 6 * n_ext_rows].set(0.0)
        cam_free = cam_free.at[6 * n_ext_rows:].set(0.0)      # intrinsics
        point_free = (free_pts if args.bal_hub
                      else jnp.ones_like(params.points))

        options = SolverOptions(
            linear_solver="iterative_schur",
            cg_max_iterations=args.cg_iters,
            cg_tolerance=0.0,            # fixed CG work per LM step
            min_relative_decrease=-1.0,
            function_tolerance=0.0, gradient_tolerance=0.0,
            parameter_tolerance=0.0,
        )
        t_step = make_tile_step(
            options, params, impl=args.impl,
            sweep_dtype=jnp.bfloat16 if args.sweep_dtype == "bf16" else None,
            sweep_block_n=args.sweep_block)
        step = jax.jit(lambda s, t, cf, pf: t_step(s, t, cf, pf)[0],
                       donate_argnums=(0,))
        # keep undonated copies for the phase-split re-init below (the
        # main step donates its state, which aliases params.points)
        params_copy = jax.tree.map(lambda x: x + 0, params)
        state = init_tile_state(params, tiles, options, cam_free)
        step_args = (tiles, cam_free, point_free)
        n_obs_real = int(sum(float(jnp.sum(b.mask)) for b in tiles.buckets))
        n_points_real = int(params.points.shape[0])
        V = int(tiles.cells.slot_outer.shape[0])
        v_eff = (int(tiles.buckets[0].loc[1].shape[1])
                 if tiles.buckets[0].loc else V)
        slot_obs = sum(int(b.cell.size) for b in tiles.buckets)
        est_flops = sum(
            tile_flops_per_step(
                b.cell.shape[0], b.cell.shape[1],
                int(b.loc[1].shape[1]) if b.loc else V, args.cg_iters)
            for b in tiles.buckets)
    else:
        from deeparc_tpu.solver.ba import init_state, make_step_pure

        rig = make_hemisphere_rig(
            n_arc=cfg["n_arc"], n_ring=cfg["n_ring"],
            n_points=cfg["n_points"],
            visibility=cfg["visibility"] or 1.0,
            pixel_noise=cfg["pixel_noise"], point_noise=cfg["point_noise"],
            seed=cfg["seed"],
        )
        # f32 on accelerators (f64 is software-emulated on TPU)
        scene = from_deeparc(rig.data, dtype=jnp.float32)
        free = freeze_masks(scene)
        cam_free = flatten_camera(free)
        point_free = free.points
        n_obs_real = scene.n_obs
        n_points_real = scene.n_points
        slot_obs = scene.n_obs
        options = SolverOptions(
            linear_solver="iterative_schur",
            cg_max_iterations=args.cg_iters,
            cg_tolerance=0.0,           # fixed CG work per LM step
            min_relative_decrease=-1.0,
            function_tolerance=0.0, gradient_tolerance=0.0,
            parameter_tolerance=0.0,
        )
        step_pure = make_step_pure(options)
        step = jax.jit(lambda s, idx, cf, pf: step_pure(s, idx, cf, pf)[0],
                       donate_argnums=(0,))
        state = init_state(scene.params, scene.index, options)
        step_args = (scene.index, cam_free, point_free)

    # NOTE on timing through the axon relay: block_until_ready can return
    # before remote execution finishes, so every timed region must end with a
    # device->host VALUE fetch (float(...)), which cannot be satisfied early.
    t_compile = time.time()
    state = step(state, *step_args)
    float(state.cost)
    compile_s = time.time() - t_compile
    for _ in range(max(args.warmup - 1, 0)):
        state = step(state, *step_args)
    float(state.cost)

    t0 = time.time()
    for _ in range(args.iters):
        state = step(state, *step_args)
    float(state.cost)
    dt = time.time() - t0

    ips = args.iters / dt
    out = dict(
        iters_per_sec=ips,
        seconds_per_iter=dt / args.iters,
        compile_s=compile_s,
        n_obs=n_obs_real,
        n_points=n_points_real,
        slot_obs=slot_obs,
        live_obs_per_sec=n_obs_real * ips,
        platform=jax.devices()[0].platform,
        device=str(jax.devices()[0]),
        final_cost=float(state.cost),
    )
    cg = args.cg_iters if args.engine in ("tiles", "indexed") else 0
    useful = useful_flops_per_step(n_obs_real, n_points_real, cg)
    out["useful_tflops"] = useful * ips / 1e12
    if est_flops is not None:
        out["est_tflops"] = est_flops * ips / 1e12

    # ---- auditable phase split + VPU placement (VERDICT r4 item 4) ----
    if args.engine == "grid" and not args.no_phase_split:
        from deeparc_tpu.solver import rig_grid as _rg

        bw, bb = band_widths, band_blocks
        intr_frozen = True   # this bench config always freezes intrinsics

        @jax.jit
        def _lin_pass(points, g, cf, pf):
            sp = _rg.slot_params(params, g)
            sys = _rg.assemble_grid_system(
                points, sp, g, cf, pf, args.chunk_size, impl=args.impl,
                band_width=bw[0], band_block=bb[0],
                band_intr_frozen=intr_frozen)
            return sys.cost

        @jax.jit
        def _cost_pass(points, g):
            sp = _rg.slot_params(params, g)
            return _rg.grid_cost(points, sp, g, impl=args.impl,
                                 band_width=bw[1], band_block=bb[1])

        def _time(fn, *a, reps=max(args.iters // 2, 3)):
            float(fn(*a))            # compile + warm
            float(fn(*a))
            t0 = time.time()
            for _ in range(reps):
                r = fn(*a)
            float(r)
            return (time.time() - t0) / reps

        lin_s = _time(_lin_pass, state.points, grid, cam_free, point_free)
        cost_s = _time(_cost_pass, state.points, grid)
        step_s = dt / args.iters
        out["phase_split"] = {
            "linearize_ms": round(lin_s * 1e3, 3),
            "cost_pass_ms": round(cost_s * 1e3, 3),
            # one accepted LM step = linearize + 1 trial cost + Schur/TR
            "schur_tr_other_ms": round(
                (step_s - lin_s - cost_s) * 1e3, 3),
            "step_ms": round(step_s * 1e3, 3),
        }
        # VPU placement of the linearize (the dense plane algebra is
        # elementwise; scripts/vpu_roofline.py measures the issue ceiling)
        try:
            import importlib.util as _ilu

            spec = _ilu.spec_from_file_location(
                "vpu_roofline", os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "scripts", "vpu_roofline.py"))
            vr = _ilu.module_from_spec(spec)
            spec.loader.exec_module(vr)
            vpu_peak = vr.measure_vpu_peak_tflops(reps=3)
            per_slot = 650 + 2 * (156 if intr_frozen else 342) + 60
            vpu_rate = slot_obs * per_slot / lin_s / 1e12
            out["vpu_peak_tflops"] = round(vpu_peak, 2)
            out["lin_vpu_tflops"] = round(vpu_rate, 2)
            out["vpu_fraction"] = round(vpu_rate / vpu_peak, 3)
        except Exception as e:
            print(f"# vpu roofline skipped: {e}", file=sys.stderr)
    elif args.engine == "tiles" and not args.no_phase_split:
        # sweep cost via a cg_iters=0 twin of the SAME step: the delta to
        # the full step is exactly the PCG sweep work
        t0_step = make_tile_step(
            dataclasses.replace(options, cg_max_iterations=0),
            params, impl=args.impl,
            sweep_dtype=jnp.bfloat16 if args.sweep_dtype == "bf16" else None,
            sweep_block_n=args.sweep_block)
        step0 = jax.jit(lambda s, t, cf, pf: t0_step(s, t, cf, pf)[0],
                        donate_argnums=(0,))
        st0 = init_tile_state(params_copy, tiles, options, cam_free)
        st0 = step0(st0, *step_args)
        float(st0.cost)
        t0 = time.time()
        for _ in range(max(args.iters // 2, 3)):
            st0 = step0(st0, *step_args)
        float(st0.cost)
        base_s = (time.time() - t0) / max(args.iters // 2, 3)
        step_s = dt / args.iters
        out["phase_split"] = {
            "linearize_solve_base_ms": round(base_s * 1e3, 3),
            "pcg_sweeps_total_ms": round((step_s - base_s) * 1e3, 3),
            "per_cg_iteration_ms": round(
                (step_s - base_s) / max(args.cg_iters, 1) * 1e3, 3),
            "cg_iters": args.cg_iters,
            "step_ms": round(step_s * 1e3, 3),
        }
    if jax.default_backend() != "cpu" and not args.measure_only:
        peak = measure_peak_tflops()
        out["measured_peak_tflops"] = {k: round(v, 1)
                                       for k, v in peak.items()}
        out["mfu_useful"] = out["useful_tflops"] / peak["f32"]
        if est_flops is not None:
            out["mfu_vs_f32_peak"] = out["est_tflops"] / peak["f32"]
    if args.engine == "tiles":
        out["v_local"] = v_eff if args.engine == "tiles" else None
    if band_detail is not None:
        out["band"] = band_detail
    return out


def _rmse_trace_loop(args, state, hist, run_block, run_args, n_live,
                     max_iterations, compile_s, impl):
    """Generic blocked convergence loop with an on-device per-iteration
    cost trace: exact crossing iteration, block-interpolated wall time
    (per-iteration step cost is constant), full per-iterate history."""
    import numpy as np

    rmse0 = float(np.sqrt(2.0 * float(state.cost) / n_live))
    costs_of = lambda h: h[0] if h.ndim == 2 else h   # row 1 = PCG iters
    t0 = time.time()
    t_hit, k_hit = None, None
    t_prev, k_prev = 0.0, 0
    while int(state.status) == 0 and int(state.k) < max_iterations:
        state, hist = run_block(state, hist, *run_args)
        np_hist = costs_of(np.asarray(hist))       # tiny fetch, forces sync
        now = time.time() - t0
        k_now = int(state.k)
        if t_hit is None and k_now > k_prev:
            for k in range(k_prev + 1, k_now + 1):
                if np_hist[k] < 0:
                    continue
                rmse_k = float(np.sqrt(2.0 * np_hist[k] / n_live))
                if rmse_k <= args.target_rmse:
                    k_hit = k
                    frac = (k - k_prev) / (k_now - k_prev)
                    t_hit = t_prev + frac * (now - t_prev)
                    break
        t_prev, k_prev = now, k_now
        # keep going to convergence so final_rmse is the true floor
    total_s = time.time() - t0
    full_hist = np.asarray(hist)
    np_hist = costs_of(full_hist)[: int(state.k) + 1]
    history = [
        (k, round(float(np.sqrt(2.0 * c / n_live)), 4))
        for k, c in enumerate(np_hist) if c >= 0
    ]
    import jax

    out = dict(
        time_to_rmse_s=t_hit, iters_to_rmse=k_hit,
        target_rmse=args.target_rmse,
        initial_rmse=round(rmse0, 4), final_rmse=history[-1][1],
        total_iterations=int(state.k), total_s=total_s,
        status=int(state.status), compile_s=compile_s,
        n_obs=int(n_live), history=history,
        platform=jax.devices()[0].platform, impl=impl,
    )
    if full_hist.ndim == 2:
        cg = full_hist[1][1: int(state.k) + 1]
        cg = cg[cg >= 0]
        if cg.size:
            out["cg_iters_mean"] = round(float(cg.mean()), 1)
            out["cg_iters_max"] = int(cg.max())
    return out


def _time_to_rmse_tiles(args) -> dict:
    """BAL-scale convergence quality (VERDICT r3 item 5): the tile engine
    from its noisy init with REAL criteria — trust-region accept/reject
    on, Ceres-default tolerances, PCG with a real relative tolerance
    (cg_tolerance=0.1, the ITERATIVE_SCHUR eta analogue) under the
    --cg-iters cap — proving the 1M-point problem CONVERGES on the chip
    (reference bar: every solve runs Ceres' convergence tests,
    src/sfm.cc:66-74)."""
    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_bal_tile_device
    from deeparc_tpu.solver.tiles import init_tile_state, make_tile_step

    n_pts = args.n_points or (4_000 if args.quick else 1_000_000)
    n_cam = 64 if args.quick else 2000
    # 5x the throughput rows' structure noise: the convergence row should
    # demonstrate real multi-iteration trust-region work, not a one-step
    # quadratic hop
    params, tiles, _, cam_free = make_bal_tile_device(
        n_cameras=n_cam, n_points=n_pts, track_length=8,
        pixel_noise=1.0, point_noise=0.1, seed=0, dtype=jnp.float32,
        window=None if args.bal_random else args.window,
    )
    n_ext = params.ext_rot.shape[0]
    cam_free = cam_free.at[:6].set(0.0)
    cam_free = cam_free.at[6 * (n_ext - 1): 6 * n_ext].set(0.0)
    cam_free = cam_free.at[6 * n_ext:].set(0.0)
    point_free = jnp.ones_like(params.points)

    options = SolverOptions(
        linear_solver="iterative_schur",
        cg_max_iterations=args.cg_iters, cg_tolerance=0.1,
        max_iterations=100,
    )
    impl = args.impl or (
        "pallas" if jax.default_backend() == "tpu" else "xla")
    t_step = make_tile_step(
        options, params, impl=impl,
        sweep_dtype=jnp.bfloat16 if args.sweep_dtype == "bf16" else None,
        sweep_block_n=args.sweep_block)
    block = 5
    hist_len = options.max_iterations + 1

    @jax.jit
    def run_block(s, hist, t, cf, pf):
        # hist row 0: post-iteration cost; row 1: PCG iterations the
        # linear solve used (VERDICT r3 item 5: "PCG iterations used")
        def body(carry):
            st, h = carry
            st2, info = t_step(st, t, cf, pf)
            h = h.at[0, st2.k].set(info.cost)
            h = h.at[1, st2.k].set(info.cg_iters.astype(h.dtype))
            return st2, h

        return jax.lax.while_loop(
            lambda c: (c[0].status == 0) & (c[0].k < s.k + block),
            body, (s, hist),
        )

    n_live = float(sum(float(jnp.sum(b.mask)) for b in tiles.buckets))
    state = init_tile_state(params, tiles, options, cam_free)
    hist = jnp.full((2, hist_len), -1.0,
                    state.cost.dtype).at[0, 0].set(state.cost)

    t_c = time.time()
    probe = run_block(state, hist, tiles, cam_free, point_free)
    float(probe[0].cost)
    compile_s = time.time() - t_c

    return _rmse_trace_loop(
        args, state, hist, run_block, (tiles, cam_free, point_free),
        n_live, options.max_iterations, compile_s, impl)


def measure_pipeline(args) -> dict:
    """Full reference pipeline at flagship scale: hemisphere fit ->
    freeze solve -> solve/filter rounds -> outputs (VERDICT r4 item 9 —
    the reference's value IS the loop, src/sfm.cc:118-127)."""
    import tempfile

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from deeparc_tpu.config import (
        FilterOptions, PipelineOptions, SolverOptions,
    )
    from deeparc_tpu.io.synthetic import make_hemisphere_rig
    from deeparc_tpu.pipeline.driver import run_pipeline

    if args.golden:
        # the hand-authored (externally-authored-format) fixture: the
        # pipeline driven end-to-end on input this codebase did not
        # generate (tests/fixtures/, VERDICT r4 missing item 1)
        from deeparc_tpu.io.native import read_deeparc_fast

        t0 = time.time()
        data = read_deeparc_fast(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "fixtures", "golden_nonshared.deeparc"))
        gen_s = time.time() - t0
        opts = PipelineOptions(
            solver=SolverOptions(max_iterations=args.pipeline_iters),
            filter=FilterOptions(hemisphere_cut=False),
            write_snapshots=False,
        )
        with tempfile.TemporaryDirectory() as tmp:
            t1 = time.time()
            res = run_pipeline(data, opts, output_dir=tmp,
                               basename="golden", dtype=jnp.float64,
                               verbose=False)
            wall = time.time() - t1
        return dict(
            pipeline_seconds=wall, gen_s=gen_s,
            filter_rounds=res.filter_rounds,
            final_cost=res.final_cost, final_rmse_px=res.final_rmse_px,
            points_alive=int(res.scene.n_points),
            n_obs=int(data.n_obs),
            rounds=list(res.rounds),
            platform=jax.devices()[0].platform, impl="auto",
        )
    cfg = build_config(args)
    t0 = time.time()
    rig = make_hemisphere_rig(
        n_arc=cfg["n_arc"], n_ring=cfg["n_ring"],
        n_points=cfg["n_points"], visibility=cfg["visibility"],
        occlusion_rings=cfg["occlusion_rings"],
        pixel_noise=cfg["pixel_noise"], point_noise=cfg["point_noise"],
        seed=cfg["seed"],
    )
    gen_s = time.time() - t0
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    opts = PipelineOptions(
        solver=SolverOptions(max_iterations=args.pipeline_iters),
        filter=FilterOptions(),
        write_snapshots=False,      # PLY pulls (N,3) to host per round
        engine="grid",
        impl="pallas" if on_tpu else "planes",
    )
    # no output_dir: snapshot/serialization IO is not what this row
    # measures (a 4M-obs .deeparc text write alone costs minutes); the
    # per-round records come from res.rounds
    t1 = time.time()
    res = run_pipeline(rig.data, opts, output_dir=None,
                       basename="bench", dtype=jnp.float32,
                       verbose=False)
    wall = time.time() - t1
    rounds = list(res.rounds)
    return dict(
        pipeline_seconds=wall, gen_s=gen_s,
        filter_rounds=res.filter_rounds,
        final_cost=res.final_cost, final_rmse_px=res.final_rmse_px,
        points_alive=int(res.scene.n_points),
        n_obs=int(rig.data.n_obs),
        rounds=[{k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in r.items()} for r in rounds],
        platform=jax.devices()[0].platform,
        impl=opts.impl,
    )


def measure_time_to_rmse(args) -> dict:
    """Wall-clock to target reprojection RMSE (BASELINE row 4).

    Runs the grid engine (default impl=pallas on TPU) on the sparse-rig
    config from its noisy init with REAL Ceres-default convergence
    tolerances — unlike the iter/s benchmark, steps can be rejected and the
    trust region does its actual job. Iterations run in on-device
    ``lax.while_loop`` blocks; between blocks the host derives
    RMSE = sqrt(2 * cost / n_live_obs) from the replicated state cost
    (trivial loss, so cost == 0.5 * sum r^2) and stamps the time the target
    was first met. The clock starts AFTER compilation (compile_s reported
    separately).
    """
    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_grid_rig_device
    from deeparc_tpu.solver.rig_grid import init_grid_state, make_grid_step

    cfg = build_config(args)
    if args.engine == "tiles" or args.bal:
        return _time_to_rmse_tiles(args)
    if args.impl is None:
        args.impl = "pallas" if jax.default_backend() == "tpu" else "planes"
    if args.impl not in {"planes", "einsum", "pallas"}:
        raise SystemExit(f"--impl {args.impl} is not valid for --time-to-rmse"
                         " (grid engine: planes | einsum | pallas)")

    params, grid, _ = make_grid_rig_device(
        n_arc=cfg["n_arc"], n_ring=cfg["n_ring"],
        n_points=cfg["n_points"], visibility=cfg["visibility"],
        occlusion_rings=cfg["occlusion_rings"],
        pixel_noise=cfg["pixel_noise"], point_noise=cfg["point_noise"],
        seed=cfg["seed"], dtype=jnp.float32,
    )
    band_widths = band_blocks = (0, 0)
    if args.impl == "pallas" and not args.no_band:
        import dataclasses as _dc

        from deeparc_tpu.solver.rig_band import band_grid

        prep = band_grid(grid)
        if prep is not None:
            grid = prep.grid
            params = _dc.replace(params, points=params.points[prep.perm])
            band_widths, band_blocks = prep.widths
    n_ext_rows = params.ext_rot.shape[0]
    K = params.center.shape[0]
    cam_free = jnp.ones(6 * n_ext_rows + 6 * K, jnp.float32)
    cam_free = cam_free.at[:6].set(0.0)
    cam_free = cam_free.at[6 * (n_ext_rows - 1): 6 * n_ext_rows].set(0.0)
    cam_free = cam_free.at[6 * n_ext_rows:].set(0.0)
    point_free = jnp.ones_like(params.points)

    import numpy as np

    options = SolverOptions(linear_solver="dense_schur", max_iterations=100)
    g_step = make_grid_step(options, params, args.chunk_size, impl=args.impl,
                            band_widths=band_widths,
                            band_blocks=band_blocks,
                            band_intr_frozen=True)
    block = 5
    hist_len = options.max_iterations + 1

    @jax.jit
    def run_block(s, hist, g, cf, pf):
        # g/cf/pf must be jit ARGUMENTS: closing over the (n_points, cells)
        # grid planes would embed them as compile-time constants. ``hist``
        # records the post-iteration cost at every iterate (VERDICT r3
        # item 9: exact per-iteration resolution, not block ceilings).
        def body(carry):
            st, h = carry
            st2, info = g_step(st, g, cf, pf)
            return st2, h.at[st2.k].set(info.cost)

        return jax.lax.while_loop(
            lambda c: (c[0].status == 0) & (c[0].k < s.k + block),
            body, (s, hist),
        )

    n_live = float(jnp.sum(grid.mask))
    state = init_grid_state(params, grid, options, impl=args.impl,
                            band_widths=band_widths, band_blocks=band_blocks)
    hist = jnp.full((hist_len,), -1.0,
                    state.cost.dtype).at[0].set(state.cost)

    t_c = time.time()
    probe = run_block(state, hist, grid, cam_free, point_free)  # compile
    float(probe[0].cost)
    compile_s = time.time() - t_c

    return _rmse_trace_loop(
        args, state, hist, run_block, (grid, cam_free, point_free),
        n_live, options.max_iterations, compile_s, args.impl)


def measure_scaling(args) -> dict:
    """Virtual-device scaling sweep (CPU backend, forced 8-way host split).

    Runs the sharded grid engine at 1, 2, 4, 8 shards of the SAME total
    problem. On a virtual mesh every "device" shares the host's physical
    cores, so this cannot show real speedup; what it measures is the
    DISTRIBUTION OVERHEAD t_n / t_1 of the sharded implementation (psum
    emulation, shard padding, per-shard dispatch) at equal total work —
    the quantity that must stay small for real-chip scaling to be good.
    True scaling efficiency (BASELINE row 3, >= 75% at >= 2 hosts) needs
    real chips; the code path is identical (parallel/multihost.py).
    Run in subprocesses so XLA_FLAGS takes effect.
    """
    out, out_iter = {}, {}
    n_points = args.n_points or 4096
    for n_dev in (1, 2, 4, 8):
        code = f"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count={n_dev}").strip()
import dataclasses, json, time
import jax
jax.config.update("jax_platforms", "cpu")
from deeparc_tpu.config import SolverOptions
from deeparc_tpu.io.synthetic import make_hemisphere_rig
from deeparc_tpu.parallel import make_mesh
from deeparc_tpu.parallel.sharded_grid import solve_ba_grid_sharded
from deeparc_tpu.scene import freeze_masks, from_deeparc
from deeparc_tpu.solver.rig_grid import grid_from_scene
import jax.numpy as jnp
rig = make_hemisphere_rig(n_arc=6, n_ring=16, n_points={n_points},
                          visibility=0.3, pixel_noise=1.0, point_noise=0.02,
                          seed=0)
scene = from_deeparc(rig.data, dtype=jnp.float32)
free = freeze_masks(scene)
grid = grid_from_scene(scene)
# negative tolerances: no convergence test can fire (this easy probe
# problem otherwise converges to bit-identical cost within ~4 iters and
# the 13-vs-3-iteration difference would measure nothing)
opts = SolverOptions(max_iterations=3, min_relative_decrease=-1.0,
                     function_tolerance=-1.0, gradient_tolerance=-1.0,
                     parameter_tolerance=-1.0)
mesh = make_mesh({n_dev})
solve_ba_grid_sharded(scene.params, grid, free, opts, mesh, chunk_size=1024)
t0 = time.time()
reps = 3
for _ in range(reps):
    solve_ba_grid_sharded(scene.params, grid, free, opts, mesh,
                          chunk_size=1024)
t3 = (time.time() - t0) / reps
# isolate the per-ITERATION steady-state cost from the per-solve constants
# (host-side shard prep, dispatch, init): a 13-iteration solve differs from
# the 3-iteration one by exactly 10 while_loop iterations
opts13 = dataclasses.replace(opts, max_iterations=13)
solve_ba_grid_sharded(scene.params, grid, free, opts13, mesh,
                      chunk_size=1024)
t0 = time.time()
for _ in range(reps):
    solve_ba_grid_sharded(scene.params, grid, free, opts13, mesh,
                          chunk_size=1024)
t13 = (time.time() - t0) / reps
print(json.dumps({{"t": t3, "t_iter": (t13 - t3) / 10.0}}))
"""
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1200, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode != 0:
            raise RuntimeError(f"scaling probe n={n_dev}: {r.stderr[-800:]}")
        j = json.loads(r.stdout.strip().splitlines()[-1])
        out[n_dev] = j["t"]
        out_iter[n_dev] = j["t_iter"]
    t1 = out[1]
    overhead = {n: t / t1 for n, t in out.items()}
    ti1 = out_iter[1]
    overhead_iter = {n: t / ti1 for n, t in out_iter.items()}
    # per-iteration collective payload (triu-packed symmetric psums):
    # hcc + Schur correction (C(C+1)/2 each) + g_c/rhs (C) + LM scalars
    R = 6 + 16 - 1 + 1
    C = 6 * (R + 6)
    payload = (2 * C * (C + 1) // 2 + 2 * C + 8) * 4
    return dict(seconds=out, overhead=overhead,
                seconds_per_iter=out_iter, overhead_per_iter=overhead_iter,
                psum_bytes_per_iter=payload)


def cpu_baseline(args) -> float:
    """CPU iter/s for the same config (cached; measured in a subprocess)."""
    cache_path = os.path.join(os.path.dirname(__file__), ".bench_cache.json")
    if args.bal:
        n = args.n_points or (4_000 if args.quick else 1_000_000)
    else:
        n = args.n_points or (2_000 if args.quick else 400_000)
    tag = ("_dense" if args.dense else "") + ("_bal" if args.bal else "") + (
        "rand" if args.bal_random else "")
    key = f"cpu_iters_per_sec_{args.engine}{tag}_n{n}"
    if args.engine == "grid" and not args.dense:
        key = f"cpu_iters_per_sec_n{n}"   # legacy cache key, round-1 value
    cache = {}
    if os.path.exists(cache_path):
        try:
            cache = json.load(open(cache_path))
        except Exception:
            cache = {}
    if key in cache:
        return cache[key]
    cmd = [
        sys.executable, os.path.abspath(__file__), "--measure-only",
        "--platform", "cpu", "--iters", "3", "--warmup", "1",
        "--engine", args.engine, "--chunk-size", str(args.chunk_size),
        "--cg-iters", str(args.cg_iters),
    ]
    # CPU comparator runs the pure-XLA impl (a Pallas kernel would run in
    # the interpreter on CPU — not a baseline)
    if args.engine == "grid":
        cmd += ["--impl", "planes"]
    elif args.engine == "tiles":
        cmd += ["--impl", "xla"]
    if args.quick:
        cmd.append("--quick")
    if args.dense:
        cmd.append("--dense")
    if args.bal:
        cmd.append("--bal")
    if args.bal_random:
        cmd.append("--bal-random")
    if args.n_points:
        cmd += ["--n-points", str(args.n_points)]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = out.stdout.strip().splitlines()[-1]
    value = json.loads(line)["iters_per_sec"]
    cache[key] = value
    with open(cache_path, "w") as f:
        json.dump(cache, f)
    return value


def ceres_equiv_baseline(args) -> float | None:
    """Ceres-equivalent CPU DENSE_SCHUR iter/s (BASELINE row 2 anchor).

    Cached in .bench_cache.json; measured by scripts/ceres_equiv_cpu.py —
    a single-process numpy/scipy implementation of the identical LM
    iteration (closed-form Jacobians, sparse JtJ/E products, dense Cholesky
    of the reduced camera system). Only measured on demand
    (--with-ceres-equiv); otherwise returns the cached value or None.
    """
    cache_path = os.path.join(os.path.dirname(__file__), ".bench_cache.json")
    n = args.n_points or (2_000 if args.quick else 400_000)
    key = f"ceres_equiv_v2_n{n}"
    cache = {}
    if os.path.exists(cache_path):
        try:
            cache = json.load(open(cache_path))
        except Exception:
            cache = {}
    if key in cache:
        return cache[key]
    if not args.with_ceres_equiv:
        return None
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "ceres_equiv_cpu.py")
    out = subprocess.run(
        [sys.executable, script, "--n-points", str(n), "--reps", "3",
         "--procs", "1,2"],
        capture_output=True, text=True, timeout=7200,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    parsed = json.loads(out.stdout.strip().splitlines()[-1])
    d = parsed["detail"]
    value = {
        "iters_per_sec": parsed["iters_per_sec"],
        "iters_per_sec_by_procs": d["iters_per_sec_by_procs"],
        "parallel_efficiency": d["parallel_efficiency"],
        "iters_per_sec_16t_est": d["iters_per_sec_16t_est"],
    }
    cache[key] = value
    with open(cache_path, "w") as f:
        json.dump(cache, f)
    return value


# Non-flagship rows run --no-baseline: a fresh CPU-baseline measurement of
# a 400k-4M-point problem costs 15+ min of CPU per row and duplicates what
# the flagship row's cached vs_baseline / vs_ceres_equiv already anchor.
MATRIX = [
    ("grid sparse rig (flagship: occlusion-windowed, banded pallas)",
     ["--engine", "grid"]),
    ("grid sparse uniform-random (no-locality worst case, pallas)",
     ["--engine", "grid", "--sparse-random", "--no-baseline"]),
    ("grid dense rig (pallas)",
     ["--engine", "grid", "--dense", "--no-baseline"]),
    ("grid dense rig (planes)",
     ["--engine", "grid", "--dense", "--impl", "planes", "--no-baseline"]),
    ("tiles sparse rig (pallas)", ["--engine", "tiles"]),
    ("tiles BAL 1M pts windowed (pallas)", ["--engine", "tiles", "--bal"]),
    ("tiles BAL 1M pts windowed (pallas, bf16 sweeps + 1024 blocks)",
     ["--engine", "tiles", "--bal", "--sweep-dtype", "bf16",
      "--sweep-block", "1024", "--no-baseline"]),
    ("tiles BAL 1M pts heavy-tailed tracks (mixed fused/XLA buckets)",
     ["--engine", "tiles", "--bal-heavytail", "--no-baseline",
      "--sweep-dtype", "bf16", "--sweep-block", "1024"]),
    ("tiles BAL 1M pts random graph (pallas)",
     ["--engine", "tiles", "--bal-random", "--no-baseline"]),
    ("tiles BAL 250k pts hub-contaminated shuffled graph (hub-robust RCM, "
     "bf16 sweeps)",
     ["--engine", "tiles", "--bal-hub", "--sweep-dtype", "bf16",
      "--sweep-block", "1024", "--no-baseline"]),
    # flat (M, 44)-packed layout: the flagship 400k-pt problem now fits the
    # 16 GB chip (the round-3 rank-3 layout padded ~28x and OOMed)
    ("indexed engine (reference layout, flagship 400k pts)",
     ["--engine", "indexed", "--no-baseline", "--iters", "3",
      "--warmup", "1"]),
    ("full pipeline loop, grid flagship (hemisphere fit + freeze solve + "
     "solve/filter rounds, src/sfm.cc:77-131)", ["--pipeline"]),
    ("full pipeline on the hand-authored golden .deeparc fixture "
     "(externally-authored format, native parser)",
     ["--pipeline", "--golden", "--platform", "cpu"]),
    ("time-to-RMSE 1.5px, grid sparse (BASELINE row 4)", ["--time-to-rmse"]),
    ("time-to-RMSE 1.5px, tiles BAL 1M pts (real tolerances, PCG eta=0.1)",
     ["--time-to-rmse", "--bal", "--sweep-dtype", "bf16",
      "--sweep-block", "1024"]),
    ("8-virtual-device distribution overhead (BASELINE row 3 proxy)",
     ["--scaling"]),
]


def run_matrix(args) -> int:
    """Every BASELINE row as one JSON line, recorded in BENCH.md."""
    here = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for name, flags in MATRIX:
        cmd = [sys.executable, os.path.abspath(__file__)] + flags
        print(f"# running: {name} ({' '.join(flags)})", file=sys.stderr)
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=7200, cwd=here)
        line = ""
        for cand in reversed(r.stdout.strip().splitlines() or [""]):
            if cand.startswith("{"):
                line = cand
                break
        ok = r.returncode == 0 and line
        rows.append((name, flags, line if ok
                     else f'{{"error": "rc={r.returncode}"}}'))
        print(f"#   -> {line[:160] if ok else r.stderr[-200:]} "
              f"[{time.time() - t0:.0f}s]", file=sys.stderr)

    import datetime

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    md = ["# BENCH — full benchmark matrix", "",
          f"Recorded {stamp} by `python bench.py --matrix` "
          "(one subprocess per row; TPU rows on the real chip).", "",
          "| config | metric | value | key detail |", "|---|---|---|---|"]
    for name, flags, line in rows:
        try:
            j = json.loads(line)
            det = j.get("detail", {})
            keys = ("live_obs_per_sec", "mfu_useful", "mfu_vs_f32_peak",
                    "n_obs", "v_local", "iters_to_rmse", "final_rmse",
                    "overhead")
            kd = ", ".join(f"{k}={det[k]}" for k in keys if k in det)
            md.append(f"| {name} | {j['metric']} | {j['value']} "
                      f"{j.get('unit', '')} | {kd} |")
        except Exception:
            md.append(f"| {name} | ERROR | — | {line[:80]} |")
    md += ["", "## Raw JSON lines", "", "```"]
    for name, flags, line in rows:
        md += [f"# {name}", line]
    md += ["```", ""]
    with open(os.path.join(here, "BENCH.md"), "w") as f:
        f.write("\n".join(md))
    with open(os.path.join(here, "BENCH_MATRIX.json"), "w") as f:
        json.dump([{"name": n, "flags": fl,
                    "result": json.loads(l) if l.startswith("{") else l}
                   for n, fl, l in rows], f, indent=1)
    print(json.dumps({"metric": "bench_matrix_rows", "value": len(rows),
                      "unit": "configs", "vs_baseline": None}))
    return 0


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.matrix:
        return run_matrix(args)
    if args.pipeline:
        result = measure_pipeline(args)
        print(json.dumps({
            "metric": "pipeline_seconds",
            "value": round(result["pipeline_seconds"], 3),
            "unit": "s",
            "vs_baseline": None,
            "detail": {k: result[k] for k in (
                "filter_rounds", "final_cost", "final_rmse_px",
                "points_alive", "n_obs", "rounds", "gen_s", "platform",
                "impl")},
        }))
        return 0
    if args.time_to_rmse:
        result = measure_time_to_rmse(args)
        vs = None
        # estimated CPU time-to-RMSE from the cached same-solver CPU iter/s
        # (a full CPU convergence run at 400k points would take ~hours);
        # only anchored for the grid config (the cached key is grid-shaped)
        try:
            if args.bal or args.engine == "tiles":
                raise KeyError("no CPU anchor for the BAL config")
            cache_path = os.path.join(os.path.dirname(__file__),
                                      ".bench_cache.json")
            n = args.n_points or (2_000 if args.quick else 400_000)
            cache = json.load(open(cache_path))
            cpu_ips = cache.get(f"cpu_iters_per_sec_n{n}")
            if cpu_ips and result["iters_to_rmse"]:
                vs = (result["iters_to_rmse"] / cpu_ips) / result[
                    "time_to_rmse_s"]
        except Exception:
            pass
        print(json.dumps({
            "metric": "time_to_rmse_seconds",
            "value": (round(result["time_to_rmse_s"], 3)
                      if result["time_to_rmse_s"] is not None else None),
            "unit": "s",
            "vs_baseline": round(vs, 2) if vs else None,
            "detail": {
                k: result[k] for k in (
                    "iters_to_rmse", "target_rmse", "initial_rmse",
                    "final_rmse", "total_iterations", "total_s", "status",
                    "compile_s", "n_obs", "platform", "impl", "history",
                    "cg_iters_mean", "cg_iters_max",
                ) if k in result
            },
        }))
        return 0
    if args.scaling:
        result = measure_scaling(args)
        ov8 = result["overhead"][8]
        print(json.dumps({
            "metric": "distribution_overhead_8dev",
            "value": round(ov8, 4),
            "unit": "x_single_device_time",
            "vs_baseline": None,
            "detail": {
                "note": "virtual shared-core mesh: 8 'devices' time-share "
                        "the host's 2 physical cores, so run-to-run "
                        "variance (r3: 0.51-0.67x; here within one run the "
                        "4-dev point beats 1-dev) exceeds the software "
                        "overhead being measured — the residual curve is "
                        "core oversubscription, not collectives: the "
                        "per-iteration psum payload is psum_bytes_per_iter "
                        "(triu-packed symmetric camera system, ~115 KB) "
                        "regardless of device count. Real scaling "
                        "efficiency requires real chips (multihost.py).",
                "seconds": {str(k): round(v, 4)
                            for k, v in result["seconds"].items()},
                "overhead": {str(k): round(v, 4)
                             for k, v in result["overhead"].items()},
                "seconds_per_iter": {
                    str(k): round(v, 4)
                    for k, v in result["seconds_per_iter"].items()},
                "overhead_per_iter": {
                    str(k): round(v, 4)
                    for k, v in result["overhead_per_iter"].items()},
                "psum_bytes_per_iter": result["psum_bytes_per_iter"],
            },
        }))
        return 0
    result = measure(args)
    if args.measure_only:
        print(json.dumps(result))
        return 0
    vs = None
    if not args.no_baseline:
        try:
            base = cpu_baseline(args)
            vs = result["iters_per_sec"] / base
        except Exception as e:
            print(f"# baseline measurement failed: {e}", file=sys.stderr)
    detail = {
        "n_obs": result["n_obs"], "n_points": result["n_points"],
        "slot_obs": result["slot_obs"],
        "live_obs_per_sec": round(result["live_obs_per_sec"]),
        "platform": result["platform"], "engine": args.engine,
        "impl": args.impl,
        "dense": bool(args.dense),
        "bal": bool(args.bal),
        "bal_random": bool(args.bal_random),
        "bal_hub": bool(args.bal_hub),
        "seconds_per_iter": round(result["seconds_per_iter"], 6),
        "compile_s": round(result["compile_s"], 2),
    }
    if "est_tflops" in result:
        detail["est_tflops"] = round(result["est_tflops"], 3)
    if "useful_tflops" in result:
        detail["useful_tflops"] = round(result["useful_tflops"], 3)
    if "measured_peak_tflops" in result:
        detail["measured_peak_tflops"] = result["measured_peak_tflops"]
        detail["mfu_useful"] = round(result["mfu_useful"], 4)
        if "mfu_vs_f32_peak" in result:
            detail["mfu_vs_f32_peak"] = round(result["mfu_vs_f32_peak"], 4)
    if result.get("v_local") is not None:
        detail["v_local"] = result["v_local"]
    if result.get("band") is not None:
        detail["band"] = result["band"]
    for k in ("phase_split", "vpu_peak_tflops", "lin_vpu_tflops",
              "vpu_fraction"):
        if result.get(k) is not None:
            detail[k] = result[k]
    if args.engine == "grid" and not args.dense:
        detail["sparse_random"] = bool(args.sparse_random)
        detail["occlusion_rings"] = (
            None if args.sparse_random else args.occlusion_rings)
    if args.engine == "grid" and not args.dense:
        try:
            ce = ceres_equiv_baseline(args)
        except Exception as e:
            print(f"# ceres-equiv measurement failed: {e}", file=sys.stderr)
            ce = None
        if ce:
            # vs the measured single-process anchor, and vs a 16-thread
            # Ceres estimate built from the anchor's MEASURED parallel
            # efficiency (the reference's num_threads=16, src/sfm.cc:70;
            # earlier rounds assumed perfect 16x scaling)
            detail["vs_ceres_equiv"] = round(
                result["iters_per_sec"] / ce["iters_per_sec"], 1)
            detail["vs_ceres_equiv_16t"] = round(
                result["iters_per_sec"] / ce["iters_per_sec_16t_est"], 1)
            detail["ceres_equiv_anchor"] = ce
    print(json.dumps({
        "metric": "ba_iterations_per_sec",
        "value": round(result["iters_per_sec"], 4),
        "unit": "iter/s",
        "vs_baseline": round(vs, 4) if vs is not None else None,
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
