#!/usr/bin/env python
"""Benchmark: BA LM iterations/sec on the synthetic hemisphere rig.

Prints ONE JSON line:
    {"metric": "ba_iterations_per_sec", "value": ..., "unit": "iter/s",
     "vs_baseline": ...}

The reference publishes no numbers (BASELINE.md); the operative target is
>= 5x CPU-Ceres-equivalent BA iterations/sec (BASELINE.json). The baseline
here is the same solver on the CPU backend (measured once per problem config
in a subprocess and cached in .bench_cache.json); ``vs_baseline`` is
TPU-iter/s over CPU-iter/s.

One "iteration" = one full LM step: residual + Jacobian blocks, Schur
elimination of all points, reduced camera solve (fixed 30-iteration PCG so
work per step is deterministic), trial cost, trust-region update — the same
unit Ceres reports per line of its minimizer progress.

Usage:
    python bench.py                 # full config (~400k points) on default device
    python bench.py --quick         # small config, fast smoke
    python bench.py --platform cpu  # force CPU backend
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--engine", default="grid", choices=["grid", "indexed"],
                   help="grid = dense (N x cells) rig engine (TPU-native); "
                        "indexed = observation-list engine")
    p.add_argument("--chunk-size", type=int, default=8192)
    p.add_argument("--impl", default="planes",
                   choices=["planes", "einsum", "pallas"],
                   help="grid-engine linearization kernel")
    return p.parse_args(argv)


def build_config(args):
    n_points = args.n_points or (2_000 if args.quick else 400_000)
    # 8 arcs x 24 rings; visibility thinned so mean track length ~ 10
    return dict(
        n_arc=8, n_ring=24, n_points=n_points,
        visibility=10.0 / (8 * 24), pixel_noise=1.0, point_noise=0.02,
        seed=0,
    )


def measure(args) -> dict:
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.io.synthetic import make_hemisphere_rig
    from deeparc_tpu.residuals.reprojection import flatten_camera
    from deeparc_tpu.scene import freeze_masks, from_deeparc
    from deeparc_tpu.solver.ba import init_state, make_step_pure

    cfg = build_config(args)

    if args.engine != "grid" and args.impl != "planes":
        raise SystemExit(
            f"--impl {args.impl} only applies to --engine grid; "
            f"the {args.engine} engine has no linearization-kernel variants"
        )
    if args.engine == "grid":
        from deeparc_tpu.io.synthetic import make_grid_rig_device
        from deeparc_tpu.solver.rig_grid import init_grid_state, make_grid_step

        # device-side problem synthesis: only tiny camera tables cross the
        # host->device boundary (a tunneled TPU uploads at ~MB/s)
        params, grid, _ = make_grid_rig_device(
            n_arc=cfg["n_arc"], n_ring=cfg["n_ring"],
            n_points=cfg["n_points"], visibility=cfg["visibility"],
            pixel_noise=cfg["pixel_noise"], point_noise=cfg["point_noise"],
            seed=cfg["seed"], dtype=jnp.float32,
        )
        n_ext_rows = params.ext_rot.shape[0]
        cam_free = jnp.ones(6 * n_ext_rows + 6 * params.center.shape[0],
                            jnp.float32)
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
        g_step = make_grid_step(options, params, args.chunk_size,
                                impl=args.impl)
        step = jax.jit(lambda s, g, cf, pf: g_step(s, g, cf, pf)[0],
                       donate_argnums=(0,))
        state = init_grid_state(params, grid, options, impl=args.impl)
        step_args = (grid, cam_free, point_free)
        n_obs_real = int(jnp.sum(grid.mask))
        n_points_real = cfg["n_points"]
    else:
        rig = make_hemisphere_rig(**cfg)
        # f32 on accelerators (f64 is software-emulated on TPU)
        scene = from_deeparc(rig.data, dtype=jnp.float32)
        free = freeze_masks(scene)
        cam_free = flatten_camera(free)
        point_free = free.points
        n_obs_real = scene.n_obs
        n_points_real = scene.n_points
        options = SolverOptions(
            linear_solver="iterative_schur",
            cg_max_iterations=30,
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

    return dict(
        iters_per_sec=args.iters / dt,
        seconds_per_iter=dt / args.iters,
        compile_s=compile_s,
        n_obs=n_obs_real,
        n_points=n_points_real,
        platform=jax.devices()[0].platform,
        device=str(jax.devices()[0]),
        final_cost=float(state.cost),
    )


def cpu_baseline(args) -> float:
    """CPU iter/s for the same config (cached; measured in a subprocess)."""
    cache_path = os.path.join(os.path.dirname(__file__), ".bench_cache.json")
    key = f"cpu_iters_per_sec_n{args.n_points or (2_000 if args.quick else 400_000)}"
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
    ]
    if args.quick:
        cmd.append("--quick")
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


def main(argv=None) -> int:
    args = parse_args(argv)
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
    print(json.dumps({
        "metric": "ba_iterations_per_sec",
        "value": round(result["iters_per_sec"], 4),
        "unit": "iter/s",
        "vs_baseline": round(vs, 4) if vs is not None else None,
        "detail": {
            "n_obs": result["n_obs"], "n_points": result["n_points"],
            "platform": result["platform"], "engine": args.engine,
            "seconds_per_iter": round(result["seconds_per_iter"], 6),
            "compile_s": round(result["compile_s"], 2),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
