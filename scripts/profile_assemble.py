#!/usr/bin/env python
"""Sub-phase timing inside assemble_grid_system's chunk function."""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3):
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from deeparc_tpu.io.synthetic import make_grid_rig_device
    from deeparc_tpu.solver import rig_grid as rg

    print(f"device: {jax.devices()[0]}", flush=True)
    # exactly one chunk worth of points
    params, grid, _ = make_grid_rig_device(
        n_arc=8, n_ring=24, n_points=args.n_points,
        visibility=10.0 / 192, pixel_noise=1.0, point_noise=0.02, seed=0,
        dtype=jnp.float32,
    )
    sp = jax.jit(rg.slot_params)(params, grid)
    jax.block_until_ready(sp)
    points = params.points
    results = {}

    jac = jax.jit(lambda p: rg.grid_jacobians(p, sp, grid))
    results["jacobians_ms"] = timed(jac, points, reps=args.reps)
    blocks = jac(points)
    jax.block_until_ready(blocks)

    def point_side(b):
        g_p = jnp.einsum("ptki,ptk->pi", b.j_x, b.r)
        hpp = jnp.einsum("ptki,ptkj->pij", b.j_x, b.j_x)
        return g_p, hpp

    results["point_side_ms"] = timed(jax.jit(point_side), blocks,
                                     reps=args.reps)

    def cam_grad(b):
        outer, inner, intr = rg._cam_groups(b)
        g_out = jnp.einsum("ptkj,ptk->tj", outer, b.r)
        g_in = jnp.einsum("ptkj,ptk->tj", inner, b.r)
        g_int = jnp.einsum("ptkj,ptk->tj", intr, b.r)
        return g_out, g_in, g_int

    results["cam_grad_ms"] = timed(jax.jit(cam_grad), blocks, reps=args.reps)

    def hcc_part(b):
        outer, inner, intr = rg._cam_groups(b)
        J18 = jnp.concatenate([outer, inner, intr], axis=-1)
        return jnp.einsum("ptki,ptkj->tij", J18, J18)

    results["hcc_ms"] = timed(jax.jit(hcc_part), blocks, reps=args.reps)

    def e_parts(b):
        outer, inner, intr = rg._cam_groups(b)

        def e_part(grp, oh):
            W = jnp.einsum("ptki,ptkj->ptij", b.j_x, grp)
            binned = jnp.einsum("ptij,tr->prij", W, oh)
            cdim = binned.shape[1] * 6
            return binned.transpose(0, 2, 1, 3).reshape(-1, 3, cdim)

        E_ext = e_part(outer, grid.onehot_outer) + e_part(
            inner, grid.onehot_inner)
        E_int = e_part(intr, grid.onehot_intr)
        return jnp.concatenate([E_ext, E_int], axis=-1)

    results["E_ms"] = timed(jax.jit(e_parts), blocks, reps=args.reps)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
