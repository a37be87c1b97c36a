#!/usr/bin/env python
"""Phase breakdown of one tile-engine LM step at BAL scale.

Times each phase of solver/tiles.make_tile_step separately (jitted alone, so
XLA cannot fuse across phases — the split is indicative, not exact):

    linearize   linearize_tiles: projection chain + closed-form Jacobians +
                one-hot camera binning of g_c and the packed 171-entry Gram
    sweep_rhs   one fused rhs sweep (E^T B^-1 g_p), pallas vs xla
    sweep_mv    one PCG matvec correction sweep (E^T B^-1 E v)
    edot        the back-substitution sweep (E v)
    trial_cost  tile_cost residual-only pass

Usage:
    python scripts/profile_tiles.py [--bal | --rig] [--n-points N] [--reps R]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *a, reps=3, **kw):
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    # force a device->host VALUE fetch (the axon relay can ack early)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a, **kw)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.time() - t0) / reps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bal", action="store_true", default=True)
    p.add_argument("--rig", dest="bal", action="store_false")
    p.add_argument("--n-points", type=int, default=None)
    p.add_argument("--n-cameras", type=int, default=2000)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    from deeparc_tpu.config import SolverOptions
    from deeparc_tpu.kernels.tile_pallas import pack_bucket_planes, tile_sweep
    from deeparc_tpu.solver.linalg import inv3x3
    from deeparc_tpu.solver.tiles import (
        _cell_slot_params, _e_dot_cells, _e_sweep, init_tile_state,
        linearize_tiles, pack_cells, tile_cost,
    )
    from deeparc_tpu.solver.trust_region import lm_diagonal

    if args.bal:
        from deeparc_tpu.io.synthetic import make_bal_tile_device

        n_pts = args.n_points or 1_000_000
        params, tiles, _, cam_free = make_bal_tile_device(
            n_cameras=args.n_cameras, n_points=n_pts, track_length=8,
            pixel_noise=1.0, point_noise=0.02, seed=0, dtype=jnp.float32)
    else:
        from deeparc_tpu.io.synthetic import make_tile_rig_device

        n_pts = args.n_points or 400_000
        params, tiles, _, cam_free = make_tile_rig_device(
            n_arc=8, n_ring=24, n_points=n_pts, track_length=10,
            pixel_noise=1.0, point_noise=0.02, seed=0, dtype=jnp.float32)

    C = cam_free.shape[0]
    V = int(tiles.cells.slot_outer.shape[0])
    n_obs = int(sum(float(jnp.sum(b.mask)) for b in tiles.buckets))
    widths = [tuple(b.cell.shape) for b in tiles.buckets]
    print(f"# config: {params.points.shape[0]} point rows, V={V} cells, "
          f"{n_obs} live obs, buckets={widths}, "
          f"platform={jax.devices()[0].platform}")

    opts = SolverOptions()
    point_free = jnp.ones_like(params.points)
    sp = _cell_slot_params(params, tiles.cells)
    packed = pack_cells(sp, tiles.cells, cam_free)

    # NOTE: device arrays (tiles, packed, the linearized system) must be jit
    # ARGUMENTS, not closures — closed-over arrays are baked into the HLO as
    # constants, and on the axon relay the compile request then exceeds the
    # tunnel body limit (HTTP 413) at BA sizes.
    lin = jax.jit(lambda pts, pk, t, pf: linearize_tiles(pts, pk, t, pf, C))
    t_lin = timed(lin, params.points, packed, tiles, point_free,
                  reps=args.reps)
    print(f"linearize        {t_lin * 1e3:9.1f} ms")
    sys = lin(params.points, packed, tiles, point_free)

    diag = jnp.diagonal(sys.hpp, axis1=-2, axis2=-1)
    d2p = lm_diagonal(diag, opts.min_lm_diagonal, opts.max_lm_diagonal)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    binv = inv3x3(sys.hpp + eye3 * d2p[:, :, None])
    v_cells = jnp.ones((V, 18), jnp.float32) * 1e-3

    t_cost = timed(
        jax.jit(lambda pts, pk, t: tile_cost(pts, pk, t)),
        params.points, packed, tiles, reps=args.reps)
    print(f"trial_cost       {t_cost * 1e3:9.1f} ms")

    xla_rhs = jax.jit(lambda t, s, b: _e_sweep(t, s, b, None, True))
    xla_mv = jax.jit(lambda t, s, b, v: _e_sweep(t, s, b, v, False))
    xla_ed = jax.jit(lambda t, s, v: _e_dot_cells(t, s, v))
    t_xla_rhs = timed(xla_rhs, tiles, sys, binv, reps=args.reps)
    t_xla_mv = timed(xla_mv, tiles, sys, binv, v_cells, reps=args.reps)
    t_xla_ed = timed(xla_ed, tiles, sys, v_cells, reps=args.reps)
    print(f"sweeps xla       rhs {t_xla_rhs * 1e3:9.1f} ms   "
          f"mv {t_xla_mv * 1e3:9.1f} ms   edot {t_xla_ed * 1e3:9.1f} ms")

    interpret = jax.default_backend() != "tpu"
    zeros_v = jnp.zeros((V, 18), jnp.float32)

    def pallas_mode(mode, v, t, s, bi):
        out = None
        offset = 0
        for b, blk in zip(t.buckets, s.blocks):
            Nb, W = b.cell.shape
            cell_t, jcam_t, jx_t = pack_bucket_planes(blk.j_x, blk.j_cam,
                                                      b.cell)
            binv_t = bi[offset: offset + Nb].reshape(Nb, 9).T
            gp_t = s.g_p[offset: offset + Nb].T
            r = tile_sweep(cell_t, jcam_t, jx_t, binv_t, gp_t, v,
                           mode=mode, interpret=interpret)
            out = r if out is None else (out + r if mode != "edot" else out)
            offset += Nb
        return out

    t_p_rhs = timed(
        jax.jit(lambda t, s, bi: pallas_mode("rhs", zeros_v, t, s, bi)),
        tiles, sys, binv, reps=args.reps)
    t_p_mv = timed(
        jax.jit(lambda t, s, bi, v: pallas_mode("matvec", v, t, s, bi)),
        tiles, sys, binv, v_cells, reps=args.reps)
    t_p_ed = timed(
        jax.jit(lambda t, s, bi, v: pallas_mode("edot", v, t, s, bi)),
        tiles, sys, binv, v_cells, reps=args.reps)

    print(f"sweep rhs   xla  {t_xla_rhs * 1e3:9.1f} ms   "
          f"pallas {t_p_rhs * 1e3:9.1f} ms")
    print(f"sweep mv    xla  {t_xla_mv * 1e3:9.1f} ms   "
          f"pallas {t_p_mv * 1e3:9.1f} ms")
    print(f"edot        xla  {t_xla_ed * 1e3:9.1f} ms   "
          f"pallas {t_p_ed * 1e3:9.1f} ms")
    est_xla = t_lin + t_cost + t_xla_rhs + 30 * t_xla_mv + t_xla_ed
    est_pal = t_lin + t_cost + t_p_rhs + 30 * t_p_mv + t_p_ed
    print(f"# est step (30 CG): xla {est_xla:.3f} s, pallas {est_pal:.3f} s")
    print(f"# pallas step share: linearize {t_lin / est_pal * 100:.0f}%%, "
          f"sweeps {(t_p_rhs + 30 * t_p_mv + t_p_ed) / est_pal * 100:.0f}%%, "
          f"trial {t_cost / est_pal * 100:.0f}%%")


if __name__ == "__main__":
    main()
