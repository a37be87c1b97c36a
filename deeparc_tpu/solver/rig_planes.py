"""Plane-form (structure-of-arrays) linearization for the dense-grid engine.

The einsum formulation in :mod:`rig_grid` carries Jacobian blocks as
``(N, T, 2, 3)`` tensors. On TPU those trailing (2, 3) dims land in the
(sublane, lane) tile — padded to (8, 128) — so every elementwise op and
reduction runs at ~1/100 of the VPU/HBM roofline (measured: 729 ms of a
762 ms LM step at 100k points went to assembly).

This module computes the identical quantities with every intermediate a
``(N, T)`` *plane* (points x cells — both dims tile-friendly) and the small
2x3 / 3x3 structure unrolled into Python-level lists of planes:

  * projection/residual chain: pure VPU arithmetic on (N, T) planes;
  * the 2x18 camera Jacobian: 36 planes, stacked once into a
    ``(2N, 18, T)`` tensor so the per-slot Gram matrix H_cc and gradient are
    single batched MXU contractions;
  * the point-camera coupling E: per-column (N, T) @ (T, R) one-hot
    matmuls (MXU, contraction over the cell axis);
  * per-point H_pp / g_p: lane-axis reductions of (N, T) planes.

Derivation shortcuts (vs the chain in ``rig_grid.grid_jacobians``, itself
the closed form of ``src/snavely_reprojection_error.hh:38-118``):
with A = dres/dp3 (2x3 planes),

  j_t_outer = A                      j_x = A R_oi
  j_t_inner = B := A R_o             j_w_outer = -(B x p2) J_r(w_o)
  j_w_inner = -(j_x x X) J_r(w_i)

using  sum_c M_kc [v]_x,cd = (M_k x v)_d  to turn the cross-product matrix
contractions into plane cross products. Validated against the einsum
implementation in tests/test_rig_grid.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from deeparc_tpu.solver.loss import rho as loss_rho, weight as loss_weight


def _rows(M):
    """(T, 3, 3) -> 3x3 nested list of (1, T) planes."""
    return [[M[:, a, b][None, :] for b in range(3)] for a in range(3)]


def _vec(v):
    """(T, 3) -> list of 3 (1, T) planes."""
    return [v[:, a][None, :] for a in range(3)]


def _project_planes(points, sp, xy0, xy1, mask):
    """Shared residual-chain planes. Returns a dict of (N, T) planes."""
    X = [points[:, i:i + 1] for i in range(3)]         # (N, 1)
    Ri, Ro = _rows(sp.R_i), _rows(sp.R_o)
    ti, to = _vec(sp.t_i), _vec(sp.t_o)

    p2 = [X[0] * Ri[a][0] + X[1] * Ri[a][1] + X[2] * Ri[a][2] + ti[a]
          for a in range(3)]
    p3 = [p2[0] * Ro[a][0] + p2[1] * Ro[a][1] + p2[2] * Ro[a][2] + to[a]
          for a in range(3)]
    inv_z = 1.0 / p3[2]
    u0 = p3[0] * inv_z
    u1 = p3[1] * inv_z
    r2 = u0 * u0 + u1 * u1
    d0, d1 = sp.d0[None, :], sp.d1[None, :]
    dcoef = 1.0 + r2 * (d0 + d1 * r2)
    fx, fy = sp.fx[None, :], sp.fy[None, :]
    cx = sp.center[:, 0][None, :]
    cy = sp.center[:, 1][None, :]
    r0 = (fx * dcoef * u0 + cx - xy0) * mask
    r1 = (fy * dcoef * u1 + cy - xy1) * mask
    return dict(X=X, p2=p2, inv_z=inv_z, u0=u0, u1=u1, r2=r2,
                dcoef=dcoef, d0=d0, d1=d1, fx=fx, fy=fy, r0=r0, r1=r1)


def cost_planes(points, sp, xy0, xy1, mask, loss="trivial", loss_scale=0.5):
    """Robustified half-SSE over the grid — the trial-cost pass."""
    c = _project_planes(points, sp, xy0, xy1, mask)
    s = c["r0"] * c["r0"] + c["r1"] * c["r1"]
    return 0.5 * jnp.sum(loss_rho(s, loss, loss_scale) * mask)


def linearize_planes(
    points, sp, grid, xy0, xy1, mask,
    free_outer, free_inner, free_intr, point_free,
    loss="trivial", loss_scale=0.5,
):
    """One chunk's normal-equation pieces, all-plane arithmetic.

    Returns (cost, g_p (N,3), hpp (N,3,3), g_slots (T,18),
    hcc_slots (T,18,18), E (N,3,C)) matching the einsum implementation in
    ``rig_grid.assemble_grid_system`` bit-for-tolerance.
    """
    c = _project_planes(points, sp, xy0, xy1, mask)
    X, p2 = c["X"], c["p2"]
    inv_z, u0, u1, r2 = c["inv_z"], c["u0"], c["u1"], c["r2"]
    dcoef, fx, fy = c["dcoef"], c["fx"], c["fy"]
    r0, r1 = c["r0"], c["r1"]
    Ro, Roi = _rows(sp.R_o), _rows(sp.R_oi)
    Jro, Jri = _rows(sp.Jr_o), _rows(sp.Jr_i)

    raw_s = r0 * r0 + r1 * r1
    cost = 0.5 * jnp.sum(loss_rho(raw_s, loss, loss_scale) * mask)
    if loss != "trivial":
        w = loss_weight(raw_s, loss, loss_scale)
        wm = mask * w
        r0, r1 = r0 * w, r1 * w
    else:
        wm = mask

    # A = d res / d p3 (2x3), masked+weighted
    g = c["d0"] + 2.0 * c["d1"] * r2
    c00 = dcoef + 2.0 * g * u0 * u0
    c11 = dcoef + 2.0 * g * u1 * u1
    c01 = 2.0 * g * u0 * u1
    ccr = dcoef + 2.0 * g * r2
    fxz, fyz = fx * inv_z * wm, fy * inv_z * wm
    A = [[fxz * c00, fxz * c01, -fxz * u0 * ccr],
         [fyz * c01, fyz * c11, -fyz * u1 * ccr]]

    def chain(Ak, M):
        return [Ak[0] * M[0][b] + Ak[1] * M[1][b] + Ak[2] * M[2][b]
                for b in range(3)]

    def cross(v, w):
        return [v[1] * w[2] - v[2] * w[1],
                v[2] * w[0] - v[0] * w[2],
                v[0] * w[1] - v[1] * w[0]]

    jx, jti, jwo, jwi = [], [], [], []
    for k in range(2):
        jx_k = chain(A[k], Roi)
        B_k = chain(A[k], Ro)
        Cw = cross(B_k, p2)
        Dw = cross(jx_k, X)
        jwo.append([-(Cw[0] * Jro[0][b] + Cw[1] * Jro[1][b]
                      + Cw[2] * Jro[2][b]) for b in range(3)])
        jwi.append([-(Dw[0] * Jri[0][b] + Dw[1] * Jri[1][b]
                      + Dw[2] * Jri[2][b]) for b in range(3)])
        jx.append(jx_k)
        jti.append(B_k)

    # intrinsic columns [cx, cy, f0, f1, d0, d1] (2 x 6 planes)
    zero = jnp.zeros_like(wm)
    du0, du1 = dcoef * u0, dcoef * u1
    sh = grid.focal_shared[None, :] > 0.5
    m1 = grid.dist_m1[None, :]
    m2 = grid.dist_m2[None, :]
    jint = [
        [wm, zero, du0 * wm, zero,
         fx * u0 * r2 * m1 * wm, fx * u0 * r2 * r2 * m2 * wm],
        [zero, wm, jnp.where(sh, du1, 0.0) * wm,
         jnp.where(sh, 0.0, du1) * wm,
         fy * u1 * r2 * m1 * wm, fy * u1 * r2 * r2 * m2 * wm],
    ]

    # freeze masks: cameras per (slot, column); points per (point, axis)
    pf = [point_free[:, b:b + 1] for b in range(3)]
    jx_f = [[jx[k][b] * pf[b] for b in range(3)] for k in range(2)]
    P = [
        [jwo[k][b] * free_outer[:, b][None, :] for b in range(3)]
        + [A[k][b] * free_outer[:, 3 + b][None, :] for b in range(3)]
        + [jwi[k][b] * free_inner[:, b][None, :] for b in range(3)]
        + [jti[k][b] * free_inner[:, 3 + b][None, :] for b in range(3)]
        + [jint[k][j] * free_intr[:, j][None, :] for j in range(6)]
        for k in range(2)
    ]

    # point side: lane-axis reductions
    g_p = jnp.stack(
        [jnp.sum(jx_f[0][i] * r0 + jx_f[1][i] * r1, axis=1)
         for i in range(3)], axis=-1)
    h = {}
    for i in range(3):
        for j in range(i, 3):
            h[i, j] = jnp.sum(
                jx_f[0][i] * jx_f[0][j] + jx_f[1][i] * jx_f[1][j], axis=1)
    hpp = jnp.stack([
        jnp.stack([h[min(i, j), max(i, j)] for j in range(3)], axis=-1)
        for i in range(3)], axis=-2)

    # camera side: one (2N, 18, T) stack -> batched MXU contractions
    Jbig = jnp.stack(
        [jnp.stack(P[k], axis=1) for k in range(2)]
    ).reshape((-1,) + (18, mask.shape[1]))                  # (2N, 18, T)
    rbig = jnp.concatenate([r0, r1])                        # (2N, T)
    g_slots = jnp.einsum("xit,xt->ti", Jbig, rbig)          # (T, 18)
    hcc_slots = jnp.einsum("xit,xjt->tij", Jbig, Jbig)      # (T, 18, 18)

    # E: per-column one-hot matmuls over the cell axis (MXU)
    groups = ((0, grid.onehot_outer, grid.onehot_inner),
              (12, grid.onehot_intr, None))
    e_rows = []
    for i in range(3):
        segs = []
        for off, oh_a, oh_b in groups:
            cols = []
            for j in range(6):
                W = jx_f[0][i] * P[0][off + j] + jx_f[1][i] * P[1][off + j]
                col = W @ oh_a
                if oh_b is not None:
                    W2 = (jx_f[0][i] * P[0][off + 6 + j]
                          + jx_f[1][i] * P[1][off + 6 + j])
                    col = col + W2 @ oh_b
                cols.append(col)
            seg = jnp.stack(cols, axis=-1)                  # (N, R, 6)
            segs.append(seg.reshape(seg.shape[0], -1))      # (N, 6R)
        e_rows.append(jnp.concatenate(segs, axis=-1))
    E = jnp.stack(e_rows, axis=1)                           # (N, 3, C)
    return cost, g_p, hpp, g_slots, hcc_slots, E
