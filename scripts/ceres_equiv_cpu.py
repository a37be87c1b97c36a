#!/usr/bin/env python
"""Ceres-equivalent CPU DENSE_SCHUR timing anchor (BASELINE row 2).

The reference solves with ``ceres::DENSE_SCHUR`` on 16 CPU threads
(``src/sfm.cc:66-73``). Its datasets are stripped, so this script measures a
faithful CPU re-implementation of one LM iteration's work on the SAME
synthetic problem the bench uses, with the same algorithmic structure Ceres
executes:

  1. closed-form residuals + per-observation Jacobian blocks (the work
     Ceres' autodiff Jets do), vectorized single-thread numpy;
  2. per-point 3x3 Hessian blocks + gradients (sorted ``np.add.reduceat``);
  3. the camera system via scipy SPARSE matmuls (C++ kernels):
     Hcc = Jc^T Jc,  E = Jp^T Jc,  S = Hcc - E^T B^-1 E  with block-diagonal
     B^-1 as a sparse operator;
  4. dense Cholesky of S (scipy cho_factor) + back-substitution;
  5. a trial-cost re-evaluation.

Prints one JSON line: {"iters_per_sec": ..., "detail": {...}}. Single
threaded; Ceres with 16 threads parallelizes steps 1-3, so the bench also
reports an optimistic 16x-scaled figure — beating THAT number beats any
realistic Ceres configuration of the reference.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import scipy.linalg
import scipy.sparse


def linearize_numpy(pts, Ri, Ro, Roi, ti, to, Jro, Jri, fx, fy, cx, cy,
                    d0, d1, m1, m2, xy):
    """Closed-form residual + Jacobian blocks, flat (M,) numpy.

    Same math as solver/tiles._linearize_chunk (itself the closed form of
    src/snavely_reprojection_error.hh:38-118).
    """
    p2 = np.einsum("mij,mj->mi", Ri, pts) + ti
    p3 = np.einsum("mij,mj->mi", Ro, p2) + to
    inv_z = 1.0 / p3[:, 2]
    u = p3[:, :2] * inv_z[:, None]
    r2 = np.sum(u * u, axis=1)
    dcoef = 1.0 + r2 * (d0 + d1 * r2)
    f2 = np.stack([fx, fy], axis=1)
    pred = f2 * dcoef[:, None] * u + np.stack([cx, cy], axis=1)
    r = pred - xy

    zero = np.zeros_like(inv_z)
    du_dp = np.stack(
        [np.stack([inv_z, zero, -u[:, 0] * inv_z], axis=1),
         np.stack([zero, inv_z, -u[:, 1] * inv_z], axis=1)], axis=1)
    ddcoef = d0 + 2.0 * d1 * r2
    dr2_dp = 2.0 * np.einsum("mk,mka->ma", u, du_dp)
    dres_dp = f2[:, :, None] * (
        dcoef[:, None, None] * du_dp
        + u[:, :, None] * (ddcoef[:, None] * dr2_dp)[:, None, :])

    j_x = np.einsum("mka,mab->mkb", dres_dp, Roi)
    j_to = dres_dp

    def crossm(v):
        out = np.zeros(v.shape[:-1] + (3, 3))
        out[..., 0, 1] = -v[..., 2]
        out[..., 0, 2] = v[..., 1]
        out[..., 1, 0] = v[..., 2]
        out[..., 1, 2] = -v[..., 0]
        out[..., 2, 0] = -v[..., 1]
        out[..., 2, 1] = v[..., 0]
        return out

    j_wo = np.einsum(
        "mka,mab->mkb", dres_dp,
        -np.einsum("mij,mjk,mkl->mil", Ro, crossm(p2), Jro))
    j_ti = np.einsum("mka,mab->mkb", dres_dp, Ro)
    j_wi = np.einsum(
        "mka,mab->mkb", dres_dp,
        -np.einsum("mij,mjk,mkl->mil", Roi, crossm(pts), Jri))
    j_cam = np.concatenate([j_wo, j_to, j_wi, j_ti], axis=2)  # (M, 2, 12)
    return r, j_x, j_cam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=400_000)
    ap.add_argument("--n-arc", type=int, default=8)
    ap.add_argument("--n-ring", type=int, default=24)
    ap.add_argument("--visibility", type=float, default=10.0 / 192)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from deeparc_tpu.io.synthetic import make_hemisphere_rig
    from deeparc_tpu.scene import from_deeparc

    t0 = time.time()
    rig = make_hemisphere_rig(
        n_arc=args.n_arc, n_ring=args.n_ring, n_points=args.n_points,
        visibility=args.visibility, pixel_noise=1.0, point_noise=0.02,
        seed=args.seed,
    )
    scene = from_deeparc(rig.data)
    gen_s = time.time() - t0

    idx = scene.index
    obs_point = np.asarray(idx.obs_point)
    outer = np.asarray(idx.obs_outer)
    inner = np.asarray(idx.obs_inner)
    intr = np.asarray(idx.obs_intr)
    xy = np.asarray(idx.obs_xy)
    M = obs_point.size
    N = scene.n_points
    R_rows = int(np.asarray(scene.params.ext_rot).shape[0])
    C = 6 * R_rows  # extrinsics only free (bench config freezes intrinsics)

    ext_rot = np.asarray(scene.params.ext_rot)
    ext_trans = np.asarray(scene.params.ext_trans)
    center = np.asarray(scene.params.center)
    focal = np.asarray(scene.params.focal)
    dist = np.asarray(scene.params.dist)
    points = np.asarray(scene.params.points)
    fsh = np.asarray(idx.focal_shared)
    dm1 = np.asarray(idx.dist_m1)
    dm2 = np.asarray(idx.dist_m2)

    from scipy.spatial.transform import Rotation

    def aa_to_R(aa):
        return Rotation.from_rotvec(np.array(aa)).as_matrix()

    def right_jacobian(aa):
        # J_r(w): closed form (matches geometry/rotation.so3_right_jacobian)
        th = np.linalg.norm(aa, axis=-1, keepdims=True)
        th = np.maximum(th, 1e-12)
        k = aa / th
        K = np.zeros(aa.shape[:-1] + (3, 3))
        K[..., 0, 1] = -k[..., 2]
        K[..., 0, 2] = k[..., 1]
        K[..., 1, 0] = k[..., 2]
        K[..., 1, 2] = -k[..., 0]
        K[..., 2, 0] = -k[..., 1]
        K[..., 2, 1] = k[..., 0]
        t = th[..., None]
        A = (1 - np.cos(t)) / t
        B = (t - np.sin(t)) / t
        eye = np.eye(3)
        return eye - A * K + B * (K @ K)

    # segment boundaries (observations are point-sorted)
    seg_starts = np.searchsorted(obs_point, np.arange(N))

    # precompute per-obs gathered camera quantities once per "iteration"
    def one_lm_iteration():
        R_all = aa_to_R(ext_rot)
        Jr_all = right_jacobian(ext_rot)
        Ri = R_all[inner]
        Ro = R_all[outer]
        Roi = np.einsum("mij,mjk->mik", Ro, Ri)
        ti = ext_trans[inner]
        to = ext_trans[outer]
        fx = focal[intr, 0]
        fy = np.where(fsh[intr] > 0.5, focal[intr, 0], focal[intr, 1])
        d0 = dist[intr, 0] * dm1[intr]
        d1 = dist[intr, 1] * dm2[intr]
        r, j_x, j_cam = linearize_numpy(
            points[obs_point], Ri, Ro, Roi, ti, to,
            Jr_all[outer], Jr_all[inner], fx, fy,
            center[intr, 0], center[intr, 1], d0, d1,
            dm1[intr], dm2[intr], xy)

        # point side: sorted segment reductions
        gp_obs = np.einsum("mki,mk->mi", j_x, r)
        hpp_obs = np.einsum("mki,mkj->mij", j_x, j_x)
        g_p = np.add.reduceat(gp_obs, seg_starts, axis=0)
        hpp = np.add.reduceat(hpp_obs.reshape(M, 9), seg_starts,
                              axis=0).reshape(N, 3, 3)
        binv = np.linalg.inv(hpp + 1e-4 * np.eye(3))

        # camera side: scipy sparse products (Ceres' block-sparse algebra)
        cols_o = (outer[:, None] * 6 + np.arange(6)).astype(np.int64)
        cols_i = (inner[:, None] * 6 + np.arange(6)).astype(np.int64)
        cols = np.concatenate(
            [np.broadcast_to(cols_o[:, None, :], (M, 2, 6)),
             np.broadcast_to(cols_i[:, None, :], (M, 2, 6))], axis=2).ravel()
        Jc = scipy.sparse.csr_matrix(
            (j_cam.ravel(), (np.repeat(np.arange(2 * M), 12), cols)),
            shape=(2 * M, C))
        prow = np.repeat(np.arange(2 * M), 3)
        pcol = (obs_point[:, None, None] * 3
                + np.arange(3)[None, None, :]).repeat(2, axis=1).ravel()
        Jp = scipy.sparse.csr_matrix(
            (j_x.ravel(), (prow, pcol)), shape=(2 * M, 3 * N))

        hcc = (Jc.T @ Jc).toarray()
        E = (Jp.T @ Jc).toarray().reshape(N, 3, C)
        w = np.einsum("pij,pj->pi", binv, g_p)
        g_c = Jc.T @ r.ravel()
        rhs = -g_c + np.einsum("pic,pi->c", E, w)
        BE = np.einsum("pij,pjc->pic", binv, E)
        # BLAS dgemm (may be multithreaded — favors the baseline, keeping
        # the comparison conservative for us)
        S = hcc + 1e-4 * np.eye(C) - E.reshape(3 * N, C).T @ BE.reshape(
            3 * N, C)
        # gauge rows (frozen ext 0 + identity row) -> identity
        frozen = np.zeros(C, bool)
        frozen[:6] = True
        frozen[6 * (R_rows - 1):] = True
        S[frozen] = 0.0
        S[:, frozen] = 0.0
        S[frozen, frozen] = 1.0
        rhs[frozen] = 0.0
        dc = scipy.linalg.cho_solve(scipy.linalg.cho_factor(S), rhs)
        e_dc = np.einsum("pic,c->pi", E, dc)
        dp = -np.einsum("pij,pj->pi", binv, g_p + e_dc)

        # trial cost re-evaluation (projection only)
        trial = points + dp
        p2 = np.einsum("mij,mj->mi", Ri, trial[obs_point]) + ti
        p3 = np.einsum("mij,mj->mi", Ro, p2) + to
        u = p3[:, :2] / p3[:, 2:3]
        r2v = np.sum(u * u, axis=1)
        dc2 = 1.0 + r2v * (d0 + d1 * r2v)
        pred = np.stack([fx, fy], 1) * dc2[:, None] * u + center[intr]
        return 0.5 * np.sum((pred - xy) ** 2)

    one_lm_iteration()  # warm numpy caches
    t0 = time.time()
    for _ in range(args.reps):
        one_lm_iteration()
    dt = (time.time() - t0) / args.reps

    print(json.dumps({
        "iters_per_sec": 1.0 / dt,
        "detail": {
            "seconds_per_iter": dt, "n_obs": int(M), "n_points": int(N),
            "threads": 1, "gen_s": round(gen_s, 1),
            "method": "numpy closed-form jacobians + scipy sparse "
                      "JtJ/E + dense Cholesky (DENSE_SCHUR structure)",
        },
    }))


if __name__ == "__main__":
    main()
