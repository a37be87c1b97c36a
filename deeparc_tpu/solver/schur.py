"""Schur-complement elimination of points: the reduced camera system.

TPU-native replacement for Ceres' DENSE_SCHUR linear solver (SURVEY.md
section 2.2; selected by the reference at ``src/sfm.cc:67,95``). The normal
equations of one LM iteration,

    [ B   E ] [dp]   [-g_p]        B: (N, 3, 3) per-point blocks
    [ E^T C ] [dc] = [-g_c]        C: (C, C) camera-camera

are solved by eliminating every point's 3x3 block in parallel (closed-form
batched inverses — pure VPU work) and solving the reduced camera system

    S dc = -g_c + E^T B^-1 g_p,    S = C - E^T B^-1 E

either densely (exact Cholesky — the DENSE_SCHUR analogue, for moderate
camera counts) or matrix-free with preconditioned CG (ITERATIVE_SCHUR — the
at-scale path: S is never materialized; each application of S is a handful of
batched einsums over observations plus segment-sums, which is exactly the
shape XLA tiles onto the MXU/VPU). Back-substitution then recovers
dp = -B^-1 (g_p + E dc) pointwise.

Camera-side accumulations exploit the column structure (18 per-observation
columns = 3 groups of 6 keyed by outer-extrinsic / inner-extrinsic /
intrinsic id) and use per-group segment sums instead of generic scatter-add:
on TPU an arbitrary-index scatter is both slow to compile and slow to run,
while segmented sums lower well.

All operators respect freeze masks (gauge fixing / frozen intrinsics /
freeze-camera pre-solve, ``src/sfm.cc:50-63``): frozen columns are zeroed in
J and their rows of S are replaced by identity, so frozen deltas are exactly
zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deeparc_tpu.config import SolverOptions
from deeparc_tpu.solver.linalg import inv3x3, masked_spd_solve, pcg
from deeparc_tpu.solver.trust_region import lm_diagonal


class SchurSystem(NamedTuple):
    """One linearization, masked and ready for (possibly repeated) solves."""

    r: jnp.ndarray          # (M, 2)
    j_point: jnp.ndarray    # (M, 2, 3)   frozen point coords zeroed
    j_cam: jnp.ndarray      # (M, 2, 18)  frozen camera cols zeroed
    cols: jnp.ndarray       # (M, 18) flat camera-vector column indices
    obs_point: jnp.ndarray  # (M,)
    obs_outer: jnp.ndarray  # (M,) outer-extrinsic row ids
    obs_inner: jnp.ndarray  # (M,) inner-extrinsic row ids
    obs_intr: jnp.ndarray   # (M,) intrinsic ids
    n_ext_rows: int         # static: extrinsic rows incl. identity slot
    n_intr: int             # static
    g_p: jnp.ndarray        # (N, 3)
    g_c: jnp.ndarray        # (C,)
    hpp: jnp.ndarray        # (N, 3, 3)
    hcc_diag: jnp.ndarray   # (C,)
    cam_free: jnp.ndarray   # (C,) 0/1
    point_free: jnp.ndarray  # (N, 3) 0/1


def cam_accumulate(sys: "SchurSystem", vals: jnp.ndarray) -> jnp.ndarray:
    """Accumulate per-observation 18-wide camera values into the flat (C,)
    camera vector without generic scatter: the 18 columns decompose into
    three groups of 6 keyed by (outer, inner, intrinsic) id, each a plain
    segment-sum (column layout guarantees group g of obs m lands at rows
    id_g(m)*6 .. +6)."""
    ext = jax.ops.segment_sum(
        vals[:, 0:6], sys.obs_outer, num_segments=sys.n_ext_rows
    ) + jax.ops.segment_sum(
        vals[:, 6:12], sys.obs_inner, num_segments=sys.n_ext_rows
    )
    intr = jax.ops.segment_sum(
        vals[:, 12:18], sys.obs_intr, num_segments=sys.n_intr
    )
    return jnp.concatenate([ext.reshape(-1), intr.reshape(-1)])


def build_system(
    r: jnp.ndarray,
    j_point: jnp.ndarray,
    j_cam: jnp.ndarray,
    index,
    n_points: int,
    n_ext_rows: int,
    n_intr: int,
    cam_free: jnp.ndarray,
    point_free: jnp.ndarray,
) -> SchurSystem:
    """Assemble the masked system from Jacobian blocks + a SceneIndex-like
    object carrying (obs_point, obs_outer, obs_inner, obs_intr)."""
    from deeparc_tpu.residuals.reprojection import camera_col_indices

    cols = camera_col_indices(index, n_ext_rows)
    obs_point = index.obs_point
    j_cam = j_cam * cam_free[cols][:, None, :]
    j_point = j_point * point_free[obs_point][:, None, :]

    sys = SchurSystem(
        r=r, j_point=j_point, j_cam=j_cam, cols=cols, obs_point=obs_point,
        obs_outer=index.obs_outer, obs_inner=index.obs_inner,
        obs_intr=index.obs_intr, n_ext_rows=n_ext_rows, n_intr=n_intr,
        g_p=None, g_c=None, hpp=None, hcc_diag=None,
        cam_free=cam_free, point_free=point_free,
    )
    g_p = jax.ops.segment_sum(
        jnp.einsum("mri,mr->mi", j_point, r), obs_point, num_segments=n_points
    )
    g_c = cam_accumulate(sys, jnp.einsum("mrc,mr->mc", j_cam, r))
    hpp = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", j_point, j_point),
        obs_point,
        num_segments=n_points,
    )
    hcc_diag = cam_accumulate(sys, jnp.einsum("mrc,mrc->mc", j_cam, j_cam))
    return sys._replace(g_p=g_p, g_c=g_c, hpp=hpp, hcc_diag=hcc_diag)


def _augmented_point_blocks(
    sys: SchurSystem, radius: jnp.ndarray, options: SolverOptions
) -> jnp.ndarray:
    """B~^-1: inverses of LM-augmented per-point 3x3 blocks (frozen -> I)."""
    diag = jnp.diagonal(sys.hpp, axis1=-2, axis2=-1)
    d2 = lm_diagonal(diag, options.min_lm_diagonal, options.max_lm_diagonal)
    aug = sys.hpp + jnp.eye(3, dtype=sys.hpp.dtype) * d2[:, :, None] / radius
    # frozen coords: identity rows/cols keep the block invertible; their
    # gradient entries are already zero so their delta is exactly zero.
    frozen = 1.0 - sys.point_free
    aug = aug + frozen[:, :, None] * jnp.eye(3, dtype=aug.dtype)
    return inv3x3(aug)


def _cam_aug_diag(
    sys: SchurSystem, radius: jnp.ndarray, options: SolverOptions
) -> jnp.ndarray:
    d2 = lm_diagonal(
        sys.hcc_diag, options.min_lm_diagonal, options.max_lm_diagonal
    )
    return d2 / radius


def schur_matvec(
    sys: SchurSystem,
    binv: jnp.ndarray,
    cam_aug: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Apply S = (Hcc + aug) - E^T B~^-1 E matrix-free; frozen rows act as I."""
    n_points = sys.g_p.shape[0]
    v_cols = v[sys.cols]                                        # (M, 18)
    t = jnp.einsum("mrc,mc->mr", sys.j_cam, v_cols)             # (M, 2)
    hcc_v = cam_accumulate(sys, jnp.einsum("mrc,mr->mc", sys.j_cam, t))
    ev = jax.ops.segment_sum(
        jnp.einsum("mri,mr->mi", sys.j_point, t),
        sys.obs_point,
        num_segments=n_points,
    )
    w = jnp.einsum("pij,pj->pi", binv, ev)
    t2 = jnp.einsum("mri,mi->mr", sys.j_point, w[sys.obs_point])
    corr = cam_accumulate(sys, jnp.einsum("mrc,mr->mc", sys.j_cam, t2))
    s = hcc_v + cam_aug * v - corr
    return jnp.where(sys.cam_free > 0.5, s, v)


def _groups(sys: SchurSystem):
    """(ids, row-count, j_cam column slice, col offset) per structured group.

    The camera vector is [ext rows | intr rows]; both the outer and inner
    extrinsic groups land in the ext region."""
    R, K = sys.n_ext_rows, sys.n_intr
    return (
        (sys.obs_outer, R, slice(0, 6), 0),
        (sys.obs_inner, R, slice(6, 12), 0),
        (sys.obs_intr, K, slice(12, 18), 6 * R),
    )


def _dense_E(sys: SchurSystem) -> jnp.ndarray:
    """Materialize E (N, 3, C) with full-grid segment sums — no scatter.

    For group g with R_g rows, the per-observation 3x6 coupling block
    W = J_point^T J_cam[:, g] is segment-summed with key
    point * R_g + id_g; the (N * R_g, 3, 6) result IS the dense per-point
    E restricted to that group (reshape + transpose, zero actual scatter).
    Memory is O(N * (2 * n_ext_rows + n_intr) * 18) — the dense path is for
    moderate problems (rigs); at BAL scale use ITERATIVE_SCHUR.
    """
    n_points = sys.g_p.shape[0]
    n_cam = sys.g_c.shape[0]
    E = jnp.zeros((n_points, 3, n_cam), sys.r.dtype)
    for ids, R_g, sl, off in _groups(sys):
        W = jnp.einsum("mri,mrc->mic", sys.j_point, sys.j_cam[:, :, sl])
        grid = jax.ops.segment_sum(
            W, sys.obs_point * R_g + ids, num_segments=n_points * R_g
        ).reshape(n_points, R_g, 3, 6)
        part = grid.transpose(0, 2, 1, 3).reshape(n_points, 3, 6 * R_g)
        E = E.at[:, :, off: off + 6 * R_g].add(part)
    return E


def reduced_rhs(sys: SchurSystem, binv: jnp.ndarray) -> jnp.ndarray:
    """-g_c + E^T B~^-1 g_p (local part; psum across shards if distributed)."""
    w_g = jnp.einsum("pij,pj->pi", binv, sys.g_p)
    t_g = jnp.einsum("mri,mi->mr", sys.j_point, w_g[sys.obs_point])
    return -sys.g_c + cam_accumulate(
        sys, jnp.einsum("mrc,mr->mc", sys.j_cam, t_g)
    )


def back_substitute(
    sys: SchurSystem, binv: jnp.ndarray, dc: jnp.ndarray
) -> jnp.ndarray:
    """dp = -B~^-1 (g_p + E dc)."""
    t_dc = jnp.einsum("mrc,mc->mr", sys.j_cam, dc[sys.cols])
    e_dc = jax.ops.segment_sum(
        jnp.einsum("mri,mr->mi", sys.j_point, t_dc),
        sys.obs_point,
        num_segments=sys.g_p.shape[0],
    )
    dp = -jnp.einsum("pij,pj->pi", binv, sys.g_p + e_dc)
    return dp * sys.point_free


def hcc_dense(sys: SchurSystem) -> jnp.ndarray:
    """Hcc = sum_m A_m^T A_m materialized (C, C) via the 9 group-pair
    full-grid segment sums (key id1 * R2 + id2 covers the whole block grid,
    so the segment-sum output reshapes straight into the dense block matrix —
    no arbitrary-index scatter)."""
    n_cam = sys.g_c.shape[0]
    hcc = jnp.zeros((n_cam, n_cam), sys.r.dtype)
    groups = _groups(sys)
    for ids1, R1, sl1, off1 in groups:
        for ids2, R2, sl2, off2 in groups:
            blocks = jnp.einsum(
                "mri,mrj->mij", sys.j_cam[:, :, sl1], sys.j_cam[:, :, sl2]
            )
            grid = jax.ops.segment_sum(
                blocks, ids1 * R2 + ids2, num_segments=R1 * R2
            ).reshape(R1, R2, 6, 6)
            dense = grid.transpose(0, 2, 1, 3).reshape(6 * R1, 6 * R2)
            hcc = hcc.at[off1: off1 + 6 * R1, off2: off2 + 6 * R2].add(dense)
    return hcc


def dense_S(sys: SchurSystem, binv: jnp.ndarray) -> jnp.ndarray:
    """Hcc - E^T B~^-1 E materialized (C, C), WITHOUT the LM diagonal."""
    E = _dense_E(sys)
    return hcc_dense(sys) - jnp.einsum("pic,pij,pjd->cd", E, binv, E)


def block_jacobi_preconditioner(sys: SchurSystem, cam_aug: jnp.ndarray):
    """6x6 block-Jacobi preconditioner from the Hcc block diagonal + LM
    augmentation (the analogue of Ceres' JACOBI/SCHUR_JACOBI options for
    ITERATIVE_SCHUR). Frozen coordinates get identity rows so the operator
    stays SPD and acts as I on them."""
    R, K = sys.n_ext_rows, sys.n_intr
    ext = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", sys.j_cam[:, :, 0:6], sys.j_cam[:, :, 0:6]),
        sys.obs_outer, num_segments=R,
    ) + jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", sys.j_cam[:, :, 6:12], sys.j_cam[:, :, 6:12]),
        sys.obs_inner, num_segments=R,
    )
    intr = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", sys.j_cam[:, :, 12:18], sys.j_cam[:, :, 12:18]),
        sys.obs_intr, num_segments=K,
    )
    blocks = jnp.concatenate([ext, intr], axis=0)        # (R + K, 6, 6)
    aug = cam_aug.reshape(R + K, 6)
    frozen = 1.0 - sys.cam_free.reshape(R + K, 6)
    eye6 = jnp.eye(6, dtype=blocks.dtype)
    blocks = blocks + eye6 * (aug + frozen)[:, :, None]
    inv_blocks = jnp.linalg.inv(blocks)

    def precond(v):
        vb = v.reshape(R + K, 6)
        return jnp.einsum("bij,bj->bi", inv_blocks, vb).reshape(-1)

    return precond


def solve_schur(
    sys: SchurSystem,
    radius: jnp.ndarray,
    options: SolverOptions,
) -> tuple:
    """Solve the augmented normal equations; returns (dp (N,3), dc (C,))."""
    binv = _augmented_point_blocks(sys, radius, options)
    cam_aug = _cam_aug_diag(sys, radius, options)
    rhs = reduced_rhs(sys, binv) * sys.cam_free

    if options.linear_solver == "dense_schur":
        S = dense_S(sys, binv) + jnp.diag(cam_aug)
        dc = masked_spd_solve(S, rhs, sys.cam_free)
    elif options.linear_solver == "iterative_schur":
        if options.preconditioner == "block_jacobi":
            precond = block_jacobi_preconditioner(sys, cam_aug)
        else:
            precond_diag = jnp.where(
                sys.cam_free > 0.5,
                1.0 / (sys.hcc_diag + cam_aug + 1e-300), 1.0,
            )
            precond = lambda v: precond_diag * v
        result = pcg(
            lambda v: schur_matvec(sys, binv, cam_aug, v),
            rhs,
            precond=precond,
            max_iterations=options.cg_max_iterations,
            tol=options.cg_tolerance,
        )
        dc = result.x * sys.cam_free
    else:
        raise ValueError(f"unknown linear_solver {options.linear_solver!r}")

    dp = back_substitute(sys, binv, dc)
    return dp, dc


def j_times(
    sys: SchurSystem, dp: jnp.ndarray, dc: jnp.ndarray
) -> jnp.ndarray:
    """J [dp; dc] per observation (M, 2) — for the model-cost-change test."""
    return (
        jnp.einsum("mri,mi->mr", sys.j_point, dp[sys.obs_point])
        + jnp.einsum("mrc,mc->mr", sys.j_cam, dc[sys.cols])
    )
