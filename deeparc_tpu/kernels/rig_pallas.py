"""Fused Pallas linearization for the dense-grid rig engine.

The plane-form linearization (``solver/rig_planes.py``) is exact and
MXU/VPU-friendly, but under plain XLA every one of its ~40 intermediate
(N, T) planes is materialized in HBM because each plane feeds many consumers
(the 18x18 slot Gram reads every camera-Jacobian plane pairwise). Measured on
the v5e that makes one 8192-point chunk cost 6.2 ms — ~100x the roofline of
the data it actually touches.

This kernel runs the ENTIRE linearization for a tile of points with every
intermediate held in VMEM:

  HBM reads   : observed-pixel planes xy0/xy1 + visibility mask (the problem
                data), one (8, N) point/point-free pack, tiny per-cell tables.
  HBM writes  : per-point gradient/Hessian blocks (12, N), the point-camera
                coupling E (N, 3*Cn), and a (T, 342) slot-Gram accumulator
                revisited across tiles.

Plane layout is TRANSPOSED relative to rig_planes: (T, n_tile) with cells in
sublanes (T = arcs*rings, a multiple of 8 for real rigs) and points in lanes
(tile = 256), so no plane pads.

The residual/Jacobian math is identical to ``rig_planes.linearize_planes``
(itself the closed form of the reference functor chain,
``src/snavely_reprojection_error.hh:38-118``); parity is asserted in
tests/test_pallas_kernels.py.

E column layout: the kernel emits E in its natural "native" order (per point
row i: six R-wide extrinsic column groups then six K-wide intrinsic groups);
:func:`native_of_flat` / :func:`flat_of_native` give the permutation to the
flat camera-vector order used by the rest of the solver. Only C-sized
vectors/matrices ever need permuting — never E itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sp_pack column indices
_RI = 0          # R_inner, row-major 3x3
_RO = 9
_ROI = 18        # R_o @ R_i
_JRO = 27        # SO(3) right Jacobian at w_outer
_JRI = 36
_TI = 45
_TO = 48
_CX = 51
_CY = 52
_FX = 53
_FY = 54
_D0 = 55         # distortion coeffs, pre-masked by order
_D1 = 56
_FSH = 57        # focal_shared flag
_M1 = 58         # distortion-order masks
_M2 = 59
_FRO = 60        # free_outer (6)
_FRI = 66        # free_inner (6)
_FRK = 72        # free_intr (6)
SP_COLS = 78


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_slot_tables(sp, grid, free_outer, free_inner, free_intr, t_pad):
    """(T_pad, SP_COLS) per-cell table; pad cells get z-safe translations."""
    T = grid.mask.shape[-1] if grid.mask.ndim == 2 else grid.xy0.shape[-1]
    T = sp.fx.shape[0]
    dtype = sp.fx.dtype
    cols = [
        sp.R_i.reshape(T, 9), sp.R_o.reshape(T, 9), sp.R_oi.reshape(T, 9),
        sp.Jr_o.reshape(T, 9), sp.Jr_i.reshape(T, 9),
        sp.t_i, sp.t_o, sp.center,
        sp.fx[:, None], sp.fy[:, None], sp.d0[:, None], sp.d1[:, None],
        grid.focal_shared[:, None], grid.dist_m1[:, None],
        grid.dist_m2[:, None],
        free_outer, free_inner, free_intr,
    ]
    pack = jnp.concatenate([c.astype(dtype) for c in cols], axis=1)
    pad = t_pad - T
    if pad:
        pad_rows = jnp.zeros((pad, SP_COLS), dtype)
        # keep 1/z finite on padded cells: t_i = t_o = (0, 0, 1)
        pad_rows = pad_rows.at[:, _TI + 2].set(1.0)
        pad_rows = pad_rows.at[:, _TO + 2].set(1.0)
        pack = jnp.concatenate([pack, pad_rows], axis=0)
    return pack


def native_of_flat(n_ext_rows: int, n_intr: int) -> np.ndarray:
    """perm with E_flat[..., c] == E_native[..., native_of_flat[c]]."""
    R, K = n_ext_rows, n_intr
    out = np.empty(6 * (R + K), np.int32)
    for r in range(R):
        for j in range(6):
            out[r * 6 + j] = j * R + r
    for k in range(K):
        for j in range(6):
            out[6 * R + k * 6 + j] = 6 * R + j * K + k
    return out


def flat_of_native(n_ext_rows: int, n_intr: int) -> np.ndarray:
    return np.argsort(native_of_flat(n_ext_rows, n_intr)).astype(np.int32)


def _loss_rho(s, loss, a):
    if loss == "trivial":
        return s
    a2 = a * a
    if loss == "huber":
        return jnp.where(s <= a2, s, 2.0 * a * jnp.sqrt(jnp.maximum(s, a2)) - a2)
    if loss == "cauchy":
        return a2 * jnp.log1p(s / a2)
    raise ValueError(loss)


def _loss_weight(s, loss, a):
    if loss == "trivial":
        return None
    a2 = a * a
    if loss == "huber":
        return jnp.where(s <= a2, 1.0, jnp.sqrt(a / jnp.sqrt(jnp.maximum(s, a2))))
    if loss == "cauchy":
        return jnp.sqrt(1.0 / (1.0 + s / a2))
    raise ValueError(loss)


def _chain(col, X, xy0, xy1, mask):
    """Projection/residual planes, transposed layout (T, n)."""
    p2 = [
        X[0] * col(_RI + 3 * a) + X[1] * col(_RI + 3 * a + 1)
        + X[2] * col(_RI + 3 * a + 2) + col(_TI + a)
        for a in range(3)
    ]
    p3 = [
        p2[0] * col(_RO + 3 * a) + p2[1] * col(_RO + 3 * a + 1)
        + p2[2] * col(_RO + 3 * a + 2) + col(_TO + a)
        for a in range(3)
    ]
    inv_z = 1.0 / p3[2]
    u0 = p3[0] * inv_z
    u1 = p3[1] * inv_z
    r2 = u0 * u0 + u1 * u1
    dcoef = 1.0 + r2 * (col(_D0) + col(_D1) * r2)
    r0 = (col(_FX) * dcoef * u0 + col(_CX) - xy0) * mask
    r1 = (col(_FY) * dcoef * u1 + col(_CY) - xy1) * mask
    return dict(p2=p2, inv_z=inv_z, u0=u0, u1=u1, r2=r2, dcoef=dcoef,
                r0=r0, r1=r1)


def _cost_kernel(sp_ref, pts_ref, xy0_ref, xy1_ref, mask_ref, cost_ref,
                 *, loss, loss_scale):
    col = lambda c: sp_ref[:, c:c + 1]
    X = [pts_ref[a:a + 1, :] for a in range(3)]
    mask = mask_ref[:]
    c = _chain(col, X, xy0_ref[:], xy1_ref[:], mask)
    s = c["r0"] * c["r0"] + c["r1"] * c["r1"]
    val = 0.5 * jnp.sum(_loss_rho(s, loss, loss_scale) * mask)

    @pl.when(pl.program_id(0) == 0)
    def _():
        cost_ref[0, 0] = val

    @pl.when(pl.program_id(0) != 0)
    def _():
        cost_ref[0, 0] += val


def _slot_products(col, X, pf, xy0, xy1, mask, loss, loss_scale,
                   intr_frozen=False):
    """Shared derivative chain: residual + per-slot Jacobian plane products.

    ``col(c)`` reads slot-table column c as a (rows, 1) plane; X/pf are the
    (1, n) point / point-freeze rows. Returns (cost_val, r0, r1, jx_f, P):
    loss-weighted residual planes, freeze-masked point-Jacobian planes
    jx_f[k][b], and the freeze-masked camera-Jacobian planes P[k][j] — 18
    of them, or only the 12 extrinsic ones when ``intr_frozen`` (the
    intrinsic columns are zero anyway; the reference always freezes
    intrinsics in BA, src/sfm.cc:60-62).
    Identical math to ``rig_planes.linearize_planes`` (the closed form of
    ``src/snavely_reprojection_error.hh:38-118``)."""
    c = _chain(col, X, xy0, xy1, mask)
    p2, inv_z, u0, u1 = c["p2"], c["inv_z"], c["u0"], c["u1"]
    r2, dcoef = c["r2"], c["dcoef"]
    r0, r1 = c["r0"], c["r1"]

    raw_s = r0 * r0 + r1 * r1
    cost_val = 0.5 * jnp.sum(_loss_rho(raw_s, loss, loss_scale) * mask)
    w = _loss_weight(raw_s, loss, loss_scale)
    if w is None:
        wm = mask
    else:
        wm = mask * w
        r0, r1 = r0 * w, r1 * w

    # A = d res / d p3 (2x3 planes), masked+weighted
    g = col(_D0) + 2.0 * col(_D1) * r2
    c00 = dcoef + 2.0 * g * u0 * u0
    c11 = dcoef + 2.0 * g * u1 * u1
    c01 = 2.0 * g * u0 * u1
    ccr = dcoef + 2.0 * g * r2
    fxz = col(_FX) * inv_z * wm
    fyz = col(_FY) * inv_z * wm
    A = [[fxz * c00, fxz * c01, -fxz * u0 * ccr],
         [fyz * c01, fyz * c11, -fyz * u1 * ccr]]

    def chain_mat(Ak, base):
        return [
            Ak[0] * col(base + b) + Ak[1] * col(base + 3 + b)
            + Ak[2] * col(base + 6 + b)
            for b in range(3)
        ]

    def cross(v, u):
        return [v[1] * u[2] - v[2] * u[1],
                v[2] * u[0] - v[0] * u[2],
                v[0] * u[1] - v[1] * u[0]]

    jx, jti, jwo, jwi = [], [], [], []
    for k in range(2):
        jx_k = chain_mat(A[k], _ROI)
        B_k = chain_mat(A[k], _RO)
        Cw = cross(B_k, p2)
        Dw = cross(jx_k, X)
        jwo.append([
            -(Cw[0] * col(_JRO + b) + Cw[1] * col(_JRO + 3 + b)
              + Cw[2] * col(_JRO + 6 + b)) for b in range(3)
        ])
        jwi.append([
            -(Dw[0] * col(_JRI + b) + Dw[1] * col(_JRI + 3 + b)
              + Dw[2] * col(_JRI + 6 + b)) for b in range(3)
        ])
        jx.append(jx_k)
        jti.append(B_k)

    jx_f = [[jx[k][b] * pf[b] for b in range(3)] for k in range(2)]
    if intr_frozen:
        P = [
            [jwo[k][b] * col(_FRO + b) for b in range(3)]
            + [A[k][b] * col(_FRO + 3 + b) for b in range(3)]
            + [jwi[k][b] * col(_FRI + b) for b in range(3)]
            + [jti[k][b] * col(_FRI + 3 + b) for b in range(3)]
            for k in range(2)
        ]
        return cost_val, r0, r1, jx_f, P

    # intrinsic columns [cx, cy, f0, f1, d0, d1]
    zero = jnp.zeros_like(wm)
    du0, du1 = dcoef * u0, dcoef * u1
    sh = col(_FSH)
    jint = [
        [wm, zero, du0 * wm, zero,
         col(_FX) * u0 * r2 * col(_M1) * wm,
         col(_FX) * u0 * r2 * r2 * col(_M2) * wm],
        [zero, wm, sh * du1 * wm, (1.0 - sh) * du1 * wm,
         col(_FY) * u1 * r2 * col(_M1) * wm,
         col(_FY) * u1 * r2 * r2 * col(_M2) * wm],
    ]
    P = [
        [jwo[k][b] * col(_FRO + b) for b in range(3)]
        + [A[k][b] * col(_FRO + 3 + b) for b in range(3)]
        + [jwi[k][b] * col(_FRI + b) for b in range(3)]
        + [jti[k][b] * col(_FRI + 3 + b) for b in range(3)]
        + [jint[k][j] * col(_FRK + j) for j in range(6)]
        for k in range(2)
    ]
    return cost_val, r0, r1, jx_f, P


def _linearize_kernel(
    sp_ref, oho_ref, ohi_ref, ohk_ref, pts_ref, xy0_ref, xy1_ref, mask_ref,
    pout_ref, e_ref, ghs_ref, cost_ref,
    *, loss, loss_scale, n_ext_rows, n_intr,
):
    dtype = xy0_ref.dtype
    R, K = n_ext_rows, n_intr
    col = lambda c: sp_ref[:, c:c + 1]                    # (Tp, 1)
    X = [pts_ref[a:a + 1, :] for a in range(3)]           # (1, n)
    pf = [pts_ref[3 + a:4 + a, :] for a in range(3)]
    mask = mask_ref[:]
    cost_val, r0, r1, jx_f, P = _slot_products(
        col, X, pf, xy0_ref[:], xy1_ref[:], mask, loss, loss_scale)

    # ---- point side: sublane (cell-axis) reductions -> (1, n) rows
    rows = []
    for i in range(3):
        rows.append(jnp.sum(jx_f[0][i] * r0 + jx_f[1][i] * r1, axis=0,
                            keepdims=True))
    hpp = {}
    for i in range(3):
        for j in range(i, 3):
            hpp[i, j] = jnp.sum(
                jx_f[0][i] * jx_f[0][j] + jx_f[1][i] * jx_f[1][j],
                axis=0, keepdims=True)
    for i in range(3):
        for j in range(3):
            rows.append(hpp[min(i, j), max(i, j)])
    pout_ref[:] = jnp.concatenate(rows, axis=0)           # (12, n)

    # ---- slot side: lane (point-axis) reductions, accumulated over tiles
    ghs_cols = [
        jnp.sum(P[0][i] * r0 + P[1][i] * r1, axis=1, keepdims=True)
        for i in range(18)
    ]
    hcc = {}
    for i in range(18):
        for j in range(i, 18):
            hcc[i, j] = jnp.sum(
                P[0][i] * P[0][j] + P[1][i] * P[1][j], axis=1, keepdims=True)
    for i in range(18):
        for j in range(18):
            ghs_cols.append(hcc[min(i, j), max(i, j)])
    ghs_val = jnp.concatenate(ghs_cols, axis=1)           # (Tp, 342)

    @pl.when(pl.program_id(0) == 0)
    def _():
        ghs_ref[:] = ghs_val
        cost_ref[0, 0] = cost_val

    @pl.when(pl.program_id(0) != 0)
    def _():
        ghs_ref[:] += ghs_val
        cost_ref[0, 0] += cost_val

    # ---- E: point-camera coupling, native column order (MXU contractions
    # over the cell axis)
    def dot_t(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=dtype)

    e_segs = []
    for i in range(3):
        for j in range(6):
            w_out = jx_f[0][i] * P[0][j] + jx_f[1][i] * P[1][j]
            w_in = jx_f[0][i] * P[0][6 + j] + jx_f[1][i] * P[1][6 + j]
            e_segs.append(dot_t(w_out, oho_ref[:]) + dot_t(w_in, ohi_ref[:]))
        for j in range(6):
            w_int = jx_f[0][i] * P[0][12 + j] + jx_f[1][i] * P[1][12 + j]
            e_segs.append(dot_t(w_int, ohk_ref[:]))
    e_ref[:] = jnp.concatenate(e_segs, axis=1)            # (n, 3*(6R+6K))


def _pad_planes_t(x, t_pad, n_pad):
    """(N, T) -> transposed, padded (t_pad, n_pad)."""
    xt = x.T
    T, N = xt.shape
    return jnp.pad(xt, ((0, t_pad - T), (0, n_pad - N)))


@functools.partial(
    jax.jit,
    static_argnames=("loss", "loss_scale", "block_np", "interpret",
                     "vmem_limit_mb"),
)
def linearize_grid(
    points, point_free, sp, grid, free_outer, free_inner, free_intr,
    loss="trivial", loss_scale=0.5, block_np=256, interpret=False,
    vmem_limit_mb=100,
):
    """Fused full-problem linearization.

    Returns (cost, g_p (N,3), hpp (N,3,3), g_slots (T,18),
    hcc_slots (T,18,18), E_native (N, 3, 6R+6K)) — the same quantities as
    ``rig_planes.linearize_planes`` summed over all points, with E in native
    column order (see module docstring).
    """
    N, T = grid.xy0.shape
    R = grid.onehot_outer.shape[1]
    K = grid.onehot_intr.shape[1]
    Cn = 6 * (R + K)
    dtype = points.dtype
    t_pad = _round_up(T, 8)
    n_pad = _round_up(N, block_np)
    n_tiles = n_pad // block_np

    sp_pack = pack_slot_tables(sp, grid, free_outer, free_inner, free_intr,
                               t_pad)
    pts_pack = jnp.zeros((8, n_pad), dtype)
    pts_pack = pts_pack.at[0:3, :N].set(points.T)
    pts_pack = pts_pack.at[2, N:].set(1.0)   # z-safe padding points
    pts_pack = pts_pack.at[3:6, :N].set(point_free.T.astype(dtype))
    xy0t = _pad_planes_t(grid.xy0, t_pad, n_pad)
    xy1t = _pad_planes_t(grid.xy1, t_pad, n_pad)
    maskt = _pad_planes_t(grid.mask, t_pad, n_pad)
    oh_pad = lambda oh: jnp.pad(oh, ((0, t_pad - T), (0, 0))).astype(dtype)

    kernel = functools.partial(
        _linearize_kernel, loss=loss, loss_scale=loss_scale,
        n_ext_rows=R, n_intr=K,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    per_tile_cols = lambda rows: pl.BlockSpec(
        (rows, block_np), lambda i: (0, i), memory_space=pltpu.VMEM)

    pout, e_nat, ghs, cost = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            full((t_pad, SP_COLS)),
            full((t_pad, R)),
            full((t_pad, R)),
            full((t_pad, K)),
            per_tile_cols(8),
            per_tile_cols(t_pad),
            per_tile_cols(t_pad),
            per_tile_cols(t_pad),
        ],
        out_specs=[
            per_tile_cols(12),
            pl.BlockSpec((block_np, 3 * Cn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((t_pad, 342)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, n_pad), dtype),
            jax.ShapeDtypeStruct((n_pad, 3 * Cn), dtype),
            jax.ShapeDtypeStruct((t_pad, 342), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        # the kernel keeps ~80 (t_pad, block_np) planes live; at rig sizes
        # (T=192, block 256) that is ~25 MB of scoped VMEM — raise the
        # default 16 MB scoped limit instead of shrinking the tile
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(sp_pack, oh_pad(grid.onehot_outer), oh_pad(grid.onehot_inner),
      oh_pad(grid.onehot_intr), pts_pack, xy0t, xy1t, maskt)

    g_p = pout[0:3, :N].T
    hpp = pout[3:12, :N].T.reshape(N, 3, 3)
    g_slots = ghs[:T, :18]
    hcc_slots = ghs[:T, 18:].reshape(T, 18, 18)
    e_out = e_nat[:N].reshape(N, 3, Cn)
    return cost[0, 0], g_p, hpp, g_slots, hcc_slots, e_out


# ---------------------------------------------------------------------------
# Banded (live-window) kernels
# ---------------------------------------------------------------------------
# The monolithic kernels above pay for ALL T cells of every point tile —
# at 5% visibility that is ~19x masked overcompute (the round-3 sparse
# flagship burned slots, not observations). Real rig visibility is not
# uniform: a surface point is seen from a CONTIGUOUS (cyclic) window of
# turntable positions (self-occlusion), and real BAL graphs have the same
# co-visibility locality. After solver/rig_band.py renumbers cells (RCM)
# and sorts points by cyclic window center, each tile of block_np points
# touches only a narrow band of w_band cells; these kernels run the exact
# same slot algebra over just that band:
#
#   grid = (point_tile i, band_slab j); per-tile band starts come in as a
#   scalar-prefetch array indexing 8-row slabs of the CYCLICALLY EXTENDED
#   planes (rows t_pad..t_pad+w_band alias cells 0..w_band, so wrapped
#   windows are contiguous; the caller folds the ghs extension rows back).
#   pout/E blocks accumulate across j in VMEM (consecutive grid steps share
#   the block); the (t_ext, 342) slot-Gram output stays VMEM-resident for
#   the whole launch and takes slab adds at dynamic row offsets.
#
# The reference never pays for non-observations either (Ceres iterates real
# residual blocks only, src/sfm.cc:36-48) — this is the grid engine's way
# of not paying, while keeping every reduction dense and MXU/VPU-shaped.


def _banded_linearize_kernel(
    starts_ref, tbl_ref, oho_ref, ohi_ref, ohk_ref, pts_ref, pxm_ref,
    pout_ref, e_ref, ghs_ref, cost_ref,
    *, loss, loss_scale, w_band, intr_frozen, t_lo=0,
):
    dtype = pxm_ref.dtype
    i = pl.program_id(0)
    row0 = starts_ref[i + t_lo] * 8
    sp_band = tbl_ref[pl.ds(row0, w_band), :]             # (w_band, SP_COLS)
    col = lambda c: sp_band[:, c:c + 1]
    X = [pts_ref[a:a + 1, :] for a in range(3)]           # (1, n)
    pf = [pts_ref[3 + a:4 + a, :] for a in range(3)]
    mask = pxm_ref[2]
    cost_val, r0, r1, jx_f, P = _slot_products(
        col, X, pf, pxm_ref[0], pxm_ref[1], mask, loss, loss_scale,
        intr_frozen=intr_frozen)
    n_p = len(P[0])                 # 18, or 12 with frozen intrinsics

    # ---- point side: band-row reductions -> (1, n) rows ----
    rows = []
    for a in range(3):
        rows.append(jnp.sum(jx_f[0][a] * r0 + jx_f[1][a] * r1, axis=0,
                            keepdims=True))
    hpp = {}
    for a in range(3):
        for b in range(a, 3):
            hpp[a, b] = jnp.sum(
                jx_f[0][a] * jx_f[0][b] + jx_f[1][a] * jx_f[1][b],
                axis=0, keepdims=True)
    for a in range(3):
        for b in range(3):
            rows.append(hpp[min(a, b), max(a, b)])
    pout_ref[:] = jnp.concatenate(rows, axis=0)           # (12, n)

    # ---- slot side: lane reductions into the resident extended ghs ----
    ghs_cols = [
        jnp.sum(P[0][a] * r0 + P[1][a] * r1, axis=1, keepdims=True)
        for a in range(n_p)
    ]
    hcc = {}
    for a in range(n_p):
        for b in range(a, n_p):
            hcc[a, b] = jnp.sum(
                P[0][a] * P[0][b] + P[1][a] * P[1][b], axis=1, keepdims=True)
    for a in range(n_p):
        for b in range(n_p):
            ghs_cols.append(hcc[min(a, b), max(a, b)])
    ghs_val = jnp.concatenate(ghs_cols, axis=1)   # (w_band, n_p + n_p^2)

    @pl.when(i == 0)
    def _():
        ghs_ref[:] = jnp.zeros_like(ghs_ref)
        cost_ref[0, 0] = jnp.zeros((), dtype)

    ghs_ref[pl.ds(row0, w_band), :] += ghs_val
    cost_ref[0, 0] += cost_val

    # ---- E: contractions over the band's cells (full-depth matmuls).
    # Frozen intrinsics skip their 18 matmuls entirely (their E columns are
    # zero — the reference always freezes intrinsics in BA, src/sfm.cc:60-62)
    def dot_t(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=dtype)

    oho = oho_ref[pl.ds(row0, w_band), :]
    ohi = ohi_ref[pl.ds(row0, w_band), :]
    e_segs = []
    for a in range(3):
        for b in range(6):
            w_out = jx_f[0][a] * P[0][b] + jx_f[1][a] * P[1][b]
            w_in = jx_f[0][a] * P[0][6 + b] + jx_f[1][a] * P[1][6 + b]
            e_segs.append(dot_t(w_out, oho) + dot_t(w_in, ohi))
        if not intr_frozen:
            ohk = ohk_ref[pl.ds(row0, w_band), :]
            for b in range(6):
                w_int = jx_f[0][a] * P[0][12 + b] + jx_f[1][a] * P[1][12 + b]
                e_segs.append(dot_t(w_int, ohk))
    # intr_frozen: the intrinsic E columns are omitted ENTIRELY (not just
    # zeroed) — E shrinks to the 6R extrinsic columns, cutting its HBM
    # write and every downstream Schur read/contraction by 6K/(6R+6K)
    e_ref[:] = jnp.concatenate(e_segs, axis=1)        # (n, 3*Cn_e)


def _extend_cyclic(x, w_band, axis=0):
    """Append rows 0..w_band after the end so wrapped bands are contiguous."""
    ext = jax.lax.slice_in_dim(x, 0, w_band, axis=axis)
    return jnp.concatenate([x, ext], axis=axis)


def banded_planes(grid, n_pad, ext_len):
    """Stacked + cyclically-extended observation planes
    (3, t_pad + ext_len, n_pad): [xy0; xy1; mask] transposed."""
    t_pad = _round_up(grid.xy0.shape[1], 8)
    stack = jnp.stack([
        _pad_planes_t(grid.xy0, t_pad, n_pad),
        _pad_planes_t(grid.xy1, t_pad, n_pad),
        _pad_planes_t(grid.mask, t_pad, n_pad),
    ])
    return _extend_cyclic(stack, ext_len, axis=1)


def gather_banded_planes(pxm_ext, starts, w_band, block_np,
                         t_lo=0, t_hi=None):
    """Pre-gather each point tile's live band into a DENSE stack
    (3, w_band, (t_hi - t_lo) * block_np): tile i's lane block holds rows
    [starts[i]*8, starts[i]*8 + w_band) of the extended planes. The planes
    are constant across LM iterations, so this one gather per solve buys a
    banded kernel with the monolithic kernel's step structure (one grid
    step per point tile — no per-slab overhead, no dynamic input DMAs).
    ``t_lo``/``t_hi`` restrict to a width-bucketed tile group (see
    solver/rig_band: per-group stacks pay each group's own band width)."""
    _, t_ext, n_pad = pxm_ext.shape
    n_tiles = n_pad // block_np
    if t_hi is None:
        t_hi = n_tiles
    starts_g = starts[t_lo:t_hi]
    rows = starts_g[:, None] * 8 + jnp.arange(w_band, dtype=starts.dtype)
    arr = pxm_ext.reshape(3, t_ext, n_tiles, block_np)[:, :, t_lo:t_hi]
    idx = rows.T[None, :, :, None]           # (1, w_band, t_hi - t_lo, 1)
    out = jnp.take_along_axis(arr, idx, axis=1)
    return out.reshape(3, w_band, (t_hi - t_lo) * block_np)


def _banded_tables(sp, grid, free_outer, free_inner, free_intr, t_pad,
                   w_band, dtype):
    """Cyclically-extended slot table + one-hot bin matrices (all tiny;
    VMEM-resident across the whole banded launch)."""
    T = grid.onehot_outer.shape[0]
    oh_pad = lambda oh: _extend_cyclic(
        jnp.pad(oh, ((0, t_pad - T), (0, 0))).astype(dtype), w_band)
    tbl = _extend_cyclic(
        pack_slot_tables(sp, grid, free_outer, free_inner, free_intr, t_pad),
        w_band)
    return (tbl, oh_pad(grid.onehot_outer), oh_pad(grid.onehot_inner),
            oh_pad(grid.onehot_intr))


@functools.partial(
    jax.jit,
    static_argnames=("w_band", "loss", "loss_scale", "block_np",
                     "interpret", "vmem_limit_mb", "intr_frozen"),
)
def linearize_grid_banded(
    points, point_free, sp, grid, free_outer, free_inner, free_intr, starts,
    w_band, loss="trivial", loss_scale=0.5, block_np=256,
    interpret=False, vmem_limit_mb=100, intr_frozen=False, pxm=None,
):
    """Fused linearization over per-tile cell bands (see section comment).

    ``starts`` is the (n_pad / block_np,) int32 8-row-block start array
    from :func:`deeparc_tpu.solver.rig_band.band_grid`; ``w_band`` either a
    single static band width in cells (multiple of 8, <= t_pad) paid by
    EVERY tile, or a tuple of ``(w, tile_lo, tile_hi)`` width-bucket groups
    (band_grid's per-tile band cost: each contiguous tile group pays only
    its own width — one pallas launch per group, same math); ``pxm`` the
    pre-gathered :func:`gather_banded_planes` stack(s) for THIS (starts,
    w_band, block_np) — built once per solve since the observation planes
    never change during LM (band_grid attaches them). ``intr_frozen=True``
    writes zeros for the intrinsic E columns without computing them.
    Returns the same quantities as :func:`linearize_grid` — identical math,
    skipping cells outside each tile's band (which band_grid guarantees
    are dead).
    """
    N, T = grid.xy0.shape
    R = grid.onehot_outer.shape[1]
    K = grid.onehot_intr.shape[1]
    Cn = 6 * R if intr_frozen else 6 * (R + K)
    dtype = points.dtype
    t_pad = _round_up(T, 8)
    if isinstance(w_band, tuple):
        n_tiles = w_band[-1][2]
        n_pad = n_tiles * block_np
        groups = w_band
    else:
        n_pad = _round_up(N, block_np) if pxm is None else pxm.shape[-1]
        n_tiles = n_pad // block_np
        groups = ((w_band, 0, n_tiles),)
    for w, _, _ in groups:
        assert w % 8 == 0 and w <= t_pad, (w, t_pad)
    w_max = max(w for w, _, _ in groups)
    if pxm is None:
        pxm_ext = banded_planes(grid, n_pad, w_max)
        pxms = tuple(
            gather_banded_planes(pxm_ext, starts, w, block_np, lo, hi)
            for w, lo, hi in groups)
    else:
        pxms = pxm if isinstance(pxm, tuple) else (pxm,)
    assert len(pxms) == len(groups)
    assert starts.shape[0] == n_tiles, (
        "band start table was built for a different point-tile width",
        starts.shape[0], n_tiles, block_np)
    t_ext = t_pad + w_max

    tbl, oho, ohi, ohk = _banded_tables(
        sp, grid, free_outer, free_inner, free_intr, t_pad, w_max, dtype)
    pts_pack = jnp.zeros((8, n_pad), dtype)
    pts_pack = pts_pack.at[0:3, :N].set(points.T)
    pts_pack = pts_pack.at[2, N:].set(1.0)   # z-safe padding points
    pts_pack = pts_pack.at[3:6, :N].set(point_free.T.astype(dtype))

    n_p = 12 if intr_frozen else 18
    gw = n_p + n_p * n_p
    full = lambda shape: pl.BlockSpec(shape, lambda i, s: (0, 0),
                                      memory_space=pltpu.VMEM)

    pout_parts, e_parts, ghs_sum, cost_sum = [], [], None, None
    for (w_g, t_lo, t_hi), pxm_g in zip(groups, pxms):
        g_tiles = t_hi - t_lo
        if g_tiles == 0:
            continue
        assert pxm_g.shape == (3, w_g, g_tiles * block_np), (
            pxm_g.shape, (3, w_g, g_tiles * block_np))
        kernel = functools.partial(
            _banded_linearize_kernel, loss=loss, loss_scale=loss_scale,
            w_band=w_g, intr_frozen=intr_frozen, t_lo=t_lo)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g_tiles,),
            in_specs=[
                full((t_ext, SP_COLS)),
                full((t_ext, R)),
                full((t_ext, R)),
                full((t_ext, K)),
                pl.BlockSpec((8, block_np),
                             lambda i, s, t0=t_lo: (0, t0 + i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, w_g, block_np), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((12, block_np), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_np, 3 * Cn), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_ext, gw), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        )
        pout_g, e_g, ghs_g, cost_g = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((12, g_tiles * block_np), dtype),
                jax.ShapeDtypeStruct((g_tiles * block_np, 3 * Cn), dtype),
                jax.ShapeDtypeStruct((t_ext, gw), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
            interpret=interpret,
        )(starts, tbl, oho, ohi, ohk, pts_pack, pxm_g)
        pout_parts.append(pout_g)
        e_parts.append(e_g)
        ghs_sum = ghs_g if ghs_sum is None else ghs_sum + ghs_g
        cost_sum = cost_g if cost_sum is None else cost_sum + cost_g

    pout = jnp.concatenate(pout_parts, axis=1)
    e_nat = jnp.concatenate(e_parts, axis=0)
    ghs, cost = ghs_sum, cost_sum
    # fold the cyclic extension rows back onto their base cells (rows past
    # t_pad + w_g of any one group are zero, so folding at w_max is exact)
    ghs = ghs[:t_pad].at[:w_max].add(ghs[t_pad:])
    g_p = pout[0:3, :N].T
    hpp = pout[3:12, :N].T.reshape(N, 3, 3)
    if intr_frozen:
        # embed the 12-wide extrinsic-only slot system into the 18-wide
        # layout downstream consumes (intrinsic entries identically zero)
        g_slots = jnp.zeros((T, 18), dtype).at[:, :12].set(ghs[:T, :12])
        hcc_slots = jnp.zeros((T, 18, 18), dtype).at[:, :12, :12].set(
            ghs[:T, 12:].reshape(T, 12, 12))
    else:
        g_slots = ghs[:T, :18]
        hcc_slots = ghs[:T, 18:].reshape(T, 18, 18)
    e_out = e_nat[:N].reshape(N, 3, Cn)
    return cost[0, 0], g_p, hpp, g_slots, hcc_slots, e_out


def _banded_cost_kernel(starts_ref, tbl_ref, pts_ref, pxm_ref, cost_ref,
                        *, loss, loss_scale, w_band, t_lo=0):
    i = pl.program_id(0)
    row0 = starts_ref[i + t_lo] * 8
    sp_band = tbl_ref[pl.ds(row0, w_band), :]
    col = lambda c: sp_band[:, c:c + 1]
    X = [pts_ref[a:a + 1, :] for a in range(3)]
    mask = pxm_ref[2]
    c = _chain(col, X, pxm_ref[0], pxm_ref[1], mask)
    s = c["r0"] * c["r0"] + c["r1"] * c["r1"]
    val = 0.5 * jnp.sum(_loss_rho(s, loss, loss_scale) * mask)

    @pl.when(i == 0)
    def _():
        cost_ref[0, 0] = val

    @pl.when(i != 0)
    def _():
        cost_ref[0, 0] += val


@functools.partial(
    jax.jit,
    static_argnames=("w_band", "loss", "loss_scale", "block_np",
                     "interpret"),
)
def cost_grid_banded(points, sp, grid, starts, w_band,
                     loss="trivial", loss_scale=0.5, block_np=1024,
                     interpret=False, pxm=None):
    """Banded robustified half-SSE (the trial-cost pass over live bands).

    ``starts``/``pxm`` must be the band table and pre-gathered plane
    stack(s) built for THIS ``block_np`` (the cost pass uses wider tiles
    than the linearize; band_grid builds one of each). ``w_band`` is one
    static width or a tuple of ``(w, tile_lo, tile_hi)`` groups (see
    :func:`linearize_grid_banded`)."""
    N, T = grid.xy0.shape
    dtype = points.dtype
    t_pad = _round_up(T, 8)
    if isinstance(w_band, tuple):
        n_tiles = w_band[-1][2]
        n_pad = n_tiles * block_np
        groups = w_band
    else:
        n_pad = _round_up(N, block_np) if pxm is None else pxm.shape[-1]
        n_tiles = n_pad // block_np
        groups = ((w_band, 0, n_tiles),)
    for w, _, _ in groups:
        assert w % 8 == 0 and w <= t_pad, (w, t_pad)
    w_max = max(w for w, _, _ in groups)
    if pxm is None:
        pxm_ext = banded_planes(grid, n_pad, w_max)
        pxms = tuple(
            gather_banded_planes(pxm_ext, starts, w, block_np, lo, hi)
            for w, lo, hi in groups)
    else:
        pxms = pxm if isinstance(pxm, tuple) else (pxm,)
    assert len(pxms) == len(groups)
    assert starts.shape[0] == n_tiles, (
        "band start table was built for a different point-tile width",
        starts.shape[0], n_tiles, block_np)
    t_ext = t_pad + w_max

    zeros6 = jnp.zeros((T, 6), dtype)
    tbl, _, _, _ = _banded_tables(sp, grid, zeros6, zeros6, zeros6, t_pad,
                                  w_max, dtype)
    pts_pack = jnp.zeros((8, n_pad), dtype)
    pts_pack = pts_pack.at[0:3, :N].set(points.T)
    pts_pack = pts_pack.at[2, N:].set(1.0)

    total = None
    for (w_g, t_lo, t_hi), pxm_g in zip(groups, pxms):
        g_tiles = t_hi - t_lo
        if g_tiles == 0:
            continue
        assert pxm_g.shape == (3, w_g, g_tiles * block_np), (
            pxm_g.shape, (3, w_g, g_tiles * block_np))
        kernel = functools.partial(_banded_cost_kernel, loss=loss,
                                   loss_scale=loss_scale, w_band=w_g,
                                   t_lo=t_lo)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g_tiles,),
            in_specs=[
                pl.BlockSpec((t_ext, SP_COLS), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, block_np),
                             lambda i, s, t0=t_lo: (0, t0 + i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, w_g, block_np), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        cost = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
            interpret=interpret,
        )(starts, tbl, pts_pack, pxm_g)
        total = cost[0, 0] if total is None else total + cost[0, 0]
    return total


@functools.partial(
    jax.jit,
    static_argnames=("loss", "loss_scale", "block_np", "interpret"),
)
def cost_grid(points, sp, grid, loss="trivial", loss_scale=0.5,
              block_np=1024, interpret=False):
    """Fused robustified half-SSE over the grid (the trial-cost pass)."""
    N, T = grid.xy0.shape
    dtype = points.dtype
    t_pad = _round_up(T, 8)
    n_pad = _round_up(N, block_np)
    n_tiles = n_pad // block_np

    zeros6 = jnp.zeros((T, 6), dtype)
    sp_pack = pack_slot_tables(sp, grid, zeros6, zeros6, zeros6, t_pad)
    pts_pack = jnp.zeros((8, n_pad), dtype)
    pts_pack = pts_pack.at[0:3, :N].set(points.T)
    pts_pack = pts_pack.at[2, N:].set(1.0)
    xy0t = _pad_planes_t(grid.xy0, t_pad, n_pad)
    xy1t = _pad_planes_t(grid.xy1, t_pad, n_pad)
    maskt = _pad_planes_t(grid.mask, t_pad, n_pad)

    kernel = functools.partial(_cost_kernel, loss=loss, loss_scale=loss_scale)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    per_tile_cols = lambda rows: pl.BlockSpec(
        (rows, block_np), lambda i: (0, i), memory_space=pltpu.VMEM)

    cost = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            full((t_pad, SP_COLS)),
            per_tile_cols(8),
            per_tile_cols(t_pad),
            per_tile_cols(t_pad),
            per_tile_cols(t_pad),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        interpret=interpret,
    )(sp_pack, pts_pack, xy0t, xy1t, maskt)
    return cost[0, 0]
