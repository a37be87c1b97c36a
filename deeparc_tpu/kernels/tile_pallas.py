"""Fused Pallas sweep kernels for the tile engine (solver/tiles.py).

The tile engine's PCG matvec sweeps are its hot loop: 30+ sweeps per LM
step, each needing a per-slot one-hot (obs x cells) selection for the
cell-space lookup (E v) and binning (E^T u). Under plain XLA the one-hot is
materialized in HBM every sweep — at BAL scale (M = 8M obs, V = 2048 cells)
that is ~64 MB per 8k-obs chunk of pure traffic per use. This kernel builds
the one-hot IN VMEM per (slot, tile) and never writes it out; the remaining
cost is the irreducible MXU work (M x V x 18 per direction).

Layout: TRANSPOSED planes, rows (points) in lanes — the same trick as
kernels/rig_pallas.py. For a bucket of Nb rows x W slots:

    cell_t  (W, Nb)        int32 cell id per (slot, row)
    jcam_t  (36*W, Nb)     rows [w*36 + k*18 + j] = j_cam[:, w, k, j]
    jx_t    (6*W, Nb)      rows [w*6  + k*3  + i] = j_x[:, w, k, i]
    binv_t  (9, Nb), gp_t (3, Nb)
    v_cells (V, 18)        cell-space vector

so every per-(w, k) product is ONE (18, block) or (3, block) slab op, and
the within-row (slot) reduction is the w-loop accumulation — no lane-axis
segment work at all.

Three modes (static):
    rhs:    out_cells = E^T B^-1 g_p
    matvec: out_cells = E^T B^-1 E v          (the PCG correction)
    edot:   ev_rows   = E v                   (back-substitution / J dx)

Parity with the XLA sweeps is asserted in tests/test_tile_pallas.py
(interpret mode on CPU, real lowering on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the sweep kernel unrolls the slot loop; wider buckets (the heavy tail of
# a real track distribution — a small observation share) fall back to the
# XLA sweep (solver/tiles._e_sweep)
MAX_KERNEL_WIDTH = 64

# the fused linearize kernel additionally unrolls the 171-entry Hessian
# pack per slot; cap its width lower to bound compile time
MAX_LIN_WIDTH = 32

_TRIU_I, _TRIU_J = [list(ix) for ix in np.triu_indices(18)]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_bucket_planes(j_x, j_cam, cell):
    """((Nb,W,2,3), (Nb,W,2,18), (Nb,W)) -> transposed plane tensors."""
    Nb, W = cell.shape
    jcam_t = j_cam.transpose(1, 2, 3, 0).reshape(W * 36, Nb)
    jx_t = j_x.transpose(1, 2, 3, 0).reshape(W * 6, Nb)
    return cell.T, jcam_t, jx_t


def _sweep_kernel(cell_ref, jcam_ref, jx_ref, binv_ref, gp_ref, v_ref,
                  out_ref, ev_ref, *, mode, W, Vp):
    """One tile: rows in lanes, slots unrolled as slab ops.

    jcam/jx planes may be stored bf16 (HBM-traffic halving — the sweeps
    are the step's bandwidth hot spot); all arithmetic accumulates in the
    f32 working dtype taken from binv (see _sweep_local_kernel on why the
    matmul operands stay f32)."""
    dtype = binv_ref.dtype
    block = cell_ref.shape[1]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (Vp, block), 0)

    def onehot(w):
        return (iota_v == cell_ref[w:w + 1, :]).astype(dtype)  # (Vp, block)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=dtype)

    def jcam_slab(w, k):
        base = w * 36 + k * 18
        return jcam_ref[base: base + 18, :].astype(dtype)   # (18, block)

    def jx_slab(w, k):
        base = w * 6 + k * 3
        return jx_ref[base: base + 3, :].astype(dtype)      # (3, block)

    # ---- E v (matvec / edot modes) ----------------------------------------
    if mode in ("matvec", "edot"):
        ev = jnp.zeros((3, block), dtype)
        for w in range(W):
            oh = onehot(w)
            vslot = dot(v_ref[:], oh)                  # (18, block)
            for k in range(2):
                t_k = jnp.sum(jcam_slab(w, k) * vslot, axis=0, keepdims=True)
                ev += jx_slab(w, k) * t_k
        if mode == "edot":
            ev_ref[:] = ev
            return
        rhs_rows = ev
    else:
        rhs_rows = gp_ref[:]                           # (3, block)

    # ---- w = B^-1 rhs (binv rows are the 3x3 inverse, row-major) ----------
    wv = jnp.concatenate(
        [jnp.sum(binv_ref[3 * i: 3 * i + 3, :] * rhs_rows, axis=0,
                 keepdims=True) for i in range(3)], axis=0)   # (3, block)

    # ---- E^T w, binned to cells --------------------------------------------
    acc_cells = jnp.zeros((Vp, 18), dtype)
    for w in range(W):
        oh = onehot(w)
        u = jnp.zeros((18, block), dtype)
        for k in range(2):
            t2_k = jnp.sum(jx_slab(w, k) * wv, axis=0, keepdims=True)
            u += jcam_slab(w, k) * t2_k
        acc_cells += dot(oh, u.T)                      # (Vp, block)@(block,18)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = acc_cells

    @pl.when(pl.program_id(0) != 0)
    def _():
        out_ref[:] += acc_cells


def _sweep_local_kernel(cell_ref, jcam_ref, jx_ref, binv_ref, gp_ref, v_ref,
                        out_ref, ev_ref, *, mode, W, Vl, bpc):
    """Locality-blocked tile: the one-hot spans only the chunk's V_LOCAL
    cell list (TileBucket.loc), so the per-slot MXU work drops by V/V_local
    versus the global kernel. ``v_ref`` is this chunk's pre-gathered local
    v table (18, Vl); ``out_ref`` the chunk's local bins (Vl, 18),
    accumulated over the bpc lane-blocks of the chunk.

    jcam/jx may be stored bf16 (halves the sweeps' HBM traffic); all
    arithmetic — including the one-hot matmuls — accumulates in binv's
    f32. (Running the matmuls with bf16 OPERANDS was measured slightly
    slower on the v5e and noisier: the sweeps are payload-bound on the
    18-wide output, not matmul-rate-bound.)"""
    dtype = binv_ref.dtype
    block = cell_ref.shape[1]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (Vl, block), 0)

    def onehot(w):
        return (iota_v == cell_ref[w:w + 1, :]).astype(dtype)   # (Vl, block)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=dtype)

    def jcam_slab(w, k):
        base = w * 36 + k * 18
        return jcam_ref[base: base + 18, :].astype(dtype)

    def jx_slab(w, k):
        base = w * 6 + k * 3
        return jx_ref[base: base + 3, :].astype(dtype)

    if mode in ("matvec", "edot"):
        ev = jnp.zeros((3, block), dtype)
        for w in range(W):
            oh = onehot(w)
            vslot = dot(v_ref[0], oh)                   # (18, block)
            for k in range(2):
                t_k = jnp.sum(jcam_slab(w, k) * vslot, axis=0, keepdims=True)
                ev += jx_slab(w, k) * t_k
        if mode == "edot":
            ev_ref[:] = ev
            return
        rhs_rows = ev
    else:
        rhs_rows = gp_ref[:]

    wv = jnp.concatenate(
        [jnp.sum(binv_ref[3 * i: 3 * i + 3, :] * rhs_rows, axis=0,
                 keepdims=True) for i in range(3)], axis=0)

    acc = jnp.zeros((Vl, 18), dtype)
    for w in range(W):
        oh = onehot(w)
        u = jnp.zeros((18, block), dtype)
        for k in range(2):
            t2_k = jnp.sum(jx_slab(w, k) * wv, axis=0, keepdims=True)
            u += jcam_slab(w, k) * t2_k
        acc += dot(oh, u.T)

    @pl.when(pl.program_id(0) % bpc == 0)
    def _():
        out_ref[0] = acc

    @pl.when(pl.program_id(0) % bpc != 0)
    def _():
        out_ref[0] += acc


@functools.partial(
    jax.jit,
    static_argnames=("mode", "block_n", "interpret"),
)
def tile_sweep_local(cell_t, jcam_t, jx_t, binv_t, gp_t, v_locals,
                     mode="matvec", block_n=256, interpret=False):
    """Fused sweep over a locality-blocked bucket.

    ``cell_t`` carries LOCAL ids (W, Nb); ``v_locals`` the per-chunk local
    v tables (n_chunks, 18, V_local) — ``v_cells[chunk_cells]`` transposed,
    gathered outside (tiny). Returns per-chunk local bins
    (n_chunks, V_local, 18) for rhs/matvec (caller scatters into the global
    (V, 18)), or (Nb, 3) E v rows for edot.
    """
    W, Nb = cell_t.shape
    n_chunks, _, Vl = v_locals.shape
    assert Nb % n_chunks == 0
    B = Nb // n_chunks
    dtype = binv_t.dtype
    # largest divisor of B not above the requested block (B is normally a
    # power of two, so this loop exits immediately; odd chunk_obs choices
    # must degrade the tile size, not crash mid-solve)
    requested_n = block_n
    block_n = min(block_n, B)
    while B % block_n:
        block_n -= 1
    if block_n < min(requested_n, 8):
        # a severe, otherwise-silent performance cliff: B (rows per chunk)
        # has no divisor near the requested tile width, so the grid
        # degenerates toward one lane per tile
        import warnings

        warnings.warn(
            f"tile_pallas: block_n degraded to {block_n} (requested "
            f"{requested_n}, rows-per-chunk B={B}); choose chunk_obs so "
            f"B has a divisor >= 8", stacklevel=2)
    bpc = B // block_n
    n_tiles = Nb // block_n

    kernel = functools.partial(_sweep_local_kernel, mode=mode, W=W, Vl=Vl,
                               bpc=bpc)
    tile_cols = lambda rows: pl.BlockSpec(
        (rows, block_n), lambda i: (0, i), memory_space=pltpu.VMEM)
    per_chunk = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i // bpc, 0, 0), memory_space=pltpu.VMEM)

    out_cells, ev = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_cols(W),          # cell (local ids)
            tile_cols(36 * W),     # jcam
            tile_cols(6 * W),      # jx
            tile_cols(9),          # binv
            tile_cols(3),          # gp
            per_chunk((18, Vl)),   # v_locals
        ],
        out_specs=[
            per_chunk((Vl, 18)),
            tile_cols(3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, Vl, 18), dtype),
            jax.ShapeDtypeStruct((3, Nb), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cell_t, jcam_t, jx_t, binv_t, gp_t, v_locals)

    if mode == "edot":
        return ev.T
    return out_cells


@functools.partial(
    jax.jit,
    static_argnames=("mode", "block_n", "interpret"),
)
def tile_sweep(cell_t, jcam_t, jx_t, binv_t, gp_t, v_cells,
               mode="matvec", block_n=256, interpret=False):
    """Fused bucket sweep over transposed planes.

    Returns (V, 18) cell-space values for rhs/matvec modes, or (Nb, 3) E v
    rows for edot. ``gp_t`` is ignored in matvec/edot modes; ``v_cells`` is
    ignored in rhs mode (pass a zeros (V, 18) array).
    """
    W, Nb = cell_t.shape
    V = v_cells.shape[0]
    dtype = binv_t.dtype
    Vp = _round_up(V, 8)
    n_pad = _round_up(Nb, block_n)
    n_tiles = n_pad // block_n

    def pad_lanes(x, fill=0):
        return jnp.pad(x, ((0, 0), (0, n_pad - Nb)), constant_values=fill)

    cell_p = pad_lanes(cell_t)        # pad lanes have zero J -> contribute 0
    jcam_p = pad_lanes(jcam_t)
    jx_p = pad_lanes(jx_t)
    binv_p = pad_lanes(binv_t)
    gp_p = pad_lanes(gp_t)
    v_t = jnp.zeros((18, Vp), dtype).at[:, :V].set(v_cells.T.astype(dtype))

    kernel = functools.partial(_sweep_kernel, mode=mode, W=W, Vp=Vp)
    tile_cols = lambda rows: pl.BlockSpec(
        (rows, block_n), lambda i: (0, i), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)

    out_cells, ev = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_cols(W),         # cell
            tile_cols(36 * W),    # jcam
            tile_cols(6 * W),     # jx
            tile_cols(9),         # binv
            tile_cols(3),         # gp
            full((18, Vp)),       # v
        ],
        out_specs=[
            full((Vp, 18)),
            tile_cols(3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Vp, 18), dtype),
            jax.ShapeDtypeStruct((3, n_pad), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cell_p, jcam_p, jx_p, binv_p, gp_p, v_t)

    if mode == "edot":
        return ev[:, :Nb].T
    return out_cells[:V, :]


# ---------------------------------------------------------------------------
# Fused linearization kernel (locality-blocked buckets)
# ---------------------------------------------------------------------------
# Measured on the v5e at BAL scale (1M pts, W=8, V_local=128), the XLA
# linearize (solver/tiles.linearize_tiles) costs 0.65 s — 75% of the whole
# LM step — because its einsums carry trailing dims of 2/3/18 that map onto
# 1/64th of the vector lanes and every intermediate round-trips HBM. This
# kernel runs the ENTIRE closed-form linearization per lane-block in VMEM
# (the same derivative chain as kernels/rig_pallas._linearize_kernel, the
# closed form of ``src/snavely_reprojection_error.hh:38-118``), emitting:
#
#   r_t    (2W, Nb)   masked (+loss-weighted) residual planes
#   jx_t   (6W, Nb)   point-Jacobian planes, point-freeze-masked
#   jcam_t (36W, Nb)  camera-Jacobian planes, freeze-masked
#   pout   (12, Nb)   rows 0:3 g_p, 3:12 row-major H_pp
#   gc     (n_chunks, V_local, 18)   per-chunk local gradient bins
#   hc     (n_chunks, V_local, 171)  per-chunk local Gram bins (triu pack)
#   cost   scalar
#
# r/jx/jcam come out ALREADY in the transposed plane layout the sweep
# kernels consume (pack_bucket_planes becomes a no-op on this path). The
# per-slot camera parameters come from one exact one-hot matmul against the
# chunk's (V_local, 78) packed table (solver/tiles.pack_cells layout).

# packed-table column indices (solver/tiles.PACKED_DIM layout)
_PRI = 0      # R_inner row-major 3x3
_PRO = 9
_PROI = 18    # R_o @ R_i
_PTI = 27
_PTO = 30
_PJRO = 33    # SO(3) right Jacobian at w_outer
_PJRI = 42
_PCX = 51
_PCY = 52
_PFX = 53
_PFY = 54
_PD0 = 55
_PD1 = 56
_PFSH = 57
_PM1 = 58
_PM2 = 59
_PFR = 60     # free18: [outer rot+t (6), inner rot+t (6), intr (6)]


def _linearize_local_kernel(
    cell_ref, xy0_ref, xy1_ref, mask_ref, pts_ref, table_ref,
    pout_ref, r_ref, jx_ref, jcam_ref, gc_ref, hc_ref, cost_ref,
    *, loss, loss_scale, W, Vl, bpc,
):
    from deeparc_tpu.kernels.rig_pallas import _loss_rho, _loss_weight

    dtype = xy0_ref.dtype
    block = cell_ref.shape[1]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (Vl, block), 0)
    table = table_ref[0]                                  # (Vl, 78)
    X = [pts_ref[a:a + 1, :] for a in range(3)]
    pf = [pts_ref[3 + a:4 + a, :] for a in range(3)]

    def dot_t(a, b):    # (Vl, A) x (Vl, n) -> (A, n)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=dtype)

    def dot(a, b):      # (Vl, n) x (n, A) -> (Vl, A)
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=dtype)

    gp_acc = [jnp.zeros((1, block), dtype) for _ in range(3)]
    hpp_acc = {}
    acc_gc = jnp.zeros((Vl, 18), dtype)
    acc_hc = jnp.zeros((Vl, 171), dtype)
    cost_val = jnp.zeros((), dtype)

    for w in range(W):
        oh = (iota_v == cell_ref[w:w + 1, :]).astype(dtype)   # (Vl, n)
        sl = dot_t(table, oh)                                 # (78, n)
        col = lambda c: sl[c:c + 1, :]
        mask = mask_ref[w:w + 1, :]
        xy0 = xy0_ref[w:w + 1, :]
        xy1 = xy1_ref[w:w + 1, :]

        # ---- residual chain (z-guarded for masked slots) ----
        p2 = [
            X[0] * col(_PRI + 3 * a) + X[1] * col(_PRI + 3 * a + 1)
            + X[2] * col(_PRI + 3 * a + 2) + col(_PTI + a)
            for a in range(3)
        ]
        p3 = [
            p2[0] * col(_PRO + 3 * a) + p2[1] * col(_PRO + 3 * a + 1)
            + p2[2] * col(_PRO + 3 * a + 2) + col(_PTO + a)
            for a in range(3)
        ]
        z = p3[2] * mask + (1.0 - mask)       # mask is exactly 0/1
        inv_z = 1.0 / z
        u0 = p3[0] * inv_z
        u1 = p3[1] * inv_z
        r2 = u0 * u0 + u1 * u1
        dcoef = 1.0 + r2 * (col(_PD0) + col(_PD1) * r2)
        r0 = (col(_PFX) * dcoef * u0 + col(_PCX) - xy0) * mask
        r1 = (col(_PFY) * dcoef * u1 + col(_PCY) - xy1) * mask

        raw_s = r0 * r0 + r1 * r1
        cost_val += 0.5 * jnp.sum(_loss_rho(raw_s, loss, loss_scale) * mask)
        lw = _loss_weight(raw_s, loss, loss_scale)
        if lw is None:
            wm = mask
        else:
            wm = mask * lw
            r0, r1 = r0 * lw, r1 * lw

        # ---- A = d res / d p3 (2x3), masked+weighted ----
        g = col(_PD0) + 2.0 * col(_PD1) * r2
        c00 = dcoef + 2.0 * g * u0 * u0
        c11 = dcoef + 2.0 * g * u1 * u1
        c01 = 2.0 * g * u0 * u1
        ccr = dcoef + 2.0 * g * r2
        fxz = col(_PFX) * inv_z * wm
        fyz = col(_PFY) * inv_z * wm
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
            jx_k = chain_mat(A[k], _PROI)
            B_k = chain_mat(A[k], _PRO)
            Cw = cross(B_k, p2)
            Dw = cross(jx_k, X)
            jwo.append([
                -(Cw[0] * col(_PJRO + b) + Cw[1] * col(_PJRO + 3 + b)
                  + Cw[2] * col(_PJRO + 6 + b)) for b in range(3)
            ])
            jwi.append([
                -(Dw[0] * col(_PJRI + b) + Dw[1] * col(_PJRI + 3 + b)
                  + Dw[2] * col(_PJRI + 6 + b)) for b in range(3)
            ])
            jx.append(jx_k)
            jti.append(B_k)

        # intrinsic columns [cx, cy, f0, f1, d0, d1]
        zero = jnp.zeros_like(wm)
        du0, du1 = dcoef * u0, dcoef * u1
        sh = col(_PFSH)
        jint = [
            [wm, zero, du0 * wm, zero,
             col(_PFX) * u0 * r2 * col(_PM1) * wm,
             col(_PFX) * u0 * r2 * r2 * col(_PM2) * wm],
            [zero, wm, sh * du1 * wm, (1.0 - sh) * du1 * wm,
             col(_PFY) * u1 * r2 * col(_PM1) * wm,
             col(_PFY) * u1 * r2 * r2 * col(_PM2) * wm],
        ]

        jx_f = [[jx[k][b] * pf[b] for b in range(3)] for k in range(2)]
        P = [
            [jwo[k][b] * col(_PFR + b) for b in range(3)]
            + [A[k][b] * col(_PFR + 3 + b) for b in range(3)]
            + [jwi[k][b] * col(_PFR + 6 + b) for b in range(3)]
            + [jti[k][b] * col(_PFR + 9 + b) for b in range(3)]
            + [jint[k][j] * col(_PFR + 12 + j) for j in range(6)]
            for k in range(2)
        ]

        # ---- plane outputs (already in sweep-kernel layout; possibly
        # stored bf16 — the sweeps read these 31+ times per LM step) ----
        r_ref[2 * w:2 * w + 1, :] = r0.astype(r_ref.dtype)
        r_ref[2 * w + 1:2 * w + 2, :] = r1.astype(r_ref.dtype)
        for k in range(2):
            for i in range(3):
                jx_ref[w * 6 + k * 3 + i: w * 6 + k * 3 + i + 1, :] = (
                    jx_f[k][i].astype(jx_ref.dtype))
            for j in range(18):
                jcam_ref[w * 36 + k * 18 + j: w * 36 + k * 18 + j + 1, :] = (
                    P[k][j].astype(jcam_ref.dtype))

        # ---- point side (within-row reduction == accumulate over w) ----
        for i in range(3):
            gp_acc[i] += jx_f[0][i] * r0 + jx_f[1][i] * r1
        for i in range(3):
            for j in range(i, 3):
                h = jx_f[0][i] * jx_f[0][j] + jx_f[1][i] * jx_f[1][j]
                hpp_acc[i, j] = hpp_acc.get((i, j), 0.0) + h

        # ---- cell side: bin through the slot's one-hot (MXU) ----
        g18 = jnp.concatenate(
            [P[0][i] * r0 + P[1][i] * r1 for i in range(18)], axis=0)
        acc_gc += dot(oh, g18.T)
        h171 = jnp.concatenate(
            [P[0][i] * P[0][j] + P[1][i] * P[1][j]
             for i, j in zip(_TRIU_I, _TRIU_J)], axis=0)
        acc_hc += dot(oh, h171.T)

    rows = [gp_acc[i] for i in range(3)]
    for i in range(3):
        for j in range(3):
            rows.append(hpp_acc[min(i, j), max(i, j)])
    pout_ref[:] = jnp.concatenate(rows, axis=0)           # (12, n)

    @pl.when(pl.program_id(0) % bpc == 0)
    def _():
        gc_ref[0] = acc_gc
        hc_ref[0] = acc_hc

    @pl.when(pl.program_id(0) % bpc != 0)
    def _():
        gc_ref[0] += acc_gc
        hc_ref[0] += acc_hc

    @pl.when(pl.program_id(0) == 0)
    def _():
        cost_ref[0, 0] = cost_val

    @pl.when(pl.program_id(0) != 0)
    def _():
        cost_ref[0, 0] += cost_val


@functools.partial(
    jax.jit,
    static_argnames=("loss", "loss_scale", "block_n", "interpret",
                     "plane_dtype"),
)
def tile_linearize_local(pts_pack, cell_t, xy0_t, xy1_t, mask_t, tables,
                         loss="trivial", loss_scale=0.5, block_n=256,
                         interpret=False, plane_dtype=None):
    """Fused linearization over one locality-blocked bucket.

    ``pts_pack`` is (8, Nb): rows 0:3 points^T, 3:6 point-freeze^T (rows
    6:8 padding). ``cell_t`` carries LOCAL ids (W, Nb); ``tables`` the
    per-chunk packed cell tables (n_chunks, V_local, 78). Returns
    (cost, pout, r_t, jx_t, jcam_t, gc, hc) as documented above.

    ``plane_dtype`` (e.g. ``jnp.bfloat16``) stores the r/jx/jcam plane
    outputs in reduced precision — halves both this kernel's write traffic
    and every downstream sweep's read traffic; the point/cell system
    outputs (pout, gc, hc, cost) always stay in the working dtype.
    """
    W, Nb = cell_t.shape
    n_chunks, Vl, _ = tables.shape
    assert Nb % n_chunks == 0, (Nb, n_chunks)
    B = Nb // n_chunks
    dtype = xy0_t.dtype
    # largest divisor of B not above the requested block (see
    # tile_sweep_local: user-chosen chunk_obs must not crash mid-solve)
    requested_n = block_n
    block_n = min(block_n, B)
    while B % block_n:
        block_n -= 1
    if block_n < min(requested_n, 8):
        # a severe, otherwise-silent performance cliff: B (rows per chunk)
        # has no divisor near the requested tile width, so the grid
        # degenerates toward one lane per tile
        import warnings

        warnings.warn(
            f"tile_pallas: block_n degraded to {block_n} (requested "
            f"{requested_n}, rows-per-chunk B={B}); choose chunk_obs so "
            f"B has a divisor >= 8", stacklevel=2)
    bpc = B // block_n
    n_tiles = Nb // block_n

    kernel = functools.partial(_linearize_local_kernel, loss=loss,
                               loss_scale=loss_scale, W=W, Vl=Vl, bpc=bpc)
    tile_cols = lambda rows: pl.BlockSpec(
        (rows, block_n), lambda i: (0, i), memory_space=pltpu.VMEM)
    per_chunk = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i // bpc, 0, 0), memory_space=pltpu.VMEM)

    pout, r_t, jx_t, jcam_t, gc, hc, cost = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            tile_cols(W),           # cell (local ids)
            tile_cols(W),           # xy0
            tile_cols(W),           # xy1
            tile_cols(W),           # mask
            tile_cols(8),           # pts pack
            per_chunk((Vl, 78)),    # tables
        ],
        out_specs=[
            tile_cols(12),
            tile_cols(2 * W),
            tile_cols(6 * W),
            tile_cols(36 * W),
            per_chunk((Vl, 18)),
            per_chunk((Vl, 171)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, Nb), dtype),
            jax.ShapeDtypeStruct((2 * W, Nb), plane_dtype or dtype),
            jax.ShapeDtypeStruct((6 * W, Nb), plane_dtype or dtype),
            jax.ShapeDtypeStruct((36 * W, Nb), plane_dtype or dtype),
            jax.ShapeDtypeStruct((n_chunks, Vl, 18), dtype),
            jax.ShapeDtypeStruct((n_chunks, Vl, 171), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cell_t, xy0_t, xy1_t, mask_t, pts_pack, tables)

    return cost[0, 0], pout, r_t, jx_t, jcam_t, gc, hc
