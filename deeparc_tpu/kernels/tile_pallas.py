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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the sweep kernel unrolls the slot loop; wider buckets (rare) fall back to
# the XLA sweep (solver/tiles._e_sweep)
MAX_KERNEL_WIDTH = 32


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
    """One tile: rows in lanes, slots unrolled as slab ops."""
    dtype = jcam_ref.dtype
    block = cell_ref.shape[1]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (Vp, block), 0)

    def onehot(w):
        return (iota_v == cell_ref[w:w + 1, :]).astype(dtype)  # (Vp, block)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=dtype)

    def jcam_slab(w, k):
        base = w * 36 + k * 18
        return jcam_ref[base: base + 18, :]            # (18, block)

    def jx_slab(w, k):
        base = w * 6 + k * 3
        return jx_ref[base: base + 3, :]               # (3, block)

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
    accumulated over the bpc lane-blocks of the chunk."""
    dtype = jcam_ref.dtype
    block = cell_ref.shape[1]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (Vl, block), 0)

    def onehot(w):
        return (iota_v == cell_ref[w:w + 1, :]).astype(dtype)   # (Vl, block)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=dtype)

    def jcam_slab(w, k):
        base = w * 36 + k * 18
        return jcam_ref[base: base + 18, :]

    def jx_slab(w, k):
        base = w * 6 + k * 3
        return jx_ref[base: base + 3, :]

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
    dtype = jcam_t.dtype
    block_n = min(block_n, B)
    assert B % block_n == 0, (B, block_n)
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
    dtype = jcam_t.dtype
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
