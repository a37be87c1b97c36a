"""Live-band preparation for the grid engine (host-side, one-time).

The dense-grid kernels pay for every (point, cell) slot; at sparse
visibility most slots are dead. Real visibility is not uniform-random:
a surface point on a turntable rig is seen from a contiguous CYCLIC window
of rotation positions (self-occlusion), and general SfM camera graphs have
the same co-visibility locality the tile engine exploits with RCM
(solver/tiles.py). This module finds that structure for the grid layout:

1. **Cell ordering** — try several cell renumberings (identity, reverse
   Cuthill-McKee on the cell co-visibility graph, and a spectral CYCLIC
   embedding: the angle of the two leading nontrivial eigenvectors of the
   co-visibility operator, which recovers ring order on turntable rigs
   without RCM's cycle-folding) and keep whichever yields the narrowest
   bands.
2. **Point ordering** — sort points by the circular mean of their visible
   cells, so each kernel tile of ``block_np`` points shares one band.
3. **Band table** — per point tile, the minimal cyclic window of 8-cell
   slabs covering every live cell; the static band width is the max over
   tiles. Wrapped windows are handled by the kernels' cyclic plane
   extension (kernels/rig_pallas.py banded section).

All heavy reductions (co-visibility Gram, tile liveness) run ON DEVICE;
only (T, T)- and (n_tiles, nb)-sized summaries cross to the host (the
tunneled chip moves data at ~MB/s — fetching the (N, T) mask would cost
minutes).

If no ordering produces a band narrower than ``max_frac * t_pad`` (e.g.
uniform-random visibility, or a dense rig) the prep returns None and the
caller uses the monolithic kernels — banding is an optimization, never a
requirement. The reference bar: Ceres only ever evaluates real residual
blocks (``/root/reference/src/sfm.cc:36-48``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from deeparc_tpu.solver.rig_grid import GridIndex


class BandPrep(NamedTuple):
    grid: GridIndex      # cell-renumbered, point-sorted; band=(starts_lin,
    #                      starts_cost) attached
    w_band: int          # max band width (cells) over lin groups (logging)
    w_band_cost: int     # max band width over cost groups (logging)
    perm: jnp.ndarray    # (N,) sorted row i holds original point perm[i]
    inv: jnp.ndarray     # (N,) original point p sits at sorted row inv[p]
    block_np: int = 256        # point-tile width the lin table was built for
    cost_block_np: int = 1024  # point-tile width the cost table was built for
    # width-bucketed tile groups ((w, tile_lo, tile_hi), ...): tiles are
    # reordered so each group is a contiguous tile range paying its OWN
    # band width instead of the global max (in-band dead work fix)
    lin_groups: tuple = ()
    cost_groups: tuple = ()

    @property
    def widths(self):
        """(band_widths, band_blocks) for make_grid_step/init_grid_state."""
        return ((self.lin_groups or self.w_band,
                 self.cost_groups or self.w_band_cost),
                (self.block_np, self.cost_block_np))

    @property
    def slot_work(self):
        """(paid_slot_cells, uniform_slot_cells) for the lin tiling — the
        bench's auditable 'how much dead work does the band still pay'."""
        paid = sum(w * (hi - lo) for w, lo, hi in self.lin_groups)
        n_tiles = self.lin_groups[-1][2] if self.lin_groups else 0
        return paid * self.block_np, self.w_band * n_tiles * self.block_np


def _partition_widths(covers8: np.ndarray, max_groups: int):
    """Optimal contiguous partition of SORTED tile covers into <= max_groups
    width buckets minimizing total paid slabs sum(n_g * max_g).

    Returns the bucket width (in 8-cell slabs, >= 1) per TILE (unsorted
    order). O(G * n^2) exact DP on the host; n_tiles is ~1e3."""
    n = covers8.shape[0]
    order = np.argsort(covers8, kind="stable")
    c = np.maximum(covers8[order].astype(np.float64), 1.0)
    # dp[g][i] = min paid slabs for sorted tiles [i, n) with <= g groups;
    # the first group is [i, j), paying (j - i) * c[j-1]
    dp_prev = (n - np.arange(n + 1)) * c[-1]          # <= 1 group
    dp_prev[n] = 0.0
    cuts = [None]  # cuts[g][i] = first cut j for <= g+1 groups
    for _ in range(2, max_groups + 1):
        dp = np.zeros(n + 1)
        cut = np.full(n + 1, n, np.int64)
        for i in range(n - 1, -1, -1):
            v = np.arange(1, n - i + 1) * c[i:] + dp_prev[i + 1:]
            j = int(np.argmin(v))
            dp[i] = v[j]
            cut[i] = i + 1 + j
        dp_prev, _ = dp, cuts.append(cut)
    widths_sorted = np.empty(n, np.int64)
    g, i = len(cuts) - 1, 0
    while i < n:
        j = int(cuts[g][i]) if g >= 1 and cuts[g] is not None else n
        widths_sorted[i:j] = int(c[j - 1])
        i, g = j, max(g - 1, 0)
    out = np.empty(n, np.int64)
    out[order] = widths_sorted
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cell_orderings(cooc: np.ndarray, names) -> list:
    """Candidate cell permutations (each maps new rank -> old cell id)."""
    T = cooc.shape[0]
    out = []
    if "identity" in names:
        out.append(np.arange(T, dtype=np.int64))
    if "rcm" in names and T > 2:
        try:
            import scipy.sparse as sp
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            adj = sp.csr_matrix((cooc > 0).astype(np.float32))
            out.append(np.asarray(
                reverse_cuthill_mckee(adj, symmetric_mode=True), np.int64))
        except Exception:
            pass
    if "spectral" in names and T > 3:
        # cyclic embedding: leading nontrivial eigenvectors of the
        # degree-normalized co-visibility operator trace out the circle for
        # cyclically-banded graphs; ordering cells by their angle recovers
        # the ring order without cutting the cycle
        a = cooc.astype(np.float64)
        d = np.maximum(a.sum(axis=1), 1e-9)
        a = a / np.sqrt(d[:, None] * d[None, :])
        vals, vecs = np.linalg.eigh(a)
        v1, v2 = vecs[:, -2], vecs[:, -3]
        out.append(np.argsort(np.arctan2(v2, v1)).astype(np.int64))
    return out


@jax.jit
def _point_order(mask, cell_perm):
    """Device: circular-mean cell angle per point -> sorted point order."""
    T = mask.shape[1]
    m = mask[:, cell_perm]
    ang = 2.0 * jnp.pi * jnp.arange(T, dtype=mask.dtype) / T
    theta = jnp.arctan2(m @ jnp.sin(ang), m @ jnp.cos(ang))
    return jnp.argsort(theta, stable=True)


def _tile_liveness(mask, order, cell_perm, t_pad, bn, n_pad):
    """Device: (n_tiles, t_pad/8) slab-liveness of the sorted+permuted mask."""
    N, T = mask.shape
    m = mask[order][:, cell_perm]
    m = jnp.pad(m, ((0, n_pad - N), (0, t_pad - T)))
    return jnp.asarray(
        m.reshape(n_pad // bn, bn, t_pad // 8, 8).sum(axis=(1, 3)) > 0.5)


def _covers_from_liveness(lv: np.ndarray):
    """Host: per-tile minimal cyclic 8-block window -> (starts8, covers8)."""
    n_tiles, nb = lv.shape
    starts = np.zeros(n_tiles, np.int32)
    covers = np.ones(n_tiles, np.int32)
    for i, row in enumerate(lv):
        pos = np.nonzero(row)[0]
        if pos.size == 0:
            covers[i] = 0
            continue
        gaps = np.diff(np.concatenate([pos, [pos[0] + nb]]))
        gmax = int(np.argmax(gaps))
        starts[i] = pos[(gmax + 1) % pos.size]
        covers[i] = nb - int(gaps[gmax]) + 1
    return starts, covers


def band_grid(
    grid: GridIndex,
    block_np: int = 256,
    cost_block_np: int = 1024,
    max_frac: float = 0.85,
    orderings=("identity", "rcm", "spectral"),
) -> BandPrep | None:
    """Build the banded layout, or None when banding would not pay.

    The caller must permute point-indexed arrays (``params.points``, the
    point freeze mask) by ``prep.perm`` before solving and map results back
    with ``prep.inv`` (or ``prep.perm`` as a gather). Cell renumbering is
    internal to the returned GridIndex — slot tables and one-hots are
    permuted consistently, so solve semantics are unchanged.
    """
    N, T = grid.xy0.shape
    t_pad = _round_up(T, 8)
    if T < 16:
        return None
    # one shared padded width serves both kernels' tile grids (the cost
    # pass uses wider point tiles) and the prebuilt plane stacks
    assert max(block_np, cost_block_np) % min(block_np, cost_block_np) == 0
    n_pad = _round_up(N, max(block_np, cost_block_np))
    cooc = np.asarray(
        jnp.einsum("nt,nu->tu", grid.mask, grid.mask))     # (T, T), tiny

    best = None
    for cell_perm in _cell_orderings(cooc, orderings):
        cp = jnp.asarray(cell_perm)
        order = _point_order(grid.mask, cp)
        lv = np.asarray(_tile_liveness(grid.mask, order, cp, t_pad,
                                       block_np, n_pad))
        starts, covers = _covers_from_liveness(lv)
        w = max(int(covers.max()) if covers.size else 1, 1) * 8
        if best is None or w < best[0]:
            best = (w, cp, order, starts)
    w_band, cell_perm, order, starts = best
    if w_band >= max_frac * t_pad:
        return None

    lv_cost = np.asarray(
        _tile_liveness(grid.mask, order, cell_perm, t_pad, cost_block_np,
                       n_pad))
    starts_cost, covers_cost = _covers_from_liveness(lv_cost)
    w_cost = min(
        max(int(covers_cost.max()) if covers_cost.size else 1, 1) * 8,
        t_pad)   # a full-width cyclic band covers every cell exactly once

    new_grid = grid._replace(
        xy0=grid.xy0[order][:, cell_perm],
        xy1=grid.xy1[order][:, cell_perm],
        mask=grid.mask[order][:, cell_perm],
        point_mask=grid.point_mask[order],
        slot_outer=grid.slot_outer[cell_perm],
        slot_inner=grid.slot_inner[cell_perm],
        slot_intr=grid.slot_intr[cell_perm],
        onehot_outer=grid.onehot_outer[cell_perm],
        onehot_inner=grid.onehot_inner[cell_perm],
        onehot_intr=grid.onehot_intr[cell_perm],
        focal_shared=grid.focal_shared[cell_perm],
        dist_m1=grid.dist_m1[cell_perm],
        dist_m2=grid.dist_m2[cell_perm],
    )
    # pre-gathered per-tile band planes: the observation planes never
    # change during LM, so ONE gather per solve buys banded kernels with
    # the monolithic kernel's step structure (kernels/rig_pallas.py)
    from deeparc_tpu.kernels.rig_pallas import (
        banded_planes, gather_banded_planes,
    )

    pxm_ext = banded_planes(new_grid, n_pad, max(w_band, w_cost))
    starts_d = jnp.asarray(starts)
    starts_cost_d = jnp.asarray(starts_cost)
    pxm_lin = gather_banded_planes(pxm_ext, starts_d, w_band, block_np)
    pxm_cost = gather_banded_planes(pxm_ext, starts_cost_d, w_cost,
                                    cost_block_np)
    new_grid = new_grid._replace(
        band=(starts_d, starts_cost_d, pxm_lin, pxm_cost))
    inv = jnp.argsort(order)
    return BandPrep(grid=new_grid, w_band=int(w_band),
                    w_band_cost=int(w_cost), perm=order, inv=inv,
                    block_np=block_np, cost_block_np=cost_block_np)
