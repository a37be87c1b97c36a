"""Synthetic hemisphere / turntable rig generator with ground truth.

The reference's input datasets (``data/teabottle_green*.deeparc``) are
stripped from its mount (``/root/reference/.MISSING_LARGE_BLOBS``), so the
framework generates its own teabottle-shaped problems (SURVEY.md section 4 and
section 6): an object on a turntable (the "rings" — azimuth steps about the
vertical axis) viewed by cameras along a meridian arc (the "arcs" —
elevations), with the composed extrinsic convention of the reference
(``p = R_arc (R_ring X + t_ring) + t_arc``,
``src/snavely_reprojection_error.hh:96-108``) and its record layout: the
world frame IS camera (0,0)'s frame (hence the reference gauge-fixes that
extrinsic, ``src/sfm.cc:50-53``), record 0 = identity, arc a >= 1 at record a,
ring r >= 1 at record ``r + n_arc - 1`` (``src/DeepArcManager.cc:166-171``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from deeparc_tpu.io.deeparc_format import DeepArcData


@dataclasses.dataclass
class SyntheticRig:
    data: DeepArcData          # noisy problem, as would be loaded from disk
    gt_points: np.ndarray      # (N, 3) ground-truth structure
    gt_ext_rot: np.ndarray     # (E, 3) ground-truth extrinsics
    gt_ext_trans: np.ndarray   # (E, 3)
    image_size: tuple          # (width, height)


def _look_at(pos: np.ndarray, target: np.ndarray) -> tuple:
    """World->camera (R, t): z = forward to target, y = world-down projected."""
    f = target - pos
    f = f / np.linalg.norm(f)
    down_hint = np.array([0.0, 1.0, 0.0])
    r = np.cross(down_hint, f)
    r = r / np.linalg.norm(r)
    d = np.cross(f, r)
    R = np.stack([r, d, f], axis=0)
    t = -R @ pos
    return R, t


def _rotmat_to_aa(R: np.ndarray) -> np.ndarray:
    from deeparc_tpu.io.deeparc_format import _np_matrix_to_angle_axis

    return _np_matrix_to_angle_axis(R.reshape(9, order="F"))


def make_hemisphere_rig(
    n_arc: int = 4,
    n_ring: int = 8,
    n_points: int = 500,
    rho: float = 2.0,
    object_radius: float = 0.4,
    focal: float = 1000.0,
    image_size: tuple = (1600, 1200),
    focal_size: int = 1,
    dist_size: int = 0,
    dist_coeffs: tuple = (-0.05, 0.01),
    pixel_noise: float = 0.0,
    point_noise: float = 0.0,
    ext_noise: float = 0.0,
    random_points: bool = False,
    visibility: float = 1.0,
    occlusion_rings: int | None = None,
    min_track_length: int = 2,
    seed: int = 0,
) -> SyntheticRig:
    """Build a shared-extrinsic rig problem with known ground truth.

    ``occlusion_rings`` models self-occlusion (the visibility structure a
    real turntable capture has): a surface point is only seen while the
    turntable faces it toward the camera meridian — a contiguous cyclic
    window of that many rotation steps. See ``make_grid_rig_device``.

    ``random_points=True`` reproduces the ``teabottle_green_randompoint``
    configuration (BASELINE.json config 2): structure initialized uniformly at
    random in the object's bounding box instead of near the truth.

    ``ext_noise`` perturbs the STORED extrinsics (angle-axis radians and
    translation units, rows >= 1 — the identity/gauge slot stays exact)
    while observations are projected from the true cameras: the realistic
    SfM condition where the full-BA rounds of the pipeline loop actually
    move the cameras, unlike the exact-camera default.
    """
    rng = np.random.default_rng(seed)
    c_obj = np.array([0.0, 0.0, rho])

    # --- ground-truth extrinsic records -----------------------------------
    n_ext = n_arc + n_ring - 1
    ext_rot = np.zeros((n_ext, 3))
    ext_trans = np.zeros((n_ext, 3))
    # arcs (record a, a >= 1): look-at cameras at elevation theta_a on the
    # meridian circle of radius rho around the object center (x = 0 plane).
    max_elev = np.deg2rad(70.0)
    for a in range(1, n_arc):
        theta = max_elev * a / max(n_arc - 1, 1)
        pos = c_obj + np.array(
            [0.0, -rho * np.sin(theta), -rho * np.cos(theta)]
        )
        R, t = _look_at(pos, c_obj)
        ext_rot[a] = _rotmat_to_aa(R)
        ext_trans[a] = t
    # rings (record r + n_arc - 1, r >= 1): turntable rotation by phi about
    # the vertical (y) axis through the object center: X' = Ry(X - c) + c.
    for r in range(1, n_ring):
        phi = 2.0 * np.pi * r / n_ring
        aa = np.array([0.0, phi, 0.0])
        cphi, sphi = np.cos(phi), np.sin(phi)
        Ry = np.array([[cphi, 0, sphi], [0, 1, 0], [-sphi, 0, cphi]])
        ext_rot[n_arc - 1 + r] = aa
        ext_trans[n_arc - 1 + r] = c_obj - Ry @ c_obj

    # --- ground-truth structure ------------------------------------------
    pts = rng.normal(size=(n_points, 3))
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    radii = object_radius * np.cbrt(rng.uniform(size=(n_points, 1)))
    gt_points = c_obj + pts * radii
    colors = rng.integers(0, 256, size=(n_points, 3)).astype(np.int32)

    # --- intrinsics (one per arc, shared around each ring;
    #     src/DeepArcManager.cc:210-214) ----------------------------------
    K = n_arc
    cx, cy = image_size[0] / 2.0, image_size[1] / 2.0
    center = np.tile([cx, cy], (K, 1))
    focal_arr = np.zeros((K, 2))
    focal_arr[:, 0] = focal
    if focal_size == 2:
        focal_arr[:, 1] = focal * 1.01
    dist_arr = np.zeros((K, 2))
    if dist_size >= 1:
        dist_arr[:, 0] = dist_coeffs[0]
    if dist_size == 2:
        dist_arr[:, 1] = dist_coeffs[1]

    # --- project every point into every (arc, ring) cell ------------------
    # Composed model exactly as the residual evaluates it.
    from deeparc_tpu.io.deeparc_format import DeepArcData as _D  # noqa: F401

    def cell_extrinsics(a, r):
        """(outer R|t, inner R|t) per reference slot rules (ParameterBlock.hh:75-92)."""
        ring_rec = 0 if r == 0 else r + n_arc - 1
        if r == 0:
            return a, None
        if a == 0:
            return ring_rec, None
        return a, ring_rec

    def aa_to_R(aa):
        th = np.linalg.norm(aa)
        if th < 1e-12:
            return np.eye(3)
        w = aa / th
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)

    obs_arc, obs_ring, obs_point, obs_xy = [], [], [], []
    w_img, h_img = image_size
    if occlusion_rings is not None:
        d_obj = gt_points - c_obj
        alpha = np.arctan2(d_obj[:, 0], d_obj[:, 2])
        half_w = np.pi * occlusion_rings / n_ring
    for a in range(n_arc):
        for r in range(n_ring):
            outer, inner = cell_extrinsics(a, r)
            p = gt_points
            if inner is not None:
                p = p @ aa_to_R(ext_rot[inner]).T + ext_trans[inner]
            p = p @ aa_to_R(ext_rot[outer]).T + ext_trans[outer]
            z_ok = p[:, 2] > 0.2
            xp = p[:, 0] / np.where(z_ok, p[:, 2], 1.0)
            yp = p[:, 1] / np.where(z_ok, p[:, 2], 1.0)
            r2 = xp * xp + yp * yp
            d0 = dist_arr[a, 0] if dist_size >= 1 else 0.0
            d1 = dist_arr[a, 1] if dist_size == 2 else 0.0
            distortion = 1.0 + r2 * (d0 + d1 * r2)
            fx = focal_arr[a, 0]
            fy = focal_arr[a, 1] if focal_size == 2 else focal_arr[a, 0]
            u = fx * distortion * xp + cx
            v = fy * distortion * yp + cy
            in_img = z_ok & (u >= 0) & (u < w_img) & (v >= 0) & (v < h_img)
            if occlusion_rings is not None:
                phi = 2.0 * np.pi * r / n_ring
                in_img &= np.cos(alpha + phi - np.pi) > np.cos(half_w)
            if visibility < 1.0:
                in_img &= rng.uniform(size=n_points) < visibility
            idx = np.nonzero(in_img)[0]
            obs_arc.append(np.full(idx.shape, a, dtype=np.int32))
            obs_ring.append(np.full(idx.shape, r, dtype=np.int32))
            obs_point.append(idx.astype(np.int32))
            xy = np.stack([u[idx], v[idx]], axis=1)
            obs_xy.append(xy)

    obs_arc = np.concatenate(obs_arc)
    obs_ring = np.concatenate(obs_ring)
    obs_point = np.concatenate(obs_point)
    obs_xy = np.concatenate(obs_xy, axis=0)
    if pixel_noise > 0:
        obs_xy = obs_xy + rng.normal(scale=pixel_noise, size=obs_xy.shape)

    # Drop points with short tracks, then re-index densely.
    counts = np.bincount(obs_point, minlength=n_points)
    keep = counts >= min_track_length
    new_index = np.cumsum(keep) - 1
    mask = keep[obs_point]
    obs_arc, obs_ring = obs_arc[mask], obs_ring[mask]
    obs_point = new_index[obs_point[mask]].astype(np.int32)
    obs_xy = obs_xy[mask]
    gt_points = gt_points[keep]
    colors = colors[keep]
    n_points = gt_points.shape[0]

    # --- initial (noisy) structure ---------------------------------------
    if random_points:
        lo = c_obj - object_radius
        hi = c_obj + object_radius
        init_points = rng.uniform(lo, hi, size=(n_points, 3))
    elif point_noise > 0:
        init_points = gt_points + rng.normal(scale=point_noise, size=(n_points, 3))
    else:
        init_points = gt_points.copy()

    init_ext_rot, init_ext_trans = ext_rot.copy(), ext_trans.copy()
    if ext_noise > 0:
        init_ext_rot[1:] += rng.normal(scale=ext_noise, size=(n_ext - 1, 3))
        init_ext_trans[1:] += rng.normal(scale=ext_noise, size=(n_ext - 1, 3))

    data = DeepArcData(
        version=0.01, share_extrinsic=True, arc_size=n_arc, ring_size=n_ring,
        obs_arc=obs_arc, obs_ring=obs_ring, obs_point=obs_point, obs_xy=obs_xy,
        center=center, focal=focal_arr,
        focal_size=np.full(K, focal_size, dtype=np.int32),
        dist=dist_arr, dist_size=np.full(K, dist_size, dtype=np.int32),
        ext_rot=init_ext_rot, ext_trans=init_ext_trans,
        points=init_points, colors=colors,
    )
    return SyntheticRig(
        data=data, gt_points=gt_points, gt_ext_rot=ext_rot,
        gt_ext_trans=ext_trans, image_size=image_size,
    )


def make_grid_rig_device(
    n_arc: int = 8,
    n_ring: int = 24,
    n_points: int = 400_000,
    rho: float = 2.0,
    object_radius: float = 0.4,
    focal: float = 1000.0,
    image_size: tuple = (1600, 1200),
    pixel_noise: float = 1.0,
    point_noise: float = 0.02,
    visibility: float = None,
    occlusion_rings: int | None = None,
    seed: int = 0,
    dtype=None,
):
    """Device-side synthetic rig directly in the dense-grid layout.

    Builds the same turntable rig as :func:`make_hemisphere_rig` but
    synthesizes the (N, T) observation grid ON the accelerator with jax
    PRNG + the grid projection kernels — only the tiny camera tables cross
    the host->device boundary. This exists because benchmark-scale problems
    (hundreds of MB of observations) are expensive to upload through a
    tunneled device, and because it exercises the exact compute path the
    solver uses.

    ``occlusion_rings`` models SELF-OCCLUSION, the visibility structure
    real turntable captures have: a surface point is only seen while the
    turntable faces it toward the camera meridian, i.e. from a contiguous
    CYCLIC window of ``occlusion_rings`` of the ``n_ring`` rotation steps
    (all arcs inside the window, subject to in-image + ``visibility``
    thinning). ``None`` keeps the uniform-over-all-cells visibility (the
    no-locality worst case). Note ``visibility`` then thins INSIDE the
    window: mean track ~= visibility * occlusion_rings * n_arc.

    Returns (params: BAParams, grid: GridIndex, gt_points (N, 3) jnp).
    """
    import jax
    import jax.numpy as jnp

    from deeparc_tpu.scene import BAParams
    from deeparc_tpu.solver.rig_grid import GridIndex, slot_params

    dtype = dtype or jnp.float32
    # host: tiny tables (same construction as make_hemisphere_rig)
    host = make_hemisphere_rig(
        n_arc=n_arc, n_ring=n_ring, n_points=8, rho=rho,
        object_radius=object_radius, focal=focal, image_size=image_size,
        seed=seed,
    )
    d = host.data
    identity_pad = np.zeros((1, 3))
    params_gt = BAParams(
        points=jnp.zeros((n_points, 3), dtype),  # placeholder
        ext_rot=jnp.asarray(np.concatenate([d.ext_rot, identity_pad]), dtype),
        ext_trans=jnp.asarray(
            np.concatenate([d.ext_trans, identity_pad]), dtype
        ),
        center=jnp.asarray(d.center, dtype),
        focal=jnp.asarray(d.focal, dtype),
        dist=jnp.asarray(d.dist, dtype),
    )

    T = n_arc * n_ring
    arc = np.repeat(np.arange(n_arc), n_ring)
    ring = np.tile(np.arange(n_ring), n_arc)
    ring_rec = np.where(ring == 0, 0, ring + n_arc - 1)
    identity = d.n_extrinsics
    outer = np.where(ring == 0, arc, np.where(arc == 0, ring_rec, arc))
    inner = np.where((ring == 0) | (arc == 0), identity, ring_rec)
    intr = arc

    def onehot(ids, n):
        out = np.zeros((T, n))
        out[np.arange(T), ids] = 1.0
        return out

    K = d.n_intrinsics
    grid = GridIndex(
        xy0=jnp.zeros((n_points, T), dtype),
        xy1=jnp.zeros((n_points, T), dtype),
        mask=jnp.ones((n_points, T), dtype),
        point_mask=jnp.ones((n_points,), dtype),
        slot_outer=jnp.asarray(outer, jnp.int32),
        slot_inner=jnp.asarray(inner, jnp.int32),
        slot_intr=jnp.asarray(intr, jnp.int32),
        onehot_outer=jnp.asarray(onehot(outer, identity + 1), dtype),
        onehot_inner=jnp.asarray(onehot(inner, identity + 1), dtype),
        onehot_intr=jnp.asarray(onehot(intr, K), dtype),
        focal_shared=jnp.asarray((d.focal_size == 1)[intr], dtype),
        dist_m1=jnp.asarray((d.dist_size >= 1)[intr], dtype),
        dist_m2=jnp.asarray((d.dist_size == 2)[intr], dtype),
    )

    @jax.jit
    def synthesize(key):
        from deeparc_tpu.solver.rig_grid import grid_residuals

        k1, k2, k3, k4 = jax.random.split(key, 4)
        direction = jax.random.normal(k1, (n_points, 3), dtype)
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction, axis=1, keepdims=True), 1e-9
        )
        radii = object_radius * jnp.cbrt(
            jax.random.uniform(k2, (n_points, 1), dtype)
        )
        gt_points = jnp.asarray([0.0, 0.0, rho], dtype) + direction * radii

        sp = slot_params(params_gt, grid)
        pred = grid_residuals(gt_points, sp, grid)  # xy=0, mask=1 -> pred
        w, h = image_size
        z_ok = True  # points are in front of every rig camera by construction
        in_img = (
            (pred[..., 0] >= 0) & (pred[..., 0] < w)
            & (pred[..., 1] >= 0) & (pred[..., 1] < h)
        )
        mask = in_img.astype(dtype)
        if occlusion_rings is not None:
            # the point's object-frame azimuth (about the turntable's
            # vertical axis); visible while the ring rotation brings it
            # within +-half_w of facing the camera meridian
            alpha = jnp.arctan2(direction[:, 0], direction[:, 2])
            phis = (2.0 * jnp.pi / n_ring) * jnp.asarray(
                np.tile(np.arange(n_ring), n_arc), dtype)
            half_w = jnp.pi * occlusion_rings / n_ring
            facing = jnp.cos(alpha[:, None] + phis[None, :] - jnp.pi)
            mask = mask * (facing > jnp.cos(half_w)).astype(dtype)
        if visibility is not None:
            keep = jax.random.uniform(k3, mask.shape) < visibility
            mask = mask * keep.astype(dtype)
        xy = pred + pixel_noise * jax.random.normal(k4, pred.shape, dtype)
        xy = xy * mask[..., None]
        init_points = gt_points + point_noise * jax.random.normal(
            jax.random.fold_in(key, 7), gt_points.shape, dtype
        )
        return gt_points, init_points, xy[..., 0], xy[..., 1], mask

    gt_points, init_points, xy0, xy1, mask = synthesize(
        jax.random.PRNGKey(seed)
    )
    import dataclasses as _dc

    params = _dc.replace(params_gt, points=init_points)
    grid = grid._replace(xy0=xy0, xy1=xy1, mask=mask)
    return params, grid, gt_points


def make_bal_synthetic(
    n_cameras: int = 16,
    n_points: int = 400,
    rho: float = 3.0,
    object_radius: float = 1.0,
    focal: float = 800.0,
    track_length: float = 6.0,
    min_track_length: int = 2,
    dist_size: int = 2,
    dist_coeffs: tuple = (-0.02, 0.005),
    pixel_noise: float = 0.0,
    point_noise: float = 0.0,
    ext_noise: float = 0.0,
    seed: int = 0,
) -> SyntheticRig:
    """Non-shared-extrinsic (BAL-style) synthetic problem with ground truth.

    ``ext_noise`` perturbs the INITIAL extrinsics (angle-axis and
    translation) away from the ground truth used for projection — the
    noisy-registration configuration pose-graph refinement targets.

    Cameras are scattered on a sphere of radius ``rho`` looking at a point
    cloud at the origin — the arbitrary camera-graph case the reference
    handles through its non-shared mode (``src/ParameterBlock.hh:52-55``:
    obs columns are (intrinsic_id, extrinsic_id) directly) and Ceres solves
    with sparse DENSE_SCHUR. Each camera is one intrinsic + one extrinsic;
    every point sees a random camera subset with mean ``track_length``.
    """
    rng = np.random.default_rng(seed)

    # --- camera poses on a view sphere ------------------------------------
    ext_rot = np.zeros((n_cameras, 3))
    ext_trans = np.zeros((n_cameras, 3))
    dirs = rng.normal(size=(n_cameras, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # avoid the degenerate straight-down axis for the look-at up-hint
    dirs[:, 1] = np.clip(dirs[:, 1], -0.9, 0.9)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for c in range(n_cameras):
        pos = rho * dirs[c]
        R, t = _look_at(pos, np.zeros(3))
        ext_rot[c] = _rotmat_to_aa(R)
        ext_trans[c] = t

    # --- structure ---------------------------------------------------------
    pts = rng.normal(size=(n_points, 3))
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    gt_points = pts * object_radius * np.cbrt(rng.uniform(size=(n_points, 1)))
    colors = rng.integers(0, 256, size=(n_points, 3)).astype(np.int32)

    # --- intrinsics: one per camera ----------------------------------------
    image_size = (1024, 1024)
    cx, cy = image_size[0] / 2.0, image_size[1] / 2.0
    center = np.tile([cx, cy], (n_cameras, 1))
    focal_arr = np.zeros((n_cameras, 2))
    focal_arr[:, 0] = focal * (1.0 + 0.05 * rng.normal(size=n_cameras))
    dist_arr = np.zeros((n_cameras, 2))
    if dist_size >= 1:
        dist_arr[:, 0] = dist_coeffs[0]
    if dist_size == 2:
        dist_arr[:, 1] = dist_coeffs[1]

    def aa_to_R(aa):
        th = np.linalg.norm(aa)
        if th < 1e-12:
            return np.eye(3)
        w = aa / th
        Kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)

    visibility = min(track_length / n_cameras, 1.0)
    obs_cam, obs_point, obs_xy = [], [], []
    w_img, h_img = image_size
    for c in range(n_cameras):
        p = gt_points @ aa_to_R(ext_rot[c]).T + ext_trans[c]
        z_ok = p[:, 2] > 0.2
        xp = p[:, 0] / np.where(z_ok, p[:, 2], 1.0)
        yp = p[:, 1] / np.where(z_ok, p[:, 2], 1.0)
        r2 = xp * xp + yp * yp
        distortion = 1.0 + r2 * (dist_arr[c, 0] + dist_arr[c, 1] * r2)
        u = focal_arr[c, 0] * distortion * xp + cx
        v = focal_arr[c, 0] * distortion * yp + cy
        in_img = z_ok & (u >= 0) & (u < w_img) & (v >= 0) & (v < h_img)
        in_img &= rng.uniform(size=n_points) < visibility
        idx = np.nonzero(in_img)[0]
        obs_cam.append(np.full(idx.shape, c, dtype=np.int32))
        obs_point.append(idx.astype(np.int32))
        obs_xy.append(np.stack([u[idx], v[idx]], axis=1))

    obs_cam = np.concatenate(obs_cam)
    obs_point = np.concatenate(obs_point)
    obs_xy = np.concatenate(obs_xy, axis=0)
    if pixel_noise > 0:
        obs_xy = obs_xy + rng.normal(scale=pixel_noise, size=obs_xy.shape)

    counts = np.bincount(obs_point, minlength=n_points)
    keep = counts >= min_track_length
    new_index = np.cumsum(keep) - 1
    mask = keep[obs_point]
    obs_cam = obs_cam[mask]
    obs_point = new_index[obs_point[mask]].astype(np.int32)
    obs_xy = obs_xy[mask]
    gt_points = gt_points[keep]
    colors = colors[keep]
    n_points = gt_points.shape[0]

    init_points = gt_points + (
        rng.normal(scale=point_noise, size=(n_points, 3))
        if point_noise > 0 else 0.0
    )
    init_rot = ext_rot.copy()
    init_trans = ext_trans.copy()
    if ext_noise > 0:
        # keep the gauge camera (record 0) exact
        init_rot[1:] += rng.normal(scale=ext_noise, size=(n_cameras - 1, 3))
        init_trans[1:] += rng.normal(scale=ext_noise, size=(n_cameras - 1, 3))

    data = DeepArcData(
        version=0.01, share_extrinsic=False, arc_size=n_cameras, ring_size=0,
        obs_arc=obs_cam, obs_ring=obs_cam.copy(), obs_point=obs_point,
        obs_xy=obs_xy,
        center=center, focal=focal_arr,
        focal_size=np.ones(n_cameras, dtype=np.int32),
        dist=dist_arr, dist_size=np.full(n_cameras, dist_size, dtype=np.int32),
        ext_rot=init_rot, ext_trans=init_trans,
        points=np.asarray(init_points), colors=colors,
    )
    return SyntheticRig(
        data=data, gt_points=gt_points, gt_ext_rot=ext_rot,
        gt_ext_trans=ext_trans, image_size=image_size,
    )


def make_tile_rig_device(
    n_arc: int = 8,
    n_ring: int = 24,
    n_points: int = 400_000,
    track_length: int = 10,
    rho: float = 2.0,
    object_radius: float = 0.4,
    focal: float = 1000.0,
    image_size: tuple = (1600, 1200),
    pixel_noise: float = 1.0,
    point_noise: float = 0.02,
    seed: int = 0,
    chunk_obs: int = None,
    dtype=None,
):
    """Device-side synthetic problem directly in the TILE layout.

    Same turntable-rig geometry as :func:`make_grid_rig_device`, but each
    point observes exactly ``track_length`` randomly chosen cells, laid out
    as ONE dense (N, W) tile bucket with W = next_pow2(track_length) — the
    sparse-visibility benchmark configuration with zero masked overcompute
    in the engine (every stored slot below W=track is live). Only tiny
    camera tables cross the host->device boundary.

    Returns (params_t: BAParams (rows == points, no permutation needed),
    tiles: TileIndex, gt_points, cam_free (C,)).
    """
    import jax
    import jax.numpy as jnp

    from deeparc_tpu.scene import BAParams
    from deeparc_tpu.solver.tiles import (
        CHUNK_OBS, CellTable, TileBucket, TileIndex, pack_cells,
        rows_per_chunk, _project_chunk, _unpack, _onehot,
    )
    from deeparc_tpu.solver.rig_grid import slot_params

    dtype = dtype or jnp.float32
    chunk_obs = chunk_obs or CHUNK_OBS
    host = make_hemisphere_rig(
        n_arc=n_arc, n_ring=n_ring, n_points=8, rho=rho,
        object_radius=object_radius, focal=focal, image_size=image_size,
        seed=seed,
    )
    d = host.data
    identity_pad = np.zeros((1, 3))
    W = 1 << int(np.ceil(np.log2(max(track_length, 1))))
    rpc = rows_per_chunk(W, chunk_obs)
    N_pad = -(-n_points // rpc) * rpc

    params_gt = BAParams(
        points=jnp.zeros((N_pad, 3), dtype),
        ext_rot=jnp.asarray(np.concatenate([d.ext_rot, identity_pad]), dtype),
        ext_trans=jnp.asarray(
            np.concatenate([d.ext_trans, identity_pad]), dtype),
        center=jnp.asarray(d.center, dtype),
        focal=jnp.asarray(d.focal, dtype),
        dist=jnp.asarray(d.dist, dtype),
    )

    # rig cells == all (arc, ring) pairs, reference slot rules
    T = n_arc * n_ring
    arc = np.repeat(np.arange(n_arc), n_ring)
    ring = np.tile(np.arange(n_ring), n_arc)
    ring_rec = np.where(ring == 0, 0, ring + n_arc - 1)
    identity = d.n_extrinsics
    outer = np.where(ring == 0, arc, np.where(arc == 0, ring_rec, arc))
    inner = np.where((ring == 0) | (arc == 0), identity, ring_rec)
    intr = arc
    R_rows = identity + 1
    six = np.arange(6)
    cols = np.concatenate(
        [outer[:, None] * 6 + six, inner[:, None] * 6 + six,
         6 * R_rows + intr[:, None] * 6 + six], axis=1).astype(np.int32)
    cells = CellTable(
        slot_outer=jnp.asarray(outer, jnp.int32),
        slot_inner=jnp.asarray(inner, jnp.int32),
        slot_intr=jnp.asarray(intr, jnp.int32),
        focal_shared=jnp.asarray((d.focal_size == 1)[intr], dtype),
        dist_m1=jnp.asarray((d.dist_size >= 1)[intr], dtype),
        dist_m2=jnp.asarray((d.dist_size == 2)[intr], dtype),
        cols=jnp.asarray(cols, jnp.int32),
    )
    C = 6 * R_rows + 6 * d.n_intrinsics
    cam_free = jnp.ones((C,), dtype)
    sp = slot_params(params_gt, cells)
    packed = pack_cells(sp, cells, cam_free)

    @jax.jit
    def synthesize(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        direction = jax.random.normal(k1, (N_pad, 3), dtype)
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction, axis=1, keepdims=True), 1e-9)
        radii = object_radius * jnp.cbrt(
            jax.random.uniform(k2, (N_pad, 1), dtype))
        gt_points = jnp.asarray([0.0, 0.0, rho], dtype) + direction * radii

        # each point sees `track_length` distinct random cells
        scores = jax.random.uniform(k3, (N_pad, T))
        _, cell_ids = jax.lax.top_k(scores, track_length)
        cell = jnp.zeros((N_pad, W), jnp.int32)
        cell = cell.at[:, :track_length].set(cell_ids.astype(jnp.int32))
        mask = jnp.zeros((N_pad, W), dtype)
        mask = mask.at[:, :track_length].set(1.0)

        # project through the tile engine's own chunk kernel
        def chunk_fn(args):
            pts, cl, msk = args
            oh = _onehot(cl.reshape(-1), T, dtype)
            sl = jnp.dot(oh, packed, preferred_element_type=dtype)
            c = _unpack(sl, pts.shape[0], W)
            zeros = jnp.zeros_like(msk)
            pc = _project_chunk(pts, c, zeros, zeros, msk)
            return pc["r"]  # == prediction when xy == 0 (masked)

        nch = N_pad // rpc
        shaped = lambda a: a.reshape((nch, rpc) + a.shape[1:])
        pred = jax.lax.map(
            chunk_fn, (shaped(gt_points), shaped(cell), shaped(mask))
        ).reshape(N_pad, W, 2)
        xy = pred + pixel_noise * jax.random.normal(k4, pred.shape, dtype)
        xy = xy * mask[..., None]
        init_points = gt_points + point_noise * jax.random.normal(
            k5, gt_points.shape, dtype)
        return gt_points, init_points, xy[..., 0], xy[..., 1], mask, cell

    gt_points, init_points, xy0, xy1, mask, cell = synthesize(
        jax.random.PRNGKey(seed))
    # the generator's rows beyond n_points are real synthetic points too —
    # keep them live (N_pad is the effective problem size)
    #
    # rig visibility is uniform over ALL T cells (no locality to exploit),
    # but T itself is small — attach IDENTITY per-chunk tables (local id ==
    # global id, every chunk's table is the whole cell list) so the fused
    # Pallas linearize kernel (tile_linearize_local) engages on this
    # config too. Pad the table width to a sublane multiple; pad entries
    # are clamped to cell 0 (bucket_with_local's zero-fill convention) and
    # bin zero contributions (no slot carries a local id >= T).
    nch = N_pad // rpc
    t_pad8 = -(-T // 8) * 8
    ids = np.zeros(t_pad8, dtype=np.int32)
    ids[:T] = np.arange(T, dtype=np.int32)
    chunk_cells = jnp.asarray(np.tile(ids, (nch, 1)))
    bucket = TileBucket(cell=cell, xy0=xy0, xy1=xy1, mask=mask,
                        loc=(cell, chunk_cells))
    tiles = TileIndex(
        cells=cells, buckets=(bucket,),
        row_of_point=jnp.arange(N_pad, dtype=jnp.int32),
    )
    import dataclasses as _dc

    params = _dc.replace(params_gt, points=init_points)
    return params, tiles, gt_points, cam_free


def _bal_camera_tables(n_cameras, rho, focal, image_size, rng,
                       order_by_azimuth):
    """Host-side BAL camera tables: poses on a view sphere + intrinsics.

    Shared by the device-side BAL generators. ``order_by_azimuth`` sorts
    cameras along the sphere so consecutive ids are physically adjacent
    (windowed co-visibility is then geometric)."""
    ext_rot = np.zeros((n_cameras, 3))
    ext_trans = np.zeros((n_cameras, 3))
    dirs = rng.normal(size=(n_cameras, 3))
    dirs[:, 1] = np.clip(dirs[:, 1], -0.9, 0.9)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    if order_by_azimuth:
        dirs = dirs[np.argsort(np.arctan2(dirs[:, 2], dirs[:, 0]))]
    for c in range(n_cameras):
        R, t = _look_at(rho * dirs[c], np.zeros(3))
        ext_rot[c] = _rotmat_to_aa(R)
        ext_trans[c] = t
    cx, cy = image_size[0] / 2.0, image_size[1] / 2.0
    center = np.tile([cx, cy], (n_cameras, 1))
    focal_arr = np.zeros((n_cameras, 2))
    focal_arr[:, 0] = focal * (1.0 + 0.05 * rng.normal(size=n_cameras))
    dist_arr = np.zeros((n_cameras, 2))
    dist_arr[:, 0] = -0.02
    dist_arr[:, 1] = 0.005
    return ext_rot, ext_trans, center, focal_arr, dist_arr


def make_bal_tile_device(
    n_cameras: int = 2000,
    n_points: int = 1_000_000,
    track_length: int = 8,
    rho: float = 3.0,
    object_radius: float = 1.0,
    focal: float = 800.0,
    image_size: tuple = (1024, 1024),
    pixel_noise: float = 1.0,
    point_noise: float = 0.02,
    seed: int = 0,
    chunk_obs: int = None,
    dtype=None,
    window: int | None = 128,
):
    """Device-side BAL-style (non-shared) problem directly in TILE layout.

    The at-scale config-5 shape: ``n_cameras`` free cameras on a view
    sphere (one intrinsic + one extrinsic each, the reference's non-shared
    mode), every point observing ``track_length`` cameras. One dense
    (N, W) tile bucket, W = next_pow2(track_length); cells == cameras.
    Only the (C, .) camera tables cross the host->device boundary.

    ``window`` (default 128) models real BAL co-visibility locality:
    cameras are ordered by azimuth and each chunk of points draws its
    tracks from one sliding window of ``window`` consecutive cameras, so
    the bucket carries exact locality blocking (TileBucket.loc) by
    construction — the structure venice/final-class scenes have and the
    tile engine's local tables exploit. ``window=None`` reproduces the
    round-2 uniform-random graph (no locality; global tables).

    Returns (params_t, tiles, gt_points, cam_free).
    """
    import jax
    import jax.numpy as jnp

    from deeparc_tpu.scene import BAParams
    from deeparc_tpu.solver.rig_grid import slot_params
    from deeparc_tpu.solver.tiles import (
        CHUNK_OBS, CellTable, TileBucket, TileIndex, pack_cells,
        rows_per_chunk, _onehot, _project_chunk, _unpack,
    )

    dtype = dtype or jnp.float32
    chunk_obs = chunk_obs or CHUNK_OBS
    rng = np.random.default_rng(seed)

    # host: camera poses on the view sphere (tiny tables)
    if window is not None:
        window = min(window, n_cameras)
    ext_rot, ext_trans, center, focal_arr, dist_arr = _bal_camera_tables(
        n_cameras, rho, focal, image_size, rng,
        order_by_azimuth=window is not None)

    W = 1 << int(np.ceil(np.log2(max(track_length, 1))))
    rpc = rows_per_chunk(W, chunk_obs)
    N_pad = -(-n_points // rpc) * rpc
    identity = n_cameras
    R_rows = n_cameras + 1

    params_gt = BAParams(
        points=jnp.zeros((N_pad, 3), dtype),
        ext_rot=jnp.asarray(
            np.concatenate([ext_rot, np.zeros((1, 3))]), dtype),
        ext_trans=jnp.asarray(
            np.concatenate([ext_trans, np.zeros((1, 3))]), dtype),
        center=jnp.asarray(center, dtype),
        focal=jnp.asarray(focal_arr, dtype),
        dist=jnp.asarray(dist_arr, dtype),
    )
    cam_ids = np.arange(n_cameras)
    six = np.arange(6)
    cols = np.concatenate(
        [cam_ids[:, None] * 6 + six,
         np.full((n_cameras, 1), identity) * 6 + six,
         6 * R_rows + cam_ids[:, None] * 6 + six], axis=1).astype(np.int32)
    cells = CellTable(
        slot_outer=jnp.asarray(cam_ids, jnp.int32),
        slot_inner=jnp.full((n_cameras,), identity, jnp.int32),
        slot_intr=jnp.asarray(cam_ids, jnp.int32),
        focal_shared=jnp.ones((n_cameras,), dtype),
        dist_m1=jnp.ones((n_cameras,), dtype),
        dist_m2=jnp.ones((n_cameras,), dtype),
        cols=jnp.asarray(cols, jnp.int32),
    )
    C = 6 * R_rows + 6 * n_cameras
    cam_free = jnp.ones((C,), dtype)
    sp = slot_params(params_gt, cells)
    packed = pack_cells(sp, cells, cam_free)
    V = n_cameras

    nch = N_pad // rpc
    if window is not None:
        # sliding co-visibility windows: chunk c's tracks live in cameras
        # [starts[c], starts[c] + window) — exact loc tables by construction
        starts_np = (np.arange(nch) * max(n_cameras - window, 0)
                     // max(nch - 1, 1)).astype(np.int32)
        chunk_cells = jnp.asarray(
            starts_np[:, None] + np.arange(window, dtype=np.int32)[None, :])
        starts_dev = jnp.asarray(starts_np)
    else:
        chunk_cells = None
        starts_dev = None

    @jax.jit
    def synthesize(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        direction = jax.random.normal(k1, (N_pad, 3), dtype)
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction, axis=1, keepdims=True), 1e-9)
        radii = object_radius * jnp.cbrt(
            jax.random.uniform(k2, (N_pad, 1), dtype))
        gt_points = direction * radii

        # track_length distinct cameras per point (window-local or uniform)
        hi = window if window is not None else n_cameras
        cell = jax.random.randint(k3, (N_pad, W), 0, hi, jnp.int32)
        # resolve duplicates within a row cheaply: offset repeats
        sort = jnp.sort(cell, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((N_pad, 1), bool), sort[:, 1:] == sort[:, :-1]],
            axis=1)
        local = (sort + jnp.cumsum(dup, axis=1)) % hi
        if window is not None:
            row_start = jnp.repeat(starts_dev, rpc)
            cell = local + row_start[:, None]
        else:
            cell = local
        mask = jnp.zeros((N_pad, W), dtype)
        mask = mask.at[:, :track_length].set(1.0)

        def chunk_fn(args):
            pts, cl, msk = args[:3]
            if window is not None:
                oh = _onehot(cl.reshape(-1), window, dtype)
                table = packed[args[3]]
            else:
                oh = _onehot(cl.reshape(-1), V, dtype)
                table = packed
            sl = jnp.dot(oh, table, preferred_element_type=dtype)
            c = _unpack(sl, pts.shape[0], W)
            zeros = jnp.zeros_like(msk)
            return _project_chunk(pts, c, zeros, zeros, msk)["r"]

        shaped = lambda a: a.reshape((nch, rpc) + a.shape[1:])
        plane = local if window is not None else cell
        margs = (shaped(gt_points), shaped(plane), shaped(mask))
        if window is not None:
            margs = margs + (chunk_cells,)
        pred = jax.lax.map(chunk_fn, margs).reshape(N_pad, W, 2)
        xy = pred + pixel_noise * jax.random.normal(k4, pred.shape, dtype)
        xy = xy * mask[..., None]
        init_points = gt_points + point_noise * jax.random.normal(
            k5, gt_points.shape, dtype)
        return (gt_points, init_points, xy[..., 0], xy[..., 1], mask, cell,
                local)

    gt_points, init_points, xy0, xy1, mask, cell, local = synthesize(
        jax.random.PRNGKey(seed))
    loc = (local, chunk_cells) if window is not None else ()
    bucket = TileBucket(cell=cell, xy0=xy0, xy1=xy1, mask=mask, loc=loc)
    tiles = TileIndex(
        cells=cells, buckets=(bucket,),
        row_of_point=jnp.arange(N_pad, dtype=jnp.int32),
    )
    import dataclasses as _dc

    params = _dc.replace(params_gt, points=init_points)
    return params, tiles, gt_points, cam_free


def make_bal_heavytail_device(
    n_cameras: int = 2000,
    n_points: int = 1_000_000,
    mean_track: float = 8.0,
    sigma: float = 0.8,
    max_track: int = 512,
    rho: float = 3.0,
    object_radius: float = 1.0,
    focal: float = 800.0,
    image_size: tuple = (1024, 1024),
    pixel_noise: float = 1.0,
    point_noise: float = 0.02,
    seed: int = 0,
    chunk_obs: int = None,
    dtype=None,
    window: int = 128,
):
    """Device-side BAL problem with a HEAVY-TAILED track distribution.

    Real venice/final-class BAL scenes do not have uniform track lengths:
    track counts follow a roughly log-normal law from 2 up to hundreds
    (one ``ParameterBlock`` per observation, any length —
    ``src/ParameterBlock.hh:30-58``). This generator draws per-point track
    lengths from a clipped log-normal with the given ``mean_track`` and
    log-``sigma``, then lays points out in MULTIPLE width buckets
    (W = next_pow2(track)), exactly the structure ``tiles_from_scene``
    builds from real files — so the mixed fused/XLA per-bucket engine path
    is exercised at scale, including W > MAX_KERNEL_WIDTH tail buckets.

    Track locality: points with track <= ``window`` draw cameras from a
    sliding window of ``window`` consecutive ids (chunk-exact locality
    tables, like :func:`make_bal_tile_device`); wider tracks draw from a
    window of 2*W (long tracks are genuinely seen from everywhere — those
    buckets carry no locality blocking and use the global-table path).

    Returns (params_t, tiles, gt_points, cam_free).
    """
    import jax
    import jax.numpy as jnp

    from deeparc_tpu.scene import BAParams
    from deeparc_tpu.solver.rig_grid import slot_params
    from deeparc_tpu.solver.tiles import (
        CHUNK_OBS, CellTable, TileBucket, TileIndex, pack_cells,
        rows_per_chunk, _onehot, _project_chunk, _unpack,
    )

    dtype = dtype or jnp.float32
    chunk_obs = chunk_obs or CHUNK_OBS
    rng = np.random.default_rng(seed)
    window = min(window, n_cameras)

    ext_rot, ext_trans, center, focal_arr, dist_arr = _bal_camera_tables(
        n_cameras, rho, focal, image_size, rng, order_by_azimuth=True)

    # clipped log-normal track lengths with the requested mean
    mu = np.log(mean_track) - 0.5 * sigma * sigma
    track = np.clip(
        np.rint(rng.lognormal(mu, sigma, size=n_points)).astype(np.int64),
        2, min(max_track, n_cameras))
    width = (1 << np.ceil(np.log2(track)).astype(np.int64)).clip(4)

    identity = n_cameras
    R_rows = n_cameras + 1
    cam_ids = np.arange(n_cameras)
    six = np.arange(6)
    cols = np.concatenate(
        [cam_ids[:, None] * 6 + six,
         np.full((n_cameras, 1), identity) * 6 + six,
         6 * R_rows + cam_ids[:, None] * 6 + six], axis=1).astype(np.int32)
    cells = CellTable(
        slot_outer=jnp.asarray(cam_ids, jnp.int32),
        slot_inner=jnp.full((n_cameras,), identity, jnp.int32),
        slot_intr=jnp.asarray(cam_ids, jnp.int32),
        focal_shared=jnp.ones((n_cameras,), dtype),
        dist_m1=jnp.ones((n_cameras,), dtype),
        dist_m2=jnp.ones((n_cameras,), dtype),
        cols=jnp.asarray(cols, jnp.int32),
    )
    C = 6 * R_rows + 6 * n_cameras
    cam_free = jnp.ones((C,), dtype)

    params_proto = BAParams(
        points=jnp.zeros((1, 3), dtype),
        ext_rot=jnp.asarray(
            np.concatenate([ext_rot, np.zeros((1, 3))]), dtype),
        ext_trans=jnp.asarray(
            np.concatenate([ext_trans, np.zeros((1, 3))]), dtype),
        center=jnp.asarray(center, dtype),
        focal=jnp.asarray(focal_arr, dtype),
        dist=jnp.asarray(dist_arr, dtype),
    )
    sp = slot_params(params_proto, cells)
    packed = pack_cells(sp, cells, cam_free)

    def synth_bucket(key, Nb_pad, W, win, tracks_b):
        """One (Nb_pad, W) bucket, window win; tracks_b (Nb_pad,) live len."""
        win_loc = win < n_cameras
        n_ch = Nb_pad // rows_per_chunk(W, chunk_obs)
        rpc = Nb_pad // n_ch
        starts_np = (np.arange(n_ch) * max(n_cameras - win, 0)
                     // max(n_ch - 1, 1)).astype(np.int32)
        chunk_cells = (starts_np[:, None]
                       + np.arange(win, dtype=np.int32)[None, :])
        starts_dev = jnp.asarray(starts_np)
        tr = jnp.asarray(tracks_b)

        @jax.jit
        def synth(key):
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            direction = jax.random.normal(k1, (Nb_pad, 3), dtype)
            direction = direction / jnp.maximum(
                jnp.linalg.norm(direction, axis=1, keepdims=True), 1e-9)
            radii = object_radius * jnp.cbrt(
                jax.random.uniform(k2, (Nb_pad, 1), dtype))
            gt = direction * radii
            # W DISTINCT window-local camera ids per row: draw sorted values
            # from [0, win-W] and add the rank — strictly increasing, so no
            # duplicate (point, camera) slots can double-count an
            # observation (the old cumsum-shift dedup could wrap onto an
            # existing id)
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (Nb_pad, W), 1)
            if win > W:
                cell = jax.random.randint(
                    k3, (Nb_pad, W), 0, win - W + 1, jnp.int32)
                local = jnp.sort(cell, axis=1) + iota_w
            else:
                local = iota_w
            row_start = jnp.repeat(starts_dev, rpc)
            cell_g = local + row_start[:, None]
            mask = (jax.lax.broadcasted_iota(jnp.int32, (Nb_pad, W), 1)
                    < tr[:, None]).astype(dtype)

            def chunk_fn(args):
                pts, cl, msk, cc = args
                oh = _onehot(cl.reshape(-1), win, dtype)
                sl = jnp.dot(oh, packed[cc], preferred_element_type=dtype)
                c = _unpack(sl, pts.shape[0], W)
                zeros = jnp.zeros_like(msk)
                return _project_chunk(pts, c, zeros, zeros, msk)["r"]

            shaped = lambda a: a.reshape((n_ch, rpc) + a.shape[1:])
            pred = jax.lax.map(
                chunk_fn,
                (shaped(gt), shaped(local), shaped(mask), chunk_cells),
            ).reshape(Nb_pad, W, 2)
            xy = pred + pixel_noise * jax.random.normal(k4, pred.shape,
                                                        dtype)
            xy = xy * mask[..., None]
            init = gt + point_noise * jax.random.normal(k5, gt.shape, dtype)
            return gt, init, xy[..., 0], xy[..., 1], mask, cell_g, local

        gt, init, xy0, xy1, mask, cell_g, local = synth(key)
        loc = ((local, jnp.asarray(chunk_cells)) if win_loc else ())
        return gt, init, TileBucket(cell=cell_g, xy0=xy0, xy1=xy1, mask=mask,
                                    loc=loc)

    widths = sorted(int(w) for w in np.unique(width))
    row_of_point = np.zeros(n_points, np.int64)
    gt_parts, init_parts, buckets = [], [], []
    offset = 0
    key = jax.random.PRNGKey(seed)
    for i, W in enumerate(widths):
        members = np.nonzero(width == W)[0]
        Nb = members.size
        rpc = rows_per_chunk(W, chunk_obs)
        Nb_pad = -(-Nb // rpc) * rpc
        win = window if W <= window else min(2 * W, n_cameras)
        tracks_b = np.zeros(Nb_pad, np.int64)
        tracks_b[:Nb] = track[members]
        gt, init, bucket = synth_bucket(
            jax.random.fold_in(key, i), Nb_pad, W, win, tracks_b)
        row_of_point[members] = offset + np.arange(Nb)
        gt_parts.append(gt)
        init_parts.append(init)
        buckets.append(bucket)
        offset += Nb_pad

    tiles = TileIndex(
        cells=cells, buckets=tuple(buckets),
        row_of_point=jnp.asarray(row_of_point, jnp.int32),
    )
    import dataclasses as _dc

    gt_points = jnp.concatenate(gt_parts)
    params = _dc.replace(params_proto, points=jnp.concatenate(init_parts))
    return params, tiles, gt_points, cam_free


def make_bal_windowed_host(
    n_cameras: int = 2000,
    n_points: int = 250_000,
    track_length: int = 8,
    window: int = 128,
    n_hubs: int = 8,
    hub_frac: float = 0.15,
    rho: float = 3.0,
    object_radius: float = 1.0,
    focal: float = 800.0,
    pixel_noise: float = 1.0,
    point_noise: float = 0.02,
    shuffle_ids: bool = True,
    seed: int = 0,
):
    """Host-side windowed BAL scene with HUB contamination and shuffled
    camera ids — the graph shape that exercises the tile engine's
    hub-robust locality ordering (solver/tiles._locality_cell_order).

    Cameras sit on a ring around the object (a capture path); each point
    is seen by ``track_length`` cameras from a contiguous latent window,
    except that with probability ``hub_frac`` an observation is replaced
    by one of ``n_hubs`` elevated hub cameras that see everything (the
    popular-view contamination of real photo collections). Camera ids are
    then shuffled so no input ordering survives; only the co-visibility
    structure remains for tiles_from_scene to find. Returns a
    :class:`deeparc_tpu.io.deeparc_format.DeepArcData` (non-shared mode,
    ``src/ParameterBlock.hh:52-55`` wiring).
    """
    from deeparc_tpu.io.deeparc_format import DeepArcData

    rng = np.random.default_rng(seed)
    n_win = n_cameras - n_hubs

    # ring cameras + elevated hubs, all looking at the origin
    ext_rot = np.zeros((n_cameras, 3))
    ext_trans = np.zeros((n_cameras, 3))
    az = 2.0 * np.pi * np.arange(n_win) / n_win
    pos = np.stack([rho * np.cos(az), 0.25 * rho * np.ones(n_win),
                    rho * np.sin(az)], axis=1)
    az_h = 2.0 * np.pi * np.arange(max(n_hubs, 1)) / max(n_hubs, 1)
    pos_h = np.stack([0.6 * rho * np.cos(az_h),
                      1.1 * rho * np.ones(max(n_hubs, 1)),
                      0.6 * rho * np.sin(az_h)], axis=1)[:n_hubs]
    for c, p in enumerate(np.concatenate([pos, pos_h])):
        R, t = _look_at(p, np.zeros(3))
        ext_rot[c] = _rotmat_to_aa(R)
        ext_trans[c] = t

    pts = rng.normal(size=(n_points, 3))
    pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    gt = pts * object_radius * np.cbrt(rng.uniform(size=(n_points, 1)))

    # latent window start per point (progressive around the ring), with
    # W distinct window picks via the sorted-draw + rank-offset trick
    W = track_length
    starts = (np.arange(n_points, dtype=np.int64) * n_win) // n_points
    draw = rng.integers(0, window - W + 1, size=(n_points, W))
    local = np.sort(draw, axis=1) + np.arange(W)[None, :]
    cams = (starts[:, None] + local) % n_win
    # hub substitution
    hub_pick = rng.random((n_points, W)) < hub_frac
    if n_hubs:
        hub_ids = n_win + rng.integers(0, n_hubs, size=(n_points, W))
        cams = np.where(hub_pick, hub_ids, cams)

    obs_point = np.repeat(np.arange(n_points, dtype=np.int64), W)
    obs_cam = cams.reshape(-1)

    # project (vectorized per observation)
    from scipy.spatial.transform import Rotation

    R_all = Rotation.from_rotvec(ext_rot).as_matrix()
    p_cam = (np.einsum("mij,mj->mi", R_all[obs_cam], gt[obs_point])
             + ext_trans[obs_cam])
    z = np.maximum(p_cam[:, 2], 0.2)
    uv = focal * p_cam[:, :2] / z[:, None] + 512.0
    uv += pixel_noise * rng.normal(size=uv.shape)

    if shuffle_ids:
        # old camera o gets new id inv[o]; camera arrays re-indexed so the
        # new id slots hold the right parameters (new row n = old shuffle[n])
        shuffle = rng.permutation(n_cameras)
        inv = np.empty(n_cameras, np.int64)
        inv[shuffle] = np.arange(n_cameras)
        obs_cam = inv[obs_cam]
        ext_rot = ext_rot[shuffle]
        ext_trans = ext_trans[shuffle]
    obs_cam = obs_cam.astype(np.int32)

    init_pts = gt + point_noise * rng.normal(size=gt.shape)
    return DeepArcData(
        version=0.01, share_extrinsic=False,
        arc_size=n_cameras, ring_size=0,
        obs_arc=obs_cam, obs_ring=obs_cam.copy(),
        obs_point=obs_point.astype(np.int32),
        obs_xy=uv,
        center=np.tile([512.0, 512.0], (n_cameras, 1)),
        focal=np.concatenate(
            [np.full((n_cameras, 1), focal), np.zeros((n_cameras, 1))],
            axis=1),
        focal_size=np.ones(n_cameras, dtype=np.int32),
        dist=np.zeros((n_cameras, 2)),
        dist_size=np.zeros(n_cameras, dtype=np.int32),
        ext_rot=ext_rot, ext_trans=ext_trans,
        points=init_pts,
        colors=rng.integers(0, 256, size=(n_points, 3)).astype(np.int32),
    )
