"""Round-trip and spec tests for the .deeparc parser/writer, PLY, BAL."""

import numpy as np
import pytest

from deeparc_tpu.io import (
    make_hemisphere_rig,
    read_bal,
    read_deeparc,
    write_deeparc,
    write_ply,
)


@pytest.fixture
def rig():
    return make_hemisphere_rig(n_arc=3, n_ring=4, n_points=40, seed=1)


def test_roundtrip_shared(tmp_path, rig):
    path = str(tmp_path / "rig.deeparc")
    write_deeparc(rig.data, path)
    back = read_deeparc(path)
    assert back.share_extrinsic
    assert back.arc_size == rig.data.arc_size
    assert back.ring_size == rig.data.ring_size
    assert back.n_obs == rig.data.n_obs
    np.testing.assert_array_equal(back.obs_arc, rig.data.obs_arc)
    np.testing.assert_array_equal(back.obs_ring, rig.data.obs_ring)
    np.testing.assert_array_equal(back.obs_point, rig.data.obs_point)
    np.testing.assert_allclose(back.obs_xy, rig.data.obs_xy, atol=1e-6)
    np.testing.assert_allclose(back.ext_rot, rig.data.ext_rot, atol=1e-6)
    np.testing.assert_allclose(back.ext_trans, rig.data.ext_trans, atol=1e-6)
    np.testing.assert_allclose(back.points, rig.data.points, atol=1e-6)
    np.testing.assert_array_equal(back.colors, rig.data.colors)
    np.testing.assert_array_equal(back.focal_size, rig.data.focal_size)
    np.testing.assert_array_equal(back.dist_size, rig.data.dist_size)


def test_extrinsic_count_shared(rig):
    # shared: records = n_arc + n_ring - 1 (DeepArcManager.cc:43-44)
    assert rig.data.n_extrinsics == rig.data.arc_size + rig.data.ring_size - 1


def test_ring_record_index(rig):
    # ring 0 -> record 0; ring r -> r + n_arc - 1 (DeepArcManager.cc:166-171)
    idx = rig.data.ring_record_index(np.array([0, 1, 2]))
    A = rig.data.arc_size
    np.testing.assert_array_equal(idx, [0, A, A + 1])


def test_quaternion_and_matrix_rotations_parse(tmp_path):
    """n_rot = 4 (quaternion) and 9 (column-major matrix) convert to angle-axis."""
    aa = np.array([0.3, -0.2, 0.5])
    theta = np.linalg.norm(aa)
    axis = aa / theta
    q = np.concatenate([[np.cos(theta / 2)], np.sin(theta / 2) * axis])
    from scipy.spatial.transform import Rotation as R

    Rm = R.from_rotvec(aa).as_matrix()
    colmajor = Rm.reshape(9, order="F")
    content = (
        "0.01\n"
        "1 1 3 0 1\n"          # 1 obs, 1 intrinsic, 3 extrinsics, non-shared, 1 pt
        "0 0 0 5.0 6.0\n"      # obs
        "100.0 100.0 1 500.0 0\n"  # intrinsic
        "1 2 3 3 " + " ".join(f"{v}" for v in aa) + "\n"
        "1 2 3 4 " + " ".join(f"{v}" for v in q) + "\n"
        "1 2 3 9 " + " ".join(f"{v}" for v in colmajor) + "\n"
        "0.5 0.5 0.5 255 0 0\n"
    )
    p = tmp_path / "conv.deeparc"
    p.write_text(content)
    data = read_deeparc(str(p))
    assert not data.share_extrinsic
    np.testing.assert_allclose(data.ext_rot[0], aa, atol=1e-12)
    np.testing.assert_allclose(data.ext_rot[1], aa, atol=1e-9)
    np.testing.assert_allclose(data.ext_rot[2], aa, atol=1e-9)


def test_parity_truncate_center(tmp_path):
    content = (
        "0.01\n"
        "1 1 1 0 1\n"
        "0 0 0 5.0 6.0\n"
        "923.5 1223.5 1 500.0 0\n"
        "0 0 0 3 0 0 0\n"
        "0.5 0.5 0.5 255 0 0\n"
    )
    p = tmp_path / "trunc.deeparc"
    p.write_text(content)
    sane = read_deeparc(str(p))
    np.testing.assert_allclose(sane.center[0], [923.5, 1223.5])
    parity = read_deeparc(str(p), parity_truncate_center=True)
    # reproduces src/Camera/Intrinsic.hh:24 int truncation
    np.testing.assert_allclose(parity.center[0], [923.0, 1223.0])


def test_ply_writer(tmp_path, rig):
    path = str(tmp_path / "out.ply")
    centers = np.zeros((5, 3))
    composed = np.array([False, False, True, True, False])
    write_ply(path, rig.data.points, rig.data.colors, centers, composed)
    lines = open(path).read().strip().split("\n")
    assert lines[0] == "ply"
    n_vertex = rig.data.n_points + 5
    assert f"element vertex {n_vertex}" in lines
    body = lines[lines.index("end_header") + 1:]
    assert len(body) == n_vertex
    assert body[0].endswith("0 255 0")      # green single camera
    assert body[2].endswith("255 0 255")    # magenta composed camera


def test_bal_reader(tmp_path):
    content = (
        "2 2 3\n"
        "0 0 1.0 2.0\n"
        "1 0 -1.0 0.5\n"
        "1 1 0.25 -0.75\n"
        + " ".join(str(v) for v in [0.1, 0.2, 0.3, 1, 2, 3, 800, -0.01, 0.002]) + "\n"
        + " ".join(str(v) for v in [0, 0, 0, 0, 0, 10, 900, 0.0, 0.0]) + "\n"
        + "1 2 3\n4 5 6\n"
    )
    p = tmp_path / "prob.bal"
    p.write_text(content)
    data = read_bal(str(p))
    assert not data.share_extrinsic
    assert data.n_obs == 3
    assert data.n_points == 2
    assert data.n_extrinsics == 2
    assert data.n_intrinsics == 2
    # focal sign fold (BAL negative-z convention)
    np.testing.assert_allclose(data.focal[:, 0], [-800, -900])
    np.testing.assert_array_equal(data.dist_size, [2, 2])
    np.testing.assert_allclose(data.points, [[1, 2, 3], [4, 5, 6]])


def test_synthetic_observation_consistency(rig):
    """Every point has a track of length >= 2 and indices are in range."""
    data = rig.data
    counts = np.bincount(data.obs_point, minlength=data.n_points)
    assert (counts >= 2).all()
    assert data.obs_arc.max() < data.arc_size
    assert data.obs_ring.max() < data.ring_size
