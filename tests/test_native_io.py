"""Native C++ parser vs the pure-numpy parsers: exact agreement."""

import numpy as np
import pytest

from deeparc_tpu.io import make_hemisphere_rig, read_deeparc, write_deeparc
from deeparc_tpu.io.native import (
    native_available,
    read_bal_native,
    read_deeparc_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_native_deeparc_matches_numpy(tmp_path):
    rig = make_hemisphere_rig(
        n_arc=3, n_ring=5, n_points=80, pixel_noise=0.3, focal_size=2,
        dist_size=2, seed=9,
    )
    path = str(tmp_path / "rig.deeparc")
    write_deeparc(rig.data, path)
    a = read_deeparc(path)
    b = read_deeparc_native(path)
    assert a.share_extrinsic == b.share_extrinsic
    assert a.arc_size == b.arc_size and a.ring_size == b.ring_size
    for field in ("obs_arc", "obs_ring", "obs_point", "colors",
                  "focal_size", "dist_size"):
        np.testing.assert_array_equal(getattr(a, field), getattr(b, field))
    for field in ("obs_xy", "center", "focal", "dist", "ext_rot",
                  "ext_trans", "points"):
        np.testing.assert_allclose(
            getattr(a, field), getattr(b, field), atol=1e-12
        )


def test_native_quat_matrix_rotations(tmp_path):
    from scipy.spatial.transform import Rotation as R

    aa = np.array([0.3, -0.2, 0.5])
    theta = np.linalg.norm(aa)
    q = np.concatenate([[np.cos(theta / 2)], np.sin(theta / 2) * aa / theta])
    colmajor = R.from_rotvec(aa).as_matrix().reshape(9, order="F")
    content = (
        "0.01\n1 1 2 0 1\n0 0 0 5.0 6.0\n100.0 100.0 1 500.0 0\n"
        "1 2 3 4 " + " ".join(map(str, q)) + "\n"
        "1 2 3 9 " + " ".join(map(str, colmajor)) + "\n"
        "0.5 0.5 0.5 255 0 0\n"
    )
    p = tmp_path / "conv.deeparc"
    p.write_text(content)
    data = read_deeparc_native(str(p))
    np.testing.assert_allclose(data.ext_rot[0], aa, atol=1e-9)
    np.testing.assert_allclose(data.ext_rot[1], aa, atol=1e-9)


def test_native_bal_matches_numpy(tmp_path):
    from deeparc_tpu.io import read_bal

    content = (
        "2 2 3\n"
        "0 0 1.0 2.0\n1 0 -1.0 0.5\n1 1 0.25 -0.75\n"
        + " ".join(map(str, [0.1, 0.2, 0.3, 1, 2, 3, 800, -0.01, 0.002])) + "\n"
        + " ".join(map(str, [0, 0, 0, 0, 0, 10, 900, 0.0, 0.0])) + "\n"
        + "1 2 3\n4 5 6\n"
    )
    p = tmp_path / "prob.bal"
    p.write_text(content)
    a = read_bal(str(p))
    b = read_bal_native(str(p))
    for field in ("obs_arc", "obs_ring", "obs_point", "focal_size", "dist_size"):
        np.testing.assert_array_equal(getattr(a, field), getattr(b, field))
    for field in ("obs_xy", "focal", "dist", "ext_rot", "ext_trans", "points"):
        np.testing.assert_allclose(getattr(a, field), getattr(b, field))


def test_native_error_on_truncated(tmp_path):
    p = tmp_path / "bad.deeparc"
    p.write_text("0.01\n5 1 1 0 1\n0 0 0 1.0")
    with pytest.raises(ValueError, match="truncated"):
        read_deeparc_native(str(p))
