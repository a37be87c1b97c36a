"""Golden-fixture tests: externally-authored ``.deeparc`` files, in-tree.

Every other fixture in this repo is produced by ``io/synthetic.py``; these
two files were written BY HAND (tests/fixtures/*.deeparc) to the reverse-
engineered format spec (``src/DeepArcManager.cc:26-164`` read, ``:426-499``
write) so the parsers/writer/pipeline are exercised against input this
codebase did not generate:

* ``golden_shared.deeparc`` — shared-rig mode, 2 arcs x 3 rings (4 extrinsic
  records via the arc0/ring0 shared slot, cc:43-44), fractional principal
  points (the reference's int-truncation quirk site, Intrinsic.hh:24),
  mixed focal arities (1 and 2), mixed distortion arities (1 and 2), and all
  three rotation arities: n_rot=4 quaternions (one with w<0 to hit the
  negative-w branch of QuaternionToAngleAxis), an n_rot=9 column-major
  rotation matrix (120 deg about (1,1,1)/sqrt(3)), and plain n_rot=3.
* ``golden_nonshared.deeparc`` — non-shared (BAL-style) wiring where the
  first two observation columns mean intrinsic_id/extrinsic_id
  (``src/ParameterBlock.hh:52-55``): 3 cameras at identity rotation (one
  written as n_rot=3, one as an identity quaternion, one as an identity
  matrix) and 6 points, with the 18 pixel observations computed by hand from
  u = f*(x+tx)/(z+tz) + cx so the file is geometrically exact: a full
  pipeline run must report ~zero RMSE.
"""

import os

import numpy as np
import pytest

from deeparc_tpu.config import FilterOptions, PipelineOptions, SolverOptions
from deeparc_tpu.io import read_deeparc, write_deeparc
from deeparc_tpu.residuals import cost, residuals
from deeparc_tpu.scene import from_deeparc

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
SHARED = os.path.join(FIXTURES, "golden_shared.deeparc")
NONSHARED = os.path.join(FIXTURES, "golden_nonshared.deeparc")


def test_golden_shared_parses_to_expected_values():
    d = read_deeparc(SHARED)
    assert d.share_extrinsic and d.arc_size == 2 and d.ring_size == 3
    assert d.n_extrinsics == 4  # n_arc + n_ring - 1 (DeepArcManager.cc:43-44)
    assert d.n_obs == 4 and d.n_points == 3 and d.n_intrinsics == 2

    # fractional principal points survive (no silent int truncation)
    np.testing.assert_allclose(d.center[0], [923.5, 540.25])
    np.testing.assert_allclose(d.center[1], [640.0, 360.5])
    assert list(d.focal_size) == [2, 1] and list(d.dist_size) == [2, 1]
    np.testing.assert_allclose(d.focal[0], [1200.5, 1210.75])
    np.testing.assert_allclose(d.dist[1], [0.005, 0.0])

    # rotation-arity conversions against scipy ground truth
    from scipy.spatial.transform import Rotation

    # record 0: quaternion (w,x,y,z)=(-s,s,0,0), negative-w branch;
    # same rotation as (s,-s,0,0) = -90 deg about x (scipy order: x,y,z,w)
    expect0 = Rotation.from_quat([0.70710678118654752, 0, 0,
                                  -0.70710678118654752]).as_rotvec()
    np.testing.assert_allclose(d.ext_rot[0], expect0, atol=1e-12)
    # record 1: +90 deg about z
    np.testing.assert_allclose(d.ext_rot[1], [0, 0, np.pi / 2], atol=1e-12)
    # record 2: column-major matrix for the cyclic permutation x->y->z->x
    # = 120 deg about (1,1,1)/sqrt(3)
    aa = (2 * np.pi / 3) / np.sqrt(3.0)
    np.testing.assert_allclose(d.ext_rot[2], [aa, aa, aa], atol=1e-12)
    # record 3: plain angle-axis stored as-is
    np.testing.assert_allclose(d.ext_rot[3], [0.1, -0.2, 0.3])
    np.testing.assert_allclose(d.ext_trans[2], [0.125, 0.375, -0.625])

    # ring-record mapping (DeepArcManager.cc:166-171)
    np.testing.assert_array_equal(
        d.ring_record_index(np.array([0, 1, 2])), [0, 2, 3]
    )

    # parity mode: the reference truncates fractional centers to int
    dq = read_deeparc(SHARED, parity_truncate_center=True)
    np.testing.assert_allclose(dq.center[0], [923.0, 540.0])


def test_golden_shared_parity_truncate_matches_reference_quirk():
    d = read_deeparc(SHARED)
    scene = from_deeparc(d)
    c = float(cost(scene.params, scene.index))
    assert np.isfinite(c)


@pytest.mark.parametrize("path", [SHARED, NONSHARED])
def test_golden_native_parser_matches_python(path):
    from deeparc_tpu.io.native import native_available, read_deeparc_native

    if not native_available():
        pytest.skip("native toolchain unavailable")
    py = read_deeparc(path)
    nat = read_deeparc_native(path)
    for field in ("obs_arc", "obs_ring", "obs_point", "obs_xy", "center",
                  "focal", "focal_size", "dist", "dist_size", "ext_rot",
                  "ext_trans", "points", "colors"):
        np.testing.assert_array_equal(
            getattr(py, field), getattr(nat, field), err_msg=field
        )
    assert py.share_extrinsic == nat.share_extrinsic
    assert py.arc_size == nat.arc_size and py.ring_size == nat.ring_size


@pytest.mark.parametrize("path", [SHARED, NONSHARED])
def test_golden_write_read_write_is_byte_stable(path, tmp_path):
    """write(read(x)) reaches the writer's canonical 6-decimal angle-axis
    form; a second round trip must be byte-identical (cc:426-499)."""
    d = read_deeparc(path)
    p1 = str(tmp_path / "once.deeparc")
    write_deeparc(d, p1)
    d2 = read_deeparc(p1)
    p2 = str(tmp_path / "twice.deeparc")
    write_deeparc(d2, p2)
    with open(p1, "rb") as f:
        b1 = f.read()
    with open(p2, "rb") as f:
        b2 = f.read()
    assert b1 == b2


def test_golden_nonshared_is_geometrically_exact():
    """The hand-computed observations reproject exactly (to the 6-decimal
    precision of the authored file)."""
    d = read_deeparc(NONSHARED)
    assert not d.share_extrinsic and d.n_extrinsics == 3
    scene = from_deeparc(d)
    r = np.asarray(residuals(scene.params, scene.index))
    assert np.abs(r).max() < 1e-9


def test_golden_nonshared_full_pipeline(tmp_path):
    """Full pipeline (hemisphere fit -> freeze solve -> filter loop -> write)
    on the hand-authored scene: converges at ~zero RMSE, removes nothing,
    and the refined output re-parses."""
    d = read_deeparc(NONSHARED)
    opts = PipelineOptions(
        solver=SolverOptions(max_iterations=10),
        # flat 3-camera layout, not a hemisphere: distance cut is meaningless
        filter=FilterOptions(hemisphere_cut=False),
    )
    from deeparc_tpu.pipeline import run_pipeline

    res = run_pipeline(d, opts, output_dir=str(tmp_path),
                       basename="golden", verbose=False)
    assert res.final_rmse_px < 1e-6
    assert res.scene.n_points == 6
    out = read_deeparc(str(tmp_path / "golden_output.deeparc"))
    assert out.n_points == 6 and out.n_obs == 18
