"""Unit tests for geometry.rotation vs scipy and finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from deeparc_tpu.geometry import (
    angle_axis_rotate,
    angle_axis_to_matrix,
    matrix_to_angle_axis,
    quaternion_to_angle_axis,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_rotate_matches_scipy(rng):
    aa = rng.normal(size=(32, 3))
    p = rng.normal(size=(32, 3))
    got = np.asarray(angle_axis_rotate(jnp.asarray(aa), jnp.asarray(p)))
    want = R.from_rotvec(aa).apply(p)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotate_zero_angle(rng):
    p = rng.normal(size=(4, 3))
    got = angle_axis_rotate(jnp.zeros((4, 3)), jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(got), p, atol=1e-15)


def test_rotate_grad_finite_at_zero():
    """Gradients through the theta -> 0 singularity must be finite."""
    p = jnp.array([1.0, 2.0, 3.0])
    g = jax.jacfwd(lambda aa: angle_axis_rotate(aa, p))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    # d(rotate)/d(aa) at aa=0: column j = e_j x p, i.e. J = -[p]_x.
    px = np.array([[0, -3, 2], [3, 0, -1], [-2, 1, 0]], dtype=float)
    np.testing.assert_allclose(np.asarray(g), -px, atol=1e-9)


def test_matrix_consistency(rng):
    aa = rng.normal(size=(16, 3))
    p = rng.normal(size=(16, 3))
    Rm = angle_axis_to_matrix(jnp.asarray(aa))
    via_matrix = np.einsum("nij,nj->ni", np.asarray(Rm), p)
    direct = np.asarray(angle_axis_rotate(jnp.asarray(aa), jnp.asarray(p)))
    np.testing.assert_allclose(via_matrix, direct, atol=1e-12)
    want = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(np.asarray(Rm), want, atol=1e-12)


def test_matrix_roundtrip(rng):
    aa = rng.normal(size=(64, 3))
    # keep |theta| < pi for unique representation
    aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) * rng.uniform(
        0.01, 3.0, size=(64, 1)
    )
    Rm = angle_axis_to_matrix(jnp.asarray(aa))
    back = np.asarray(matrix_to_angle_axis(Rm))
    np.testing.assert_allclose(back, aa, atol=1e-9)


def test_matrix_roundtrip_near_pi(rng):
    axis = rng.normal(size=(8, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    aa = axis * (np.pi - 1e-4)
    Rm = angle_axis_to_matrix(jnp.asarray(aa))
    back = np.asarray(matrix_to_angle_axis(Rm))
    np.testing.assert_allclose(back, aa, atol=1e-6)


def test_quaternion_matches_scipy(rng):
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    got = np.asarray(quaternion_to_angle_axis(jnp.asarray(q)))
    # scipy uses (x, y, z, w) order
    want = R.from_quat(q[:, [1, 2, 3, 0]]).as_rotvec()
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_quaternion_identity():
    got = quaternion_to_angle_axis(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(got), np.zeros(3), atol=1e-15)
