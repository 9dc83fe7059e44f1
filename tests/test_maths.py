"""Unit tests for batched rotation/quaternion/skew utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from biped_pympc_tpu.utils import maths


def test_rot_xyz_orthonormal():
    angles = jnp.linspace(-3.0, 3.0, 7)
    for fn in (maths.rot_x, maths.rot_y, maths.rot_z):
        r = fn(angles)
        assert r.shape == (7, 3, 3)
        eye = jnp.einsum("bij,bkj->bik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (7, 1, 1)), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-12)


def test_rot_z_convention():
    r = maths.rot_z(jnp.asarray(np.pi / 2))
    # +90deg about z maps x-hat to y-hat.
    np.testing.assert_allclose(r @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)


def test_quat_roundtrip_euler():
    rng = np.random.default_rng(0)
    rpy = rng.uniform(-1.2, 1.2, size=(32, 3))
    # Build quaternion from rpy via R = Rz Ry Rx and matrix->quat reference.
    r = (
        np.asarray(maths.rot_z(jnp.asarray(rpy[:, 2])))
        @ np.asarray(maths.rot_y(jnp.asarray(rpy[:, 1])))
        @ np.asarray(maths.rot_x(jnp.asarray(rpy[:, 0])))
    )
    quat = _mat_to_quat(r)
    np.testing.assert_allclose(
        np.asarray(maths.quat_to_rotmat(jnp.asarray(quat))), r, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(maths.quat_to_euler(jnp.asarray(quat))), rpy, atol=1e-10
    )


def test_quat_normalization():
    q = jnp.array([[2.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(maths.quat_to_rotmat(q))[0], np.eye(3), atol=1e-12
    )


def test_skew_cross_product():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 3))
    b = rng.standard_normal((8, 3))
    s = np.asarray(maths.skew(jnp.asarray(a)))
    np.testing.assert_allclose(
        np.einsum("bij,bj->bi", s, b), np.cross(a, b), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(maths.unskew(jnp.asarray(s))), a, atol=1e-12
    )


def _mat_to_quat(r):
    w = np.sqrt(np.maximum(1 + r[:, 0, 0] + r[:, 1, 1] + r[:, 2, 2], 0)) / 2
    x = (r[:, 2, 1] - r[:, 1, 2]) / (4 * w)
    y = (r[:, 0, 2] - r[:, 2, 0]) / (4 * w)
    z = (r[:, 1, 0] - r[:, 0, 1]) / (4 * w)
    return np.stack([w, x, y, z], axis=1)
