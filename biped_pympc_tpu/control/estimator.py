"""State-estimator interface: derive frames from an externally estimated state.

Functional port of the reference's pass-through `StateEstimator`
(`/root/reference/biped_pympc/controllers/state_estimator.py:7-48`): given
root pose/twist from the simulator or hardware estimator, derive euler angles,
the body rotation matrix, world-frame twists and world-frame foot positions.
Single-env; vmap for batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from biped_pympc_tpu.utils.maths import quat_to_euler, quat_to_rotmat


class EstimatorData(NamedTuple):
    """(`state_estimator.py:22-45` and `robot_data.py:8-39`)."""

    root_position: jnp.ndarray  # (3,)
    root_quat: jnp.ndarray  # (4,) (w, x, y, z)
    root_euler: jnp.ndarray  # (3,)
    rotation_body: jnp.ndarray  # (3, 3)
    root_velocity_w: jnp.ndarray  # (3,)
    root_angular_velocity_w: jnp.ndarray  # (3,)
    root_velocity_b: jnp.ndarray  # (3,)
    root_angular_velocity_b: jnp.ndarray  # (3,)
    foot_position_w: jnp.ndarray  # (2, 3)


def init_data(dtype=jnp.float32) -> EstimatorData:
    return EstimatorData(
        root_position=jnp.zeros(3, dtype=dtype),
        root_quat=jnp.zeros(4, dtype=dtype).at[0].set(1.0),
        root_euler=jnp.zeros(3, dtype=dtype),
        rotation_body=jnp.eye(3, dtype=dtype),
        root_velocity_w=jnp.zeros(3, dtype=dtype),
        root_angular_velocity_w=jnp.zeros(3, dtype=dtype),
        root_velocity_b=jnp.zeros(3, dtype=dtype),
        root_angular_velocity_b=jnp.zeros(3, dtype=dtype),
        foot_position_w=jnp.zeros((2, 3), dtype=dtype),
    )


def estimate(
    root_position: jnp.ndarray,
    root_quat: jnp.ndarray,
    root_velocity_b: jnp.ndarray,
    root_angular_velocity_b: jnp.ndarray,
    foot_position_b: jnp.ndarray,
) -> EstimatorData:
    """Derive all frames from the raw body state + body-frame foot positions.

    Combines `set_body_state` (`state_estimator.py:22-39`) and
    `update_foot_position` (`:41-45`): twists arrive in the body frame and are
    rotated to world; feet: p_w = R p_b + root.
    """
    rot = quat_to_rotmat(root_quat)
    euler = quat_to_euler(root_quat)
    vel_w = rot @ root_velocity_b
    ang_w = rot @ root_angular_velocity_b
    foot_w = (rot @ foot_position_b.T).T + root_position[None, :]
    return EstimatorData(
        root_position=root_position,
        root_quat=root_quat,
        root_euler=euler,
        rotation_body=rot,
        root_velocity_w=vel_w,
        root_angular_velocity_w=ang_w,
        root_velocity_b=root_velocity_b,
        root_angular_velocity_b=root_angular_velocity_b,
        foot_position_w=foot_w,
    )
