"""Reusable kinematic-feet SRBD plant for the closed-loop examples.

The plant integrates the same single-rigid-body model the MPC linearizes
(`biped_pympc_tpu/models/srbd.py`) under the commanded world-frame GRFs;
feet are kinematic (stance feet pinned to their footholds, swing feet
teleported to the controller's body-frame targets). Good enough to exercise
every layer of the control stack without an external physics engine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from biped_pympc_tpu.models import srbd
from biped_pympc_tpu.utils.maths import quat_to_rotmat


def euler_to_quat(rpy: np.ndarray) -> np.ndarray:
    """(B, 3) rpy -> (B, 4) wxyz quaternion (R = Rz Ry Rx convention)."""
    r, p, y = rpy[:, 0] / 2, rpy[:, 1] / 2, rpy[:, 2] / 2
    cr, sr, cp, sp, cy, sy = (
        np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y),
    )
    return np.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=1,
    )


class SrbdPlant:
    """Batched SRBD rigid body + kinematic feet."""

    def __init__(self, robot, num_envs: int, height: float, dt: float):
        self.robot = robot
        self.num_envs = num_envs
        self.dt = dt
        self.height = height
        self.x = np.zeros((num_envs, 12))
        self.x[:, 5] = height
        hip_l = np.asarray(robot.hip_horizontal_location(0, jnp.float32))
        hip_r = np.asarray(robot.hip_horizontal_location(1, jnp.float32))
        self.foot_w = np.zeros((num_envs, 2, 3))
        self.foot_w[:, 0, :2] = hip_l[:2]
        self.foot_w[:, 1, :2] = hip_r[:2]

        self._ik = jax.jit(
            lambda p, leg: jax.vmap(lambda pp: robot.analytical_ik(pp, leg))(p),
            static_argnums=1,
        )
        lin_template = srbd.SrbdLin(
            rot_body=jnp.eye(3),
            inertia_world=jnp.asarray(robot.i_body, jnp.float32),
            body_pos=jnp.zeros(3),
            foot_pos=jnp.zeros((2, 3)),
            mass=jnp.asarray(robot.mass, jnp.float32),
            residual_lin_accel=jnp.zeros(3),
            residual_ang_accel=jnp.zeros(3),
        )

        def _quat_j(rpy):
            r, p, y = rpy[0] / 2, rpy[1] / 2, rpy[2] / 2
            cr, sr = jnp.cos(r), jnp.sin(r)
            cp, sp = jnp.cos(p), jnp.sin(p)
            cy, sy = jnp.cos(y), jnp.sin(y)
            return jnp.stack([
                cr * cp * cy + sr * sp * sy,
                sr * cp * cy - cr * sp * sy,
                cr * sp * cy + sr * cp * sy,
                cr * cp * sy - sr * sp * cy,
            ])

        @jax.jit
        def plant_step(x_b, grf_b, foot_w_b):
            def one(xi, ui, feet):
                rot = quat_to_rotmat(_quat_j(xi[:3]))
                lin = lin_template._replace(
                    rot_body=rot,
                    inertia_world=rot @ lin_template.inertia_world @ rot.T,
                    body_pos=xi[3:6],
                    foot_pos=feet,
                )
                return srbd.rk4_step_generic(lin, xi, ui, self.dt)

            return jax.vmap(one)(x_b, grf_b, foot_w_b)

        self._plant_step = plant_step

    def observation(self) -> np.ndarray:
        """(B, 13 + 6*dof) controller observation vector."""
        dof = self.robot.num_dof
        quat = euler_to_quat(self.x[:, :3])
        rot = np.asarray(quat_to_rotmat(jnp.asarray(quat, jnp.float32)))
        v_b = np.einsum("bij,bj->bi", rot.transpose(0, 2, 1), self.x[:, 9:12])
        w_b = np.einsum("bij,bj->bi", rot.transpose(0, 2, 1), self.x[:, 6:9])
        foot_b = np.einsum(
            "bji,blj->bli", rot, self.foot_w - self.x[:, None, 3:6]
        )
        q_l = np.asarray(self._ik(jnp.asarray(foot_b[:, 0], jnp.float32), 0))
        q_r = np.asarray(self._ik(jnp.asarray(foot_b[:, 1], jnp.float32), 1))
        obs = np.zeros((self.num_envs, 13 + 6 * dof), dtype=np.float32)
        obs[:, 0:3] = self.x[:, 3:6]
        obs[:, 3:7] = quat
        obs[:, 7:10] = v_b
        obs[:, 10:13] = w_b
        obs[:, 13: 13 + dof] = q_l
        obs[:, 13 + dof: 13 + 2 * dof] = q_r
        self._rot = rot
        return obs

    def step(self, grf_world: np.ndarray, contact: np.ndarray,
             p_des_b: np.ndarray) -> None:
        """Advance one dt with the commanded world-frame GRFs."""
        rot = self._rot
        p_des_w = np.einsum("bij,blj->bli", rot, p_des_b) + self.x[:, None, 3:6]
        self.foot_w = np.where(
            contact[:, :, None] > 0.5, self.foot_w, p_des_w
        )
        self.foot_w[:, :, 2] = np.maximum(self.foot_w[:, :, 2], 0.0)

        grf = grf_world.copy()
        grf[:, 0:3] *= contact[:, 0:1]
        grf[:, 6:9] *= contact[:, 0:1]
        grf[:, 3:6] *= contact[:, 1:2]
        grf[:, 9:12] *= contact[:, 1:2]
        self.x = np.asarray(
            self._plant_step(
                jnp.asarray(self.x, jnp.float32),
                jnp.asarray(grf, jnp.float32),
                jnp.asarray(self.foot_w, jnp.float32),
            ),
            dtype=np.float64,
        )

    def reset(self, mask: np.ndarray) -> None:
        """Reset selected envs (bool mask) to the nominal standing state."""
        self.x[mask] = 0.0
        self.x[mask, 5] = self.height
        hip_l = np.asarray(self.robot.hip_horizontal_location(0, jnp.float32))
        hip_r = np.asarray(self.robot.hip_horizontal_location(1, jnp.float32))
        self.foot_w[mask] = 0.0
        self.foot_w[mask, 0, :2] = hip_l[:2]
        self.foot_w[mask, 1, :2] = hip_r[:2]
