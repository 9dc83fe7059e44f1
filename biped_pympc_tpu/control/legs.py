"""Leg-level control: batched FK/Jacobians, feed-forward + PD feedback torque.

Functional re-expression of the reference's `LegController`
(`/root/reference/biped_pympc/controllers/leg_controller.py:9-123`). All
per-leg python loops in the reference become two static per-leg calls (leg
index is static), everything else is vectorized; single-env functions, vmapped
by the controller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from biped_pympc_tpu.models.robot import RobotSpec


class LegData(NamedTuple):
    """Measured joint state + derived kinematics (`robot_data.py:109-144`)."""

    q: jnp.ndarray  # (2, dof)
    qd: jnp.ndarray  # (2, dof)
    tau: jnp.ndarray  # (2, dof)
    jac: jnp.ndarray  # (2, 6, dof) full contact Jacobian
    p: jnp.ndarray  # (2, 3) foot position, body frame
    v: jnp.ndarray  # (2, 3) foot velocity, body frame
    contact_phase: jnp.ndarray  # (2,)
    swing_phase: jnp.ndarray  # (2,)
    contact_bool: jnp.ndarray  # (2,) float 0/1
    swing_bool: jnp.ndarray  # (2,) float 0/1


class LegCommand(NamedTuple):
    """Outputs of the leg controller (`robot_data.py:68-107`)."""

    tau_ff: jnp.ndarray  # (2, dof) feed-forward torque (J^T wrench)
    q_des: jnp.ndarray  # (2, dof)
    qd_des: jnp.ndarray  # (2, dof)
    p_des: jnp.ndarray  # (2, 3)
    v_des: jnp.ndarray  # (2, 3)
    wrench_ff: jnp.ndarray  # (2, 6) feed-forward foot wrench from the MPC
    kp: jnp.ndarray  # (2, dof)
    kd: jnp.ndarray  # (2, dof)


def init_command(num_dof: int, dtype=jnp.float32) -> LegCommand:
    z = jnp.zeros((2, num_dof), dtype=dtype)
    z3 = jnp.zeros((2, 3), dtype=dtype)
    return LegCommand(
        tau_ff=z, q_des=z, qd_des=z, p_des=z3, v_des=z3,
        wrench_ff=jnp.zeros((2, 6), dtype=dtype), kp=z, kd=z,
    )


def init_data(num_dof: int, dtype=jnp.float32) -> LegData:
    z = jnp.zeros((2, num_dof), dtype=dtype)
    return LegData(
        q=z, qd=z, tau=z,
        jac=jnp.zeros((2, 6, num_dof), dtype=dtype),
        p=jnp.zeros((2, 3), dtype=dtype),
        v=jnp.zeros((2, 3), dtype=dtype),
        contact_phase=jnp.zeros(2, dtype=dtype),
        swing_phase=jnp.zeros(2, dtype=dtype),
        contact_bool=jnp.ones(2, dtype=dtype),
        swing_bool=jnp.zeros(2, dtype=dtype),
    )


def update_data(
    robot: RobotSpec,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    tau: jnp.ndarray,
    contact_phase: jnp.ndarray,
    swing_phase: jnp.ndarray,
) -> LegData:
    """FK + Jacobians + foot velocity (`leg_controller.py:27-70`).

    q/qd/tau: (2 * dof,) flat measured joint state -> per-leg (2, dof).
    """
    dof = robot.num_dof
    q = q.reshape(2, dof)
    qd = qd.reshape(2, dof)
    tau = tau.reshape(2, dof)

    p = jnp.stack([robot.foot_position(q[leg], leg) for leg in (0, 1)])
    jac = jnp.stack([robot.contact_jacobian(q[leg], leg) for leg in (0, 1)])
    v = jnp.einsum("lij,lj->li", jac[:, :3, :], qd)

    return LegData(
        q=q, qd=qd, tau=tau, jac=jac, p=p, v=v,
        contact_phase=contact_phase,
        swing_phase=swing_phase,
        contact_bool=(contact_phase != -1).astype(q.dtype),
        swing_bool=(swing_phase != -1).astype(q.dtype),
    )


def update_command(
    robot: RobotSpec,
    data: LegData,
    cmd: LegCommand,
) -> LegCommand:
    """PD gains, stance feed-forward torque, swing IK feedback
    (`leg_controller.py:72-119`)."""
    dtype = data.q.dtype
    in_contact = data.contact_bool[:, None].astype(bool)  # (2, 1)

    # PD gains from the robot config; Kp zeroed for stance legs
    # (`leg_controller.py:81-85,118-119`).
    kp = jnp.tile(jnp.asarray(robot.kp, dtype=dtype)[None, :], (2, 1))
    kd = jnp.tile(jnp.asarray(robot.kd, dtype=dtype)[None, :], (2, 1))
    kp = jnp.where(in_contact, 0.0, kp)

    # Stance feed-forward: tau = J^T wrench, gated by contact
    # (`leg_controller.py:87-95`).
    tau_stance = jnp.einsum("lij,li->lj", data.jac, cmd.wrench_ff)
    tau_ff = jnp.where(in_contact, tau_stance, 0.0)

    # Swing feedback: analytic IK for q_des, J_v^T v_des for qd_des with yaw
    # and ankle rows zeroed (`leg_controller.py:97-116`).
    q_swing = jnp.stack(
        [robot.analytical_ik(cmd.p_des[leg], leg) for leg in (0, 1)]
    )
    q_des = jnp.where(in_contact, 0.0, q_swing)

    qd_swing = jnp.einsum("lij,li->lj", data.jac[:, :3, :], cmd.v_des)
    qd_swing = qd_swing.at[:, 0].set(0.0).at[:, -1].set(0.0)
    qd_des = jnp.where(in_contact, 0.0, qd_swing)

    return cmd._replace(
        tau_ff=tau_ff, q_des=q_des, qd_des=qd_des, kp=kp, kd=kd
    )


def joint_torque(robot: RobotSpec, data: LegData, cmd: LegCommand) -> jnp.ndarray:
    """Final torque: clamp(tau_ff + Kp (q_des - q) + Kd (qd_des - qd))
    (`biped_controller.py:171-179`). Returns (2 * dof,) flat."""
    tau = cmd.tau_ff + cmd.kp * (cmd.q_des - data.q) + cmd.kd * (cmd.qd_des - data.qd)
    limit = jnp.asarray(robot.torque_limit, dtype=tau.dtype)
    return jnp.clip(tau.reshape(-1), -limit, limit)
