"""HECTOR biped kinematics/dynamics — closed-form, batched, pure JAX.

Functional re-derivation of the reference's torch implementation
(`/root/reference/biped_pympc/core/robot/hector.py:16-306`): 5-DoF leg
(hip yaw, hip roll, hip pitch, knee, ankle) with homogeneous-transform FK,
geometric contact Jacobian and analytic IK. All functions are single-env
(q: (5,), p: (3,)) and meant to be `jax.vmap`-ed.

Deviation from the reference (documented, intentional): the reference's
right-leg Jacobian reuses the *left* leg's joint axes (`hector.py:202-206`),
which is only correct at symmetric poses; we use the right leg's own
transforms. Tests compare against finite differences of our FK.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from biped_pympc_tpu.utils.maths import rot_x, rot_z

NUM_DOF = 5
MASS = 13.856  # `hector.py:34`
I_BODY = np.array(
    [[0.5413, 0.0, 0.0], [0.0, 0.5200, 0.0], [0.0, 0.0, 0.0691]]
)  # `hector.py:35-37`
MU = 1.0  # `hector.py:38`
# Toe/heel line-contact lever arms: the values the reference bakes into its
# QP for every robot (`srbd_constraints.py:161-162`) — sized for HECTOR's
# 0.11 m foot with the ankle ~2/3 back from the toe.
LT = 0.07
LH = 0.04
KP = (40.0, 40.0, 70.0, 70.0, 40.0)  # `hector.py:10`
KD = (1.0, 1.0, 0.7, 0.7, 0.7)  # `hector.py:11`
TORQUE_LIMIT = (33.5, 33.5, 33.5, 67.0, 33.5, 33.5, 33.5, 33.5, 67.0, 33.5)

# Link offsets (`hector.py:56-61`) and fixed frame permutations (`:72-76`).
_P1 = np.array([-0.00, 0.047, -0.1265])
_P2 = np.array([0.0465, 0.015, -0.0705])
_P3 = np.array([-0.06, 0.018, 0.0])
_P4 = np.array([0.0, 0.01805, -0.22])
_P5 = np.array([0.0, 0.00, -0.22])
_P5E = np.array([0.0, 0.0, -0.042])
_R12 = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], dtype=np.float64)  # T12p
_R23 = np.array([[0, 1, 0], [0, 0, 1], [1, 0, 0]], dtype=np.float64)  # T23p

# Offsets pre-rotated into their joint frames (`hector.py:106-110`).
_P2R = _R12.T @ _P2
_P3R = _R23.T @ _R12.T @ _P3
_P4R = _R23.T @ _R12.T @ _P4
_P5R = _R23.T @ _R12.T @ _P5
_P5ER = _R23.T @ _R12.T @ _P5E

# Right-leg mirror factors applied to the pre-rotated offsets
# (`hector.py:138-150`): p1, p2 mirror y; p3, p4, p5 mirror z; p5e unmirrored.
_MIR_Y = np.array([1.0, -1.0, 1.0])
_MIR_Z = np.array([1.0, 1.0, -1.0])


def _mirror(leg: int):
    """Per-leg translation mirrors; leg 0 = left (identity), 1 = right."""
    if leg == 0:
        one = np.ones(3)
        return one, one
    return _MIR_Y, _MIR_Z


def forward_kinematics(q: jnp.ndarray, leg: int):
    """FK of one leg. q: (5,) [hip_yaw, hip_roll, hip_pitch, knee, ankle].

    Returns (p0e (3,), frames) where frames = (origins (5, 3), axes (5, 3))
    are the world positions / z-axes of each joint — exactly what the
    geometric Jacobian needs. Mirrors `hector.py:112-158`.
    """
    dtype = q.dtype
    mir_y, mir_z = _mirror(leg)

    def c(a):
        return jnp.asarray(a, dtype=dtype)

    r12, r23 = c(_R12), c(_R23)

    # Chain of (rotation, translation) pairs in the parent frame.
    r01 = rot_z(q[0])
    t01 = c(_P1 * mir_y)
    r02 = r01 @ r12 @ rot_z(q[1])
    t02 = t01 + r01 @ r12 @ c(_P2R * mir_y)
    r03 = r02 @ r23 @ rot_z(q[2])
    t03 = t02 + r02 @ r23 @ c(_P3R * mir_z)
    r04 = r03 @ rot_z(q[3])
    t04 = t03 + r03 @ c(_P4R * mir_z)
    r05 = r04 @ rot_z(q[4])
    t05 = t04 + r04 @ c(_P5R * mir_z)

    p0e = t05 + r05 @ c(_P5ER)

    zhat = c(np.array([0.0, 0.0, 1.0]))
    origins = jnp.stack([t01, t02, t03, t04, t05])
    axes = jnp.stack([r01 @ zhat, r02 @ zhat, r03 @ zhat, r04 @ zhat, r05 @ zhat])
    return p0e, (origins, axes)


def foot_position(q: jnp.ndarray, leg: int) -> jnp.ndarray:
    """Foot sole position in the torso frame (`hector.py:161-168`)."""
    p, _ = forward_kinematics(q, leg)
    return p


def contact_jacobian(q: jnp.ndarray, leg: int) -> jnp.ndarray:
    """(6, 5) geometric Jacobian [linear; angular] at the foot sole.

    J[:3, i] = z_i x (p0e - p_i), J[3:, i] = z_i (`hector.py:170-218`, with
    the right-leg axis bug fixed — see module docstring).
    """
    p0e, (origins, axes) = forward_kinematics(q, leg)
    lin = jnp.cross(axes, p0e[None, :] - origins)  # (5, 3)
    return jnp.concatenate([lin.T, axes.T], axis=0)


def analytical_ik(p_foot_b: jnp.ndarray, leg: int) -> jnp.ndarray:
    """Closed-form IK: (3,) desired sole position in torso frame -> (5,) q.

    Hip yaw fixed at 0, ankle aligned with torso pitch. Exact re-expression of
    `hector.py:220-276` (same clamps, same branch conventions).
    """
    dtype = p_foot_b.dtype
    side = 1.0 if leg == 1 else -1.0  # `hector.py:233`

    offset = jnp.asarray(
        [-0.00 + 0.0465 - 0.06, 0.0, -0.126 - 0.0705], dtype=dtype
    ).at[1].set(-side * (0.047 + 0.015))
    foot = p_foot_b - offset
    thigh = 0.22
    calf = 0.22
    foot = foot.at[2].add(0.042)  # d_foot

    dist_yz = jnp.sqrt(foot[1] ** 2 + foot[2] ** 2)
    dist_horiz = 0.018 + 0.01805

    q1 = jnp.arcsin(jnp.clip(foot[1] / dist_yz, -1.0, 1.0)) + jnp.arcsin(
        jnp.clip(dist_horiz * side / dist_yz, -1.0, 1.0)
    )

    r_roll = rot_x(q1)
    hip_pitch_off = jnp.zeros(3, dtype=dtype).at[1].set(0.018 * side)
    foot_hp = r_roll @ foot + hip_pitch_off
    r = jnp.linalg.norm(foot_hp)

    cos_q2 = jnp.clip(
        (r ** 2 - thigh ** 2 - calf ** 2) / (2.0 * thigh * calf), -1.0, 1.0
    )
    sin_q2 = jnp.clip(
        -jnp.sqrt(jnp.clip(1.0 - cos_q2 ** 2, min=1e-6)), -1.0, 1.0
    )
    knee = jnp.arctan2(sin_q2, cos_q2)
    hip_pitch = jnp.arctan2(-foot_hp[0], -foot_hp[2]) - jnp.arctan2(
        calf * sin_q2, thigh + calf * cos_q2
    )
    ankle = -hip_pitch - knee
    return jnp.stack([jnp.zeros((), dtype=dtype), q1, hip_pitch, knee, ankle])


def hip_horizontal_location(leg: int, dtype=jnp.float32) -> jnp.ndarray:
    """Hip-roll projection used by the Raibert heuristic (`hector.py:47-52`)."""
    side = 1.0 if leg == 0 else -1.0
    return jnp.asarray(
        [-0.00 + 0.0465 - 0.06, side * (0.047 + 0.015 + 0.036), 0.0], dtype=dtype
    )


def toe_position(q: jnp.ndarray, leg: int) -> jnp.ndarray:
    """Toe probe (`hector.py:288-296`)."""
    return _probe(q, leg, np.array([0.07, 0.04, 0.0]))


def heel_position(q: jnp.ndarray, leg: int) -> jnp.ndarray:
    """Heel probe (`hector.py:298-306`)."""
    return _probe(q, leg, np.array([-0.04, 0.04, 0.0]))


def _probe(q, leg, offset):
    _, (origins, axes) = forward_kinematics(q, leg)
    # Rebuild T05 rotation from the last joint axis chain: recompute directly.
    # (cheap: reuse forward_kinematics internals via a second call pattern)
    dtype = q.dtype
    mir_y, mir_z = _mirror(leg)
    r12, r23 = jnp.asarray(_R12, dtype), jnp.asarray(_R23, dtype)
    r05 = (
        rot_z(q[0]) @ r12 @ rot_z(q[1]) @ r23 @ rot_z(q[2]) @ rot_z(q[3]) @ rot_z(q[4])
    )
    return origins[4] + r05 @ jnp.asarray(offset, dtype)
