"""Robot registry: uniform functional interface over HECTOR / T1.

Replaces the reference's `Biped` ABC + `RobotFactory`
(`/root/reference/biped_pympc/core/robot/biped.py:10-83`,
`robot_factory.py:4-14`) with a plain spec object holding static parameters
and per-leg pure kinematics functions (single-env; vmap at the call site).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from biped_pympc_tpu.models import hector, t1


@dataclass(frozen=True)
class RobotSpec:
    name: str
    num_dof: int
    mass: float
    i_body: np.ndarray  # (3, 3)
    mu: float
    # Toe / heel lever arms [m] of the line-contact foot: the pitch-moment
    # authority per newton of normal force (-lt*fz <= my <= lh*fz rows of
    # the MPC inequality block, `ops/qp.py:stage_ineq_block`). The reference
    # hardcodes HECTOR's 0.07/0.04 for every robot
    # (`srbd_constraints.py:161-162`); here they are per-robot (and, via
    # ControllerState.lt/lh, per-env) data.
    lt: float
    lh: float
    kp: tuple  # (num_dof,)
    kd: tuple  # (num_dof,)
    torque_limit: tuple  # (2 * num_dof,)
    # per-leg pure functions; leg index is a static python int
    foot_position: Callable  # (q (dof,), leg) -> (3,)
    contact_jacobian: Callable  # (q (dof,), leg) -> (6, dof)
    analytical_ik: Callable  # (p (3,), leg) -> (dof,)
    hip_horizontal_location: Callable  # (leg, dtype) -> (3,)


HECTOR = RobotSpec(
    name="HECTOR",
    num_dof=hector.NUM_DOF,
    mass=hector.MASS,
    i_body=hector.I_BODY,
    mu=hector.MU,
    lt=hector.LT,
    lh=hector.LH,
    kp=hector.KP,
    kd=hector.KD,
    torque_limit=hector.TORQUE_LIMIT,
    foot_position=hector.foot_position,
    contact_jacobian=hector.contact_jacobian,
    analytical_ik=hector.analytical_ik,
    hip_horizontal_location=hector.hip_horizontal_location,
)

T1 = RobotSpec(
    name="T1",
    num_dof=t1.NUM_DOF,
    mass=t1.MASS,
    i_body=t1.I_BODY,
    mu=t1.MU,
    lt=t1.LT,
    lh=t1.LH,
    kp=t1.KP,
    kd=t1.KD,
    torque_limit=t1.TORQUE_LIMIT,
    foot_position=t1.foot_position,
    contact_jacobian=t1.contact_jacobian,
    analytical_ik=t1.analytical_ik,
    hip_horizontal_location=t1.hip_horizontal_location,
)

# "T1-newton": T1 with Gauss-Newton-refined exact IK — fixes the reference
# IK's decimeter-level FK(IK(p)) error at bent poses (opt-in improvement; the
# plain "T1" entry keeps reference-parity behavior).
T1_NEWTON = RobotSpec(
    **{**T1.__dict__, "name": "T1-newton",
       "analytical_ik": t1.analytical_ik_newton},
)

_REGISTRY = {"HECTOR": HECTOR, "T1": T1, "T1-newton": T1_NEWTON}


def get_robot(name: str) -> RobotSpec:
    """String -> spec, the `RobotFactory` equivalent."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown robot '{name}'. Available: {sorted(_REGISTRY)}"
        ) from None
