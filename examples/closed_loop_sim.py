"""Closed-loop batched walking demo: MPC controller + SRBD plant, no sim engine.

The reference demonstrates its stack inside external RL simulators (IsaacLab /
Genesis, not in-repo) plus small closed-loop CusADi examples
(`cusadi/examples/planar_drone_LQR.py`). This example closes the loop entirely
inside the framework: the plant is the same single-rigid-body model the MPC
linearizes (`models/srbd.py`), feet are kinematic (stance feet pinned to their
footholds, swing feet tracking the controller's Bezier targets), and joints
follow the controller's IK — so thousands of bipeds walk as one jitted batch
with zero external dependencies.

Run:  python examples/closed_loop_sim.py [num_envs] [seconds]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from biped_pympc_tpu import ControllerConf, MPCConf, MPCController
from biped_pympc_tpu.models import srbd
from biped_pympc_tpu.utils.maths import quat_to_rotmat


def _euler_to_quat(rpy: np.ndarray) -> np.ndarray:
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


def simulate(
    num_envs: int = 4,
    seconds: float = 2.0,
    vx: float = 0.3,
    solver: str = "tridiag_aug",
    robot_name: str = "HECTOR",
    height: float | None = None,
    seed: int = 0,
    verbose: bool = True,
    obs_ik: str = "robot",
    mpc_overrides: dict | None = None,
):
    """Run the closed loop; returns a dict of trajectories (numpy).

    obs_ik selects the IK standing in for joint encoders when assembling
    the observation from the kinematic plant: "robot" (default) uses the
    controller robot's own IK — for plain "T1" that is the reference's
    planar approximation, whose FK(IK(p)) roundtrip error (~1 cm z at
    stance; PARITY.md row 23) is what produces the documented ~+5 cm
    closed-loop height bias; "newton" uses the exact Gauss-Newton IK for
    the observation ONLY (the controller still runs the plain IK for its
    swing targets), modeling a real deployment where encoders measure true
    joint angles. HECTOR's IK is exact, so the knob only matters for T1.
    """
    cfg = ControllerConf(ssp_durations=5, dsp_durations=0, swing_height=0.08)
    # The reference's hardwired 500 N force cap suits HECTOR (13.9 kg); give
    # the 40 kg T1 the same ~3.7x-mg authority (a one-line config here vs a
    # multi-hour kernel recompile in the reference).
    f_max = 500.0 if robot_name == "HECTOR" else 1450.0
    mpc_cfg = MPCConf(solver=solver, robot=robot_name, f_max=f_max,
                      **(mpc_overrides or {}))
    ctrl = MPCController(cfg, mpc_cfg, num_envs=num_envs, gait_id=2)
    robot = ctrl.core.robot
    if height is None:
        height = 0.55 if robot_name == "HECTOR" else 0.62
    dt = mpc_cfg.dt
    steps = int(seconds / dt)
    rng = np.random.default_rng(seed)

    # Plant state: x = [rpy, pos, omega_w, v_w] per env.
    x = np.zeros((num_envs, 12))
    x[:, 5] = height
    grf = np.zeros((num_envs, 12))

    # Kinematic feet in world frame: start under the hips.
    hip_l = np.asarray(robot.hip_horizontal_location(0, jnp.float32))
    hip_r = np.asarray(robot.hip_horizontal_location(1, jnp.float32))
    foot_w = np.zeros((num_envs, 2, 3))
    foot_w[:, 0, :2] = hip_l[:2]
    foot_w[:, 1, :2] = hip_r[:2]

    twist = np.zeros((num_envs, 3), dtype=np.float32)
    twist[:, 0] = vx
    ctrl.set_command(twist, np.full(num_envs, height, dtype=np.float32))

    if obs_ik == "newton":
        if not robot_name.startswith("T1"):
            raise ValueError("obs_ik='newton' is a T1 knob (HECTOR IK is exact)")
        from biped_pympc_tpu.models import t1 as _t1

        ik_single = _t1.analytical_ik_newton
    else:
        ik_single = robot.analytical_ik
    ik = jax.jit(
        lambda p, leg: jax.vmap(lambda pp: ik_single(pp, leg))(p),
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

    @jax.jit
    def plant_step(x_b, grf_b, foot_w_b):
        """Batched SRBD integration with the commanded world-frame GRFs."""
        def one(xi, ui, feet):
            rot = quat_to_rotmat(jnp.asarray(_to_quat_j(xi[:3])))
            lin = lin_template._replace(
                rot_body=rot,
                inertia_world=rot @ lin_template.inertia_world @ rot.T,
                body_pos=xi[3:6],
                foot_pos=feet,
            )
            return srbd.rk4_step_generic(lin, xi, ui, dt)

        return jax.vmap(one)(x_b, grf_b, foot_w_b)

    def _to_quat_j(rpy):
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

    traj = {"pos": [], "rpy": [], "vx": [], "fz": []}
    dof = robot.num_dof

    for step in range(steps):
        quat = _euler_to_quat(x[:, :3])
        rot = np.asarray(quat_to_rotmat(jnp.asarray(quat, jnp.float32)))
        v_b = np.einsum("bij,bj->bi", rot.transpose(0, 2, 1), x[:, 9:12])
        w_b = np.einsum("bij,bj->bi", rot.transpose(0, 2, 1), x[:, 6:9])

        # body-frame foot positions (R^T (p_w - root)) and IK joints
        foot_b = np.einsum("bji,blj->bli", rot, foot_w - x[:, None, 3:6])
        q_l = np.asarray(ik(jnp.asarray(foot_b[:, 0], jnp.float32), 0))
        q_r = np.asarray(ik(jnp.asarray(foot_b[:, 1], jnp.float32), 1))

        obs = np.zeros((num_envs, 13 + 6 * dof), dtype=np.float32)
        obs[:, 0:3] = x[:, 3:6]
        obs[:, 3:7] = quat
        obs[:, 7:10] = v_b
        obs[:, 10:13] = w_b
        obs[:, 13: 13 + dof] = q_l
        obs[:, 13 + dof: 13 + 2 * dof] = q_r

        ctrl.update_state(obs)
        if step % mpc_cfg.decimation == 0:
            ctrl.run_mpc()
            grf = np.asarray(ctrl._last_mpc.grf_world, dtype=np.float64)

        ctrl.run_lowlevel()

        # Kinematic feet: stance feet pinned; swing feet track the
        # controller's body-frame targets.
        contact = np.asarray(ctrl.contact_state)  # (B, 2)
        p_des_b = np.asarray(ctrl.ref_foot_pos_b)  # (B, 2, 3)
        p_des_w = (
            np.einsum("bij,blj->bli", rot, p_des_b) + x[:, None, 3:6]
        )
        foot_w = np.where(contact[:, :, None] > 0.5, foot_w, p_des_w)
        foot_w[:, :, 2] = np.maximum(foot_w[:, :, 2], 0.0)

        # Plant: gate GRFs by contact and integrate.
        grf_gated = grf.copy()
        grf_gated[:, 0:3] *= contact[:, 0:1]
        grf_gated[:, 6:9] *= contact[:, 0:1]
        grf_gated[:, 3:6] *= contact[:, 1:2]
        grf_gated[:, 9:12] *= contact[:, 1:2]
        x = np.asarray(
            plant_step(
                jnp.asarray(x, jnp.float32),
                jnp.asarray(grf_gated, jnp.float32),
                jnp.asarray(foot_w, jnp.float32),
            ),
            dtype=np.float64,
        )

        if step % 50 == 0:
            traj["pos"].append(x[:, 3:6].copy())
            traj["rpy"].append(x[:, :3].copy())
            traj["vx"].append(x[:, 9].copy())
            traj["fz"].append(grf_gated[:, [2, 5]].copy())
            if verbose:
                print(
                    f"t={step*dt:5.2f}s  x={x[0, 3]:+.3f}  z={x[0, 5]:.3f}  "
                    f"rp=({x[0, 0]:+.3f},{x[0, 1]:+.3f})  vx={x[0, 9]:+.3f}  "
                    f"fz=({grf_gated[0, 2]:6.1f},{grf_gated[0, 5]:6.1f})"
                )

    return {k: np.stack(v) for k, v in traj.items()}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    out = simulate(num_envs=n, seconds=secs)
    final = out["pos"][-1]
    print(f"\nfinal body position (env 0): {final[0].round(3)}")
    print("closed-loop simulation finished.")
