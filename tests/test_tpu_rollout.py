"""Whole-rollout-in-one-dispatch walking (`examples/tpu_rollout.py`).

Same health criteria as the host-loop closed-loop test: the full control
stack (gait, estimator, MPC, swing, legs) plus the SRBD plant compiled into
a single `lax.scan` program must keep the batch upright and tracking.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from tpu_rollout import make_affine_rk4_step, run

import pytest

pytestmark = pytest.mark.slow  # integration tier: pytest -m slow


def test_affine_rk4_closed_form_matches_oracle():
    """The rollout's closed-form RK4 equals the literal 4-stage oracle.

    For the affine SRBD model only rpy_dot/p_dot depend on the state, so
    the 4-stage Runge-Kutta sum telescopes to the midpoint closed form —
    an algebraic identity, checked here against `srbd.rk4_step_generic`
    on random states/forces.
    """
    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.models import srbd
    from biped_pympc_tpu.models.robot import get_robot
    from biped_pympc_tpu.utils.maths import quat_to_rotmat

    robot = get_robot("HECTOR")
    dt = 0.001
    rng = np.random.default_rng(0)
    B = 16
    x = rng.uniform(-0.5, 0.5, (B, 12)).astype(np.float32)
    u = rng.uniform(-80, 80, (B, 4, 3)).astype(np.float32)
    foot_w = rng.uniform(-0.3, 0.3, (B, 2, 3)).astype(np.float32)

    quat = np.zeros((B, 4), np.float32)
    ang = rng.uniform(-0.4, 0.4, B)
    quat[:, 0] = np.cos(ang / 2)
    quat[:, 2] = np.sin(ang / 2)
    rot = np.asarray(jax.vmap(quat_to_rotmat)(jnp.asarray(quat)))

    fast = make_affine_rk4_step(robot, dt)
    got = np.asarray(fast(jnp.asarray(x), jnp.asarray(u),
                          jnp.asarray(foot_w), jnp.asarray(rot)))

    def oracle(xi, ui, feet, rot_i):
        lin = srbd.SrbdLin(
            rot_body=rot_i,
            inertia_world=rot_i @ jnp.asarray(robot.i_body, jnp.float32)
            @ rot_i.T,
            body_pos=xi[3:6],
            foot_pos=feet,
            mass=jnp.float32(robot.mass),
            residual_lin_accel=jnp.zeros(3),
            residual_ang_accel=jnp.zeros(3),
        )
        return srbd.rk4_step_generic(lin, xi, ui.reshape(12), dt)

    want = np.asarray(jax.vmap(oracle)(
        jnp.asarray(x), jnp.asarray(u), jnp.asarray(foot_w), jnp.asarray(rot)
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_sharded_rollout_matches_single_device():
    """The whole-rollout program shards over the env-batch mesh axis.

    8 virtual CPU devices, batch 16 (2 envs/device); the sharded rollout
    must produce the single-device trajectories exactly (per-env work is
    independent — sharding introduces no collectives into the hot path).
    """
    import jax

    from biped_pympc_tpu import ControllerConf, MPCConf
    from biped_pympc_tpu.control.controller import BipedControllerCore
    from biped_pympc_tpu.parallel import mesh as pmesh
    from tpu_rollout import init_carry, make_rollout

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices (see conftest)")

    B = 16
    cfg = ControllerConf(ssp_durations=5, dsp_durations=0, swing_height=0.08)
    core = BipedControllerCore(cfg, MPCConf(solver="tridiag_aug"), gait_id=2)
    rollout, _ = make_rollout(core, 0.3)
    carry = init_carry(core, B, 0.3, 0.55)

    _, traj_single = rollout(carry)

    mesh = pmesh.make_mesh(jax.devices()[:8])
    carry_sharded = pmesh.shard_state(init_carry(core, B, 0.3, 0.55), mesh)
    sharded = pmesh.sharded_step(rollout, mesh)
    _, traj_sharded = sharded(carry_sharded)

    np.testing.assert_allclose(
        np.asarray(traj_sharded), np.asarray(traj_single), atol=1e-6
    )


def test_jitted_rollout_walks():
    traj = run(num_envs=2, seconds=1.2)  # (cycles, B, 12)

    rpy = traj[:, :, :3]
    assert np.abs(rpy[:, :, :2]).max() < 0.1, "fell over (roll/pitch)"

    z = traj[:, :, 5]
    assert np.abs(z - 0.55).max() < 0.05, "height not held"

    vx_late = traj[traj.shape[0] // 2:, :, 9]
    assert np.abs(vx_late - 0.3).max() < 0.12, f"vx tracking off: {vx_late}"

    dist = traj[-1, 0, 3] - traj[0, 0, 3]
    assert dist > 0.1, f"did not walk forward: {dist}"
