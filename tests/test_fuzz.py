"""Robustness fuzz: extreme inputs through the public API must stay finite.

The controller ingests raw simulator state; RL training will feed it
arbitrary garbage mid-exploration (flying robots, folded legs, huge
velocities). No layer may emit NaN/Inf torques or crash.
"""

import numpy as np
import pytest

from biped_pympc_tpu import ControllerConf, MPCConf, MPCController


pytestmark = pytest.mark.slow  # integration tier: pytest -m slow


@pytest.mark.parametrize("robot,dof", [("HECTOR", 5), ("T1-newton", 6)])
def test_extreme_states_stay_finite(robot, dof):
    B = 8
    ctrl = MPCController(
        ControllerConf(), MPCConf(robot=robot), num_envs=B, gait_id=2
    )
    rng = np.random.default_rng(0)
    width = 13 + 6 * dof

    for trial in range(3):
        obs = np.zeros((B, width), dtype=np.float32)
        obs[:, 0:3] = rng.uniform(-5, 5, (B, 3))  # wild positions
        obs[:, 2] = rng.uniform(0.05, 2.0, B)  # heights incl. near-ground
        quat = rng.standard_normal((B, 4))
        quat /= np.linalg.norm(quat, axis=1, keepdims=True)  # random attitude
        obs[:, 3:7] = quat
        obs[:, 7:13] = rng.uniform(-8, 8, (B, 6))  # large twists
        obs[:, 13: 13 + 2 * dof] = rng.uniform(-2.5, 2.5, (B, 2 * dof))
        obs[:, 13 + 2 * dof:] = rng.uniform(-3, 3, (B, 4 * dof))

        twist = rng.uniform(-2, 2, (B, 3)).astype(np.float32)
        height = rng.uniform(0.2, 1.0, B).astype(np.float32)
        ctrl.set_command(twist, height)
        ctrl.update_state(obs)
        ctrl.run_mpc()
        ctrl.run_lowlevel()
        tau = np.asarray(ctrl.get_action())
        assert np.isfinite(tau).all(), f"non-finite torque, trial {trial}"
        wrench = np.asarray(ctrl.ground_reaction_wrench)
        assert np.isfinite(wrench).all(), f"non-finite wrench, trial {trial}"
        # torque limits always respected
        assert np.abs(tau).max() <= 67.0 + 1e-4

        # random mid-run resets keep everything consistent
        ctrl.reset(rng.integers(0, B, size=2))
