"""Vectorized RL-MPC environment: the framework's DRL interface end to end.

The reference exists to run thousands of MPC controllers inside RL training
(`README.md:1-3`), exposing per-env knobs the policy can modulate
(`mpc_wrapper.py:48-64`): MPC sampling time, swing height / Bezier control
points, and SRBD residual accelerations. This example wires those knobs into
a gym-style vectorized environment around the kinematic SRBD plant:

    env = RlMpcEnv(num_envs=64)
    obs = env.reset()
    for _ in range(200):
        action = policy(obs)            # (B, 10) in [-1, 1]
        obs, reward, done, info = env.step(action)

Action layout (B, 10), all residuals on top of nominal values:
    [0]    d_dt_mpc      in +-5 ms around the nominal 25 ms
    [1]    d_swing_h     in +-4 cm around the nominal 8 cm
    [2],[3] d_cp1, d_cp2 in +-0.15 around 1/3, 2/3
    [4:7]  residual linear acceleration  (+-1 m/s^2)
    [7:10] residual angular acceleration (+-1 rad/s^2)

With `matrix_residual=True` the action grows to (B, 16) and the extra dims
drive the (12, 12) SRBD A/B-matrix residuals (`set_srbd_residual` — the
interface the reference declares but leaves NotImplemented,
`mpc_wrapper.py:66-67`) through a compact diagonal parameterization:
    [10:13] force-effectiveness residual  (+-30% of 1/m on the v_dot rows)
    [13:16] moment-effectiveness residual (+-30% of I_b^-1 diag on omega rows)

Episodes terminate on falls (|roll/pitch| > 0.5 or height out of range);
fallen envs are masked-reset (controller + plant), demonstrating the per-env
episodic reset path under batching.

Run:  python examples/rl_env.py [num_envs] [steps]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from biped_pympc_tpu import ControllerConf, MPCConf, MPCController

from srbd_plant import SrbdPlant  # noqa: E402  (examples-local module)


class RlMpcEnv:
    def __init__(self, num_envs: int = 16, vx_cmd: float = 0.3,
                 solver: str = "tridiag_aug", seed: int = 0,
                 matrix_residual: bool = False):
        self.num_envs = num_envs
        self.vx_cmd = vx_cmd
        self.matrix_residual = matrix_residual
        self.act_dim = 16 if matrix_residual else 10
        cfg = ControllerConf(ssp_durations=5, dsp_durations=0,
                             swing_height=0.08)
        self.mpc_cfg = MPCConf(solver=solver)
        self.ctrl = MPCController(cfg, self.mpc_cfg, num_envs=num_envs,
                                  gait_id=2)
        self.plant = SrbdPlant(self.ctrl.core.robot, num_envs, height=0.55,
                               dt=self.mpc_cfg.dt)
        self.rng = np.random.default_rng(seed)
        self._tick = 0

    # -- gym-ish API -----------------------------------------------------

    def reset(self) -> np.ndarray:
        mask = np.ones(self.num_envs, dtype=bool)
        self.plant.reset(mask)
        self.ctrl.reset(mask)
        twist = np.zeros((self.num_envs, 3), dtype=np.float32)
        twist[:, 0] = self.vx_cmd
        self.ctrl.set_command(twist, np.full(self.num_envs, 0.55, np.float32))
        self._tick = 0
        return self._rl_obs()

    def step(self, action: np.ndarray):
        """One RL step = one MPC cycle (`decimation` low-level ticks)."""
        action = np.clip(np.asarray(action, dtype=np.float32), -1.0, 1.0)

        # DRL knobs (the reference's interface, `mpc_wrapper.py:48-64`)
        dt_mpc = 0.025 + 0.005 * action[:, 0]
        self.ctrl.update_mpc_sampling_time(dt_mpc)
        self.ctrl.set_swing_parameters(
            foot_height=0.08 + 0.04 * action[:, 1],
            cp1=1.0 / 3.0 + 0.15 * action[:, 2],
            cp2=2.0 / 3.0 + 0.15 * action[:, 3],
        )
        self.ctrl.set_srbd_accel(
            residual_lin_accel=1.0 * action[:, 4:7],
            residual_ang_accel=1.0 * action[:, 7:10],
        )
        if self.matrix_residual:
            # Diagonal parameterization of the B-matrix residual: the policy
            # modulates how effective the model believes forces (v_dot rows)
            # and moments (omega_dot rows) are, per axis, per env.
            robot = self.ctrl.core.robot
            b = self.num_envs
            rb = np.zeros((b, 12, 12), np.float32)
            f_scale = 0.3 / float(robot.mass)
            i_inv_diag = 1.0 / np.diag(np.asarray(robot.i_body))
            for k in range(3):
                rb[:, 9 + k, 0 + k] = f_scale * action[:, 10 + k]
                rb[:, 9 + k, 3 + k] = f_scale * action[:, 10 + k]
                rb[:, 6 + k, 6 + k] = \
                    0.3 * i_inv_diag[k] * action[:, 13 + k]
                rb[:, 6 + k, 9 + k] = \
                    0.3 * i_inv_diag[k] * action[:, 13 + k]
            self.ctrl.set_srbd_residual(
                np.zeros((b, 12, 12), np.float32), rb)

        for k in range(self.mpc_cfg.decimation):
            obs_vec = self.plant.observation()
            self.ctrl.update_state(obs_vec)
            if k == 0:
                self.ctrl.run_mpc()
                grf = np.asarray(self.ctrl.grf_world, dtype=np.float64)
            self.ctrl.run_lowlevel()
            self.plant.step(
                grf,
                np.asarray(self.ctrl.contact_state),
                np.asarray(self.ctrl.ref_foot_pos_b),
            )
        self._tick += 1

        x = self.plant.x
        fell = (
            (np.abs(x[:, 0:2]).max(axis=1) > 0.5)
            | (x[:, 5] < 0.3)
            | (x[:, 5] > 0.8)
        )
        vx_err = x[:, 9] - self.vx_cmd
        reward = (
            1.0
            - 2.0 * np.abs(vx_err)
            - 0.5 * np.abs(x[:, 5] - 0.55)
            - 5.0 * fell.astype(np.float64)
        )
        if fell.any():
            self.plant.reset(fell)
            self.ctrl.reset(fell)
        return self._rl_obs(), reward, fell, {"tick": self._tick}

    def _rl_obs(self) -> np.ndarray:
        x = self.plant.x
        return np.concatenate(
            [
                x[:, 0:3],  # rpy
                x[:, 5:6],  # height
                x[:, 6:12],  # twists
                np.asarray(self.ctrl.contact_state),
                np.asarray(self.ctrl.swing_phase),
            ],
            axis=1,
        ).astype(np.float32)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    env = RlMpcEnv(num_envs=n)
    obs = env.reset()
    rng = np.random.default_rng(0)
    total = np.zeros(n)
    for t in range(steps):
        action = 0.1 * rng.standard_normal((n, env.act_dim))  # random policy
        obs, reward, done, info = env.step(action)
        total += reward
        if t % 10 == 0:
            print(f"step {t:3d}  mean reward {reward.mean():+.3f}  "
                  f"falls {int(done.sum())}  obs[0,:4]={obs[0, :4].round(3)}")
    print(f"\nmean episode return over {steps} steps: {total.mean():.2f}")
