"""RL-MPC environment smoke test: DRL knobs + masked resets end to end."""

import sys
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "examples"))

from rl_env import RlMpcEnv

import pytest

pytestmark = pytest.mark.slow  # integration tier: pytest -m slow


def test_rl_env_steps_and_improves():
    env = RlMpcEnv(num_envs=3, vx_cmd=0.3, seed=0)
    obs = env.reset()
    assert obs.shape == (3, 14)
    rng = np.random.default_rng(0)
    rewards = []
    for _ in range(8):
        obs, r, done, info = env.step(0.05 * rng.standard_normal((3, 10)))
        rewards.append(r.mean())
        assert np.isfinite(obs).all() and np.isfinite(r).all()
    # no falls with small random knob perturbations; reward improves as the
    # robot accelerates toward the commanded velocity
    assert not done.any()
    assert rewards[-1] > rewards[0]


def test_rl_env_matrix_residual_actions():
    """matrix_residual=True extends the action space to drive the (12,12)
    SRBD A/B residuals (`set_srbd_residual`) through the diagonal
    effectiveness parameterization; walking stays finite and the residual
    visibly changes the commanded wrench vs the zero-action baseline."""
    env = RlMpcEnv(num_envs=2, vx_cmd=0.3, seed=0, matrix_residual=True)
    env.reset()
    assert env.act_dim == 16
    act = np.zeros((2, 16))
    obs, r, done, _ = env.step(act)
    grf_zero = np.asarray(env.ctrl.grf_world).copy()
    assert env.ctrl.state.residual_B is not None

    env2 = RlMpcEnv(num_envs=2, vx_cmd=0.3, seed=0, matrix_residual=True)
    env2.reset()
    act2 = np.zeros((2, 16))
    act2[:, 10:13] = 0.9  # forces believed ~27% stronger
    obs2, r2, done2, _ = env2.step(act2)
    grf_res = np.asarray(env2.ctrl.grf_world)
    assert np.isfinite(obs2).all() and not done2.any()
    assert not np.allclose(grf_res, grf_zero, atol=1e-3)


def test_rl_env_fall_reset():
    env = RlMpcEnv(num_envs=2, vx_cmd=0.3, seed=1)
    env.reset()
    # knock env 0 over
    env.plant.x[0, 0] = 0.8  # roll way past the fall threshold
    obs, r, done, info = env.step(np.zeros((2, 10)))
    assert bool(done[0])
    assert r[0] < r[1]
    # env 0 was reset to nominal
    assert abs(env.plant.x[0, 0]) < 0.2
    assert np.isfinite(obs).all()
