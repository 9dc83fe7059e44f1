"""RL-MPC hybrid training: learn the DRL knobs with batched random search.

The reference framework exists to train RL policies that modulate MPC
(`README.md:1-3` — IsaacLab/Genesis environments, not shipped). This example
closes that loop self-contained: a linear policy over the `RlMpcEnv`
observation learns residual MPC parameters (sampling time, swing shape, SRBD
residual accelerations) that improve the walking reward.

Trainer: Augmented Random Search (ARS, Mania et al. 2018) — exactly the kind
of algorithm a massively-batched MPC enables: every perturbation direction
(+delta and -delta) is assigned to its own GROUP of envs, so one batched
rollout evaluates the whole population. No backprop through the controller
is needed (the MPC is the policy's environment), and the per-env knob batching
(`mpc_wrapper.py:48-64`) is what lets different envs run different policies
in the same solve.

Run: python examples/train_rl_mpc.py [--iters 10] [--dirs 4] [--envs-per 4]
"""

from __future__ import annotations

import argparse

import numpy as np

import sys

sys.path.insert(0, ".")

from rl_env import RlMpcEnv  # noqa: E402  (examples-local module)

OBS_DIM = 14
ACT_DIM = 10


class LinearPolicy:
    """action = tanh(W @ obs_normalized); W is the ARS parameter."""

    def __init__(self, w: np.ndarray):
        self.w = w  # (ACT_DIM, OBS_DIM)

    def __call__(self, obs: np.ndarray, w_per_env: np.ndarray) -> np.ndarray:
        # w_per_env: (B, ACT_DIM, OBS_DIM) — per-env policies in one batch.
        return np.tanh(np.einsum("bao,bo->ba", w_per_env, obs))


def rollout_returns(env: RlMpcEnv, w_per_env: np.ndarray, steps: int):
    """One batched rollout; returns per-env summed reward."""
    obs = env.reset()
    total = np.zeros(env.num_envs)
    policy = LinearPolicy(None)
    for _ in range(steps):
        action = policy(obs, w_per_env)
        obs, reward, done, _ = env.step(action)
        total += reward
    return total


def train(iters: int = 10, n_dirs: int = 4, envs_per: int = 4,
          steps: int = 40, step_size: float = 0.02, noise: float = 0.05,
          solver: str = "ric_aug", seed: int = 0, verbose: bool = True):
    """ARS with antithetic directions; returns (W, history of mean returns).

    Batch layout: env groups [dir0+, dir0-, dir1+, dir1-, ...], each of
    `envs_per` envs (averaging within a group de-noises the per-env resets).
    """
    rng = np.random.default_rng(seed)
    num_envs = 2 * n_dirs * envs_per
    env = RlMpcEnv(num_envs=num_envs, solver=solver, seed=seed)
    w = np.zeros((ACT_DIM, OBS_DIM))
    history = []

    for it in range(iters):
        deltas = rng.standard_normal((n_dirs, ACT_DIM, OBS_DIM))
        w_per_env = np.empty((num_envs, ACT_DIM, OBS_DIM))
        for d in range(n_dirs):
            base = 2 * d * envs_per
            w_per_env[base: base + envs_per] = w + noise * deltas[d]
            w_per_env[base + envs_per: base + 2 * envs_per] = \
                w - noise * deltas[d]

        returns = rollout_returns(env, w_per_env, steps)
        grouped = returns.reshape(2 * n_dirs, envs_per).mean(axis=1)
        r_plus, r_minus = grouped[0::2], grouped[1::2]

        sigma = np.concatenate([r_plus, r_minus]).std() + 1e-8
        grad = np.einsum("d,dao->ao", r_plus - r_minus, deltas) / n_dirs
        w = w + step_size / sigma * grad
        history.append(float(returns.mean()))
        if verbose:
            print(f"iter {it:3d}  mean return {history[-1]:8.3f}  "
                  f"best dir spread {(r_plus - r_minus).max():+.3f}",
                  flush=True)
    return w, history


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dirs", type=int, default=4)
    p.add_argument("--envs-per", type=int, default=4)
    p.add_argument("--steps", type=int, default=40)
    args = p.parse_args()

    w, history = train(iters=args.iters, n_dirs=args.dirs,
                       envs_per=args.envs_per, steps=args.steps)
    print(f"\nreturn: first {history[0]:.3f} -> last {history[-1]:.3f} "
          f"(best {max(history):.3f})")
    print(f"policy norm {np.linalg.norm(w):.4f}")


if __name__ == "__main__":
    main()
