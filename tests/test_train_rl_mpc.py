"""RL-MPC training loop (ARS over the DRL knobs) — end-to-end smoke.

Covers the capability the reference is built for but does not ship (its RL
training lives in external IsaacLab envs): per-env policy perturbations
through the batched MPC knobs, group-wise return estimation, and a policy
update step.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import train_rl_mpc as trm

import pytest

pytestmark = pytest.mark.slow  # integration tier: pytest -m slow


def test_ars_trains_and_updates_policy():
    w, history = trm.train(iters=2, n_dirs=2, envs_per=1, steps=6,
                           verbose=False, seed=1)
    assert w.shape == (trm.ACT_DIM, trm.OBS_DIM)
    assert np.linalg.norm(w) > 0.0, "policy never updated"
    assert len(history) == 2 and np.isfinite(history).all()
    # Walking with small knob perturbations should keep positive reward.
    assert history[-1] > 0.0
