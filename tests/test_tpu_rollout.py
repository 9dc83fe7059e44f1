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

from tpu_rollout import run


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
