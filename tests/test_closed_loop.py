"""End-to-end closed-loop walking: MPC + SRBD plant, full stack integration.

The strongest integration test in the suite: if any layer (gait, swing,
estimator, QP assembly, PDIPM, wrench transforms, IK) is wrong, the biped
falls over or fails to track the commanded velocity.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.closed_loop_sim import simulate

import pytest

pytestmark = pytest.mark.slow  # integration tier: pytest -m slow


def test_walks_and_stays_upright():
    out = simulate(num_envs=2, seconds=1.0, vx=0.3, verbose=False)

    rpy = out["rpy"]  # (snapshots, B, 3)
    assert np.abs(rpy[:, :, :2]).max() < 0.1, "fell over (roll/pitch)"

    pos = out["pos"]
    z = pos[:, :, 2]
    assert np.abs(z - 0.55).max() < 0.05, "height not held"

    # After the transient, forward velocity tracks the command.
    vx_late = out["vx"][len(out["vx"]) // 2:]
    assert np.abs(vx_late - 0.3).max() < 0.12, f"vx tracking off: {vx_late}"

    # Walked roughly vx * t forward.
    dist = pos[-1, 0, 0] - pos[0, 0, 0]
    assert dist > 0.1, f"did not walk forward: {dist}"

    # Alternating single support: every snapshot has at least one loaded leg
    # while walking, and both legs get loaded across the run.
    fz = out["fz"]  # (snapshots, B, 2)
    assert (fz.max(axis=2) > 50.0).mean() > 0.8
    assert (fz[:, 0, 0] > 50).any() and (fz[:, 0, 1] > 50).any()


def test_t1_walks_and_stays_upright():
    """The 40 kg T1 (Gauss-Newton exact-IK variant) walks in the same loop.

    Needs the configurable per-foot force cap (`MPCConf.f_max`): at the
    reference's hardwired 500 N (`srbd_constraints.py:31`) the T1
    (mg = 392 N) cannot regulate height and sinks ~10 cm/s; at the
    HECTOR-equivalent ~3.7x-mg authority it holds height and tracks the
    velocity command.
    """
    out = simulate(
        num_envs=2, seconds=2.5, vx=0.3, robot_name="T1-newton",
        verbose=False,
    )

    rpy = out["rpy"]
    assert np.abs(rpy[:, :, :2]).max() < 0.1, "fell over (roll/pitch)"

    z = out["pos"][:, :, 2]
    assert np.abs(z - 0.62).max() < 0.07, "height not held"

    # vx ramps toward the command and keeps rising (full convergence takes
    # ~3.5 s for the heavier robot; keep the test short).
    vx = out["vx"]
    assert vx[-1].min() > 0.15, f"vx not ramping: {vx[-5:]}"
    assert vx[-1].min() > vx[len(vx) // 2].max() - 0.02, "vx stopped rising"

    dist = out["pos"][-1, 0, 0] - out["pos"][0, 0, 0]
    assert dist > 0.1, f"did not walk forward: {dist}"

    fz = out["fz"]  # (snapshots, B, 2)
    assert (fz.max(axis=2) > 150.0).mean() > 0.8, "unloaded"


def test_t1_reference_parity_ik_walks():
    """Plain robot="T1" (reference-parity analytic IK) in closed loop.

    The reference IK (`/root/reference/biped_pympc/core/robot/t1.py:140-215`)
    carries a ~2.5e-2 m FK/IK roundtrip error (measured, PARITY.md), which
    in closed loop shows up as a small height bias above the 0.62 m command
    and a slower velocity ramp than the exact-IK "T1-newton" variant (vx
    ~0.1 m/s at 2.5 s vs ~0.2). This pins that the registry entry is
    usable: upright, loaded, height within the bias band, velocity rising.
    """
    out = simulate(
        num_envs=2, seconds=2.5, vx=0.3, robot_name="T1", verbose=False,
    )

    rpy = out["rpy"]
    assert np.abs(rpy[:, :, :2]).max() < 0.1, "fell over (roll/pitch)"

    z = out["pos"][:, :, 2]
    # Documented relaxed band: the parity IK's roundtrip error biases the
    # realized height up to ~+0.05 m above the command.
    assert z.min() > 0.58 and z.max() < 0.70, f"height out of band: {z.min()}, {z.max()}"

    vx = out["vx"]
    assert vx[-1].min() > 0.05, f"vx not ramping: {vx[-5:]}"
    assert vx[-1].min() > vx[len(vx) // 2].max() - 0.02, "vx stopped rising"

    fz = out["fz"]
    assert (fz.max(axis=2) > 150.0).mean() > 0.8, "unloaded"


def test_t1_obs_ik_knob_removes_height_bias():
    """VERDICT r3 item 7 (bias exposure): the plain-T1 closed-loop height
    bias is produced by the approximate IK standing in for joint encoders
    in the sim observation path, not by the controller's own swing IK.
    With obs_ik="newton" (true-encoder model) the plain-T1 controller
    holds height in the same tight band as T1-newton."""
    out = simulate(
        num_envs=2, seconds=2.5, vx=0.3, robot_name="T1",
        verbose=False, obs_ik="newton",
    )

    rpy = out["rpy"]
    assert np.abs(rpy[:, :, :2]).max() < 0.1, "fell over (roll/pitch)"

    z = out["pos"][:, :, 2]
    # T1-newton's band (0.07) instead of the biased 0.58..0.70 band the
    # parity test documents for obs_ik="robot".
    assert np.abs(z - 0.62).max() < 0.07, f"height band: {z.min()}, {z.max()}"

    vx = out["vx"]
    assert vx[-1].min() > 0.1, f"vx not ramping: {vx[-5:]}"

    # HECTOR rejects the knob (its IK is exact).
    with pytest.raises(ValueError, match="T1 knob"):
        simulate(num_envs=1, seconds=0.1, robot_name="HECTOR",
                 verbose=False, obs_ik="newton")
