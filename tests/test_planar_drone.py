"""Planar-drone batched LQR / ROA example (cusadi examples parity).

Covers the capability the reference demonstrates with its CusADi drone
examples (`cusadi/examples/planar_drone_{LQR,ROA}.py`): thousands of
closed-loop sims in parallel with per-env controller/model parameters.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import planar_drone as pd

import pytest

pytestmark = pytest.mark.slow  # integration tier: pytest -m slow


def test_lqr_settles_from_displacement():
    gain = pd.dare_gain(np.ones(6), np.ones(2), 1.0)
    s0 = jnp.asarray(np.array([[-2.0, -2.0, 0, 0, 0, 0],
                               [1.0, -1.0, 0, 0, 0, 0]], np.float32))
    gains = jnp.tile(gain[None], (2, 1, 1))
    final, coarse = pd.rollout(
        s0, gains, jnp.full((2, 2), 50.0, jnp.float32),
        jnp.ones(2, jnp.float32), int(15.0 / pd.DT)
    )
    err = np.linalg.norm(np.asarray(final), axis=1)
    assert (err < 1e-3).all(), f"did not settle: {err}"
    assert coarse.shape[0] == int(15.0 / pd.DT) // 100


def test_gain_stabilizes_linearization():
    """Closed-loop spectral radius < 1 for a sweep of masses."""
    masses = np.array([0.25, 1.0, 4.0])
    gains = np.asarray(pd.dare_gain(
        np.ones((3, 6)), np.ones((3, 2)), masses
    ), np.float64)
    ad, bd = pd.hover_linearization(masses)
    for i in range(3):
        eig = np.linalg.eigvals(ad[i] - bd[i] @ gains[i])
        assert np.abs(eig).max() < 1.0 - 1e-5


def test_roa_success_fraction_monotone_in_thrust():
    """More thrust authority => no smaller recovery basin (sampled)."""
    rng = np.random.default_rng(3)
    n = 64
    v = 6.0 * (2 * rng.random((n, 2)) - 1)
    omg = 2.0 * (2 * rng.random(n) - 1)
    s0 = jnp.asarray(np.concatenate(
        [np.zeros((n, 3)), v, omg[:, None]], axis=1).astype(np.float32))
    gain = pd.dare_gain(np.ones(6), np.ones(2), 1.0)
    gains = jnp.tile(gain[None], (n, 1, 1))
    fracs = []
    for f_lim in (8.0, 50.0):
        final, _ = pd.rollout(
            s0, gains, jnp.full((n, 2), f_lim, jnp.float32),
            jnp.ones(n, jnp.float32), int(10.0 / pd.DT),
        )
        ok = np.linalg.norm(np.asarray(final), axis=1) < 1e-3
        fracs.append(ok.mean())
    assert fracs[1] >= fracs[0]
    assert fracs[1] > 0.5, f"most mild perturbations should recover: {fracs}"
