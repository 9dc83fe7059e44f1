"""Horizon-20 configuration (BASELINE.json config 4): dims scale, golden match.

The reference is pinned to horizon 10 by its compiled-artifact names
(`mpc_multiple_iter_5_solver_240v_140eq_160ineq.casadi`); here any horizon is
a config value — this test pins the T=20 path against the golden solver.
"""

import jax
import jax.numpy as jnp
import numpy as np

from biped_pympc_tpu import ControllerConf, MPCConf, MPCController
from biped_pympc_tpu.models.srbd import SrbdLin
from biped_pympc_tpu.ops import pdipm, qp as qps, reference_pdipm

import pytest

pytestmark = pytest.mark.slow  # integration tier: pytest -m slow

T = 20


def _qp20():
    lin = SrbdLin(
        rot_body=jnp.eye(3),
        inertia_world=jnp.asarray(np.diag([0.5413, 0.52, 0.0691])),
        body_pos=jnp.asarray([0.0, 0.0, 0.55]),
        foot_pos=jnp.asarray([[0.05, 0.08, 0.0], [0.05, -0.08, 0.0]]),
        mass=jnp.asarray(13.856),
        residual_lin_accel=jnp.zeros(3),
        residual_ang_accel=jnp.zeros(3),
    )
    x0 = jnp.zeros(12).at[5].set(0.52)
    x_ref = jnp.zeros((T, 12)).at[:, 5].set(0.55).at[:, 9].set(0.25)
    contact = np.ones((T, 2))
    contact[3:8, 0] = 0.0
    contact[11:16, 1] = 0.0
    q = jnp.asarray([150.0, 150, 250, 100, 100, 250, 1, 1, 5, 10, 10, 1])
    r = jnp.full(12, 1e-5).at[6:].set(1e-4)
    return qps.build_qp(
        lin, x0, x_ref, jnp.asarray(contact, jnp.float64),
        jnp.asarray(0.025), jnp.asarray(1.0), q, r, T,
    )


def test_horizon20_dims():
    qp = _qp20()
    assert (qp.nz, qp.n_eq, qp.n_ineq) == (480, 280, 320)


def test_horizon20_matches_golden():
    qp = _qp20()
    H, f, A, b, G, d = qps.dense_matrices(qp)
    gx, *_ = reference_pdipm.solve(
        H, f, A, b, G, d,
        *reference_pdipm.initialize_variables(G, d, A.shape[0]), iterations=20,
    )
    for backend in ("tridiag", "tridiag_aug"):
        res = pdipm.solve(qp, pdipm.PdipmOptions(backend=backend))
        np.testing.assert_allclose(
            np.asarray(res.x), gx, atol=1e-6, err_msg=backend
        )


def test_horizon20_controller_end_to_end():
    ctrl = MPCController(
        ControllerConf(), MPCConf(horizon_length=T), num_envs=2, gait_id=2
    )
    obs = np.zeros((2, 43), dtype=np.float32)
    obs[:, 2] = 0.55
    obs[:, 3] = 1.0
    q0 = np.array([0.0, 0.0, 0.45, -0.9, 0.45], dtype=np.float32)
    obs[:, 13:18] = q0
    obs[:, 18:23] = q0
    twist = np.zeros((2, 3), np.float32)
    twist[:, 0] = 0.2
    ctrl.set_command(twist, np.full(2, 0.55, np.float32))
    ctrl.update_state(obs)
    ctrl.run_mpc()
    ctrl.run_lowlevel()
    tau = np.asarray(ctrl.get_action())
    assert np.isfinite(tau).all()
    assert np.asarray(ctrl.position_trajectory).shape == (2, T, 3)
    fz = -np.asarray(ctrl.ground_reaction_wrench)[0, :, 2].sum()
    assert 80.0 < fz < 220.0
