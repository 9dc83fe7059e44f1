"""Per-robot line-contact geometry (lt/lh): QP rows, solver, and wrapper.

The reference bakes HECTOR's toe/heel lever arms into the compiled QP for
every robot (`srbd_constraints.py:161-162`); here they are per-robot spec
data (`RobotSpec.lt/lh`) and per-env state (`ControllerState.lt/lh`). These
tests pin the constraint algebra, the T1 values derived from its URDF foot,
and the end-to-end effect on the solved moments.
"""

import jax
import jax.numpy as jnp
import numpy as np

from biped_pympc_tpu.models.robot import HECTOR, T1, get_robot
from biped_pympc_tpu.ops import pdipm, qp as qps

from test_pdipm import _make_qp, T


def test_stage_ineq_block_lever_arms():
    g = np.asarray(qps.stage_ineq_block(1.0, lt=0.12, lh=0.09))
    for foot, (fc, mc) in enumerate(((0, 6), (3, 9))):
        r = 8 * foot
        # -lt fz - my <= 0 ; -lh fz + my <= 0  (srbd_constraints.py:210-216)
        assert g[r + 4, fc + 2] == np.float32(-0.12)
        assert g[r + 4, mc + 1] == -1.0
        assert g[r + 5, fc + 2] == np.float32(-0.09)
        assert g[r + 5, mc + 1] == 1.0


def test_default_levers_are_reference_hector_values():
    """build_qp with no lt/lh matches the reference's hardcoded QP."""
    default = np.asarray(qps.stage_ineq_block(1.0))
    explicit = np.asarray(qps.stage_ineq_block(1.0, lt=0.07, lh=0.04))
    np.testing.assert_array_equal(default, explicit)
    assert HECTOR.lt == 0.07 and HECTOR.lh == 0.04


def test_t1_spec_geometry_from_urdf():
    """T1's levers come from its real foot: the URDF collision box is
    0.223 m long centered 0.01 m ahead of the sole origin
    (`model/t1_serial.urdf:920-927`)."""
    assert np.isclose(T1.lt, 0.223 / 2 + 0.01)
    assert np.isclose(T1.lh, 0.223 / 2 - 0.01)
    assert get_robot("T1-newton").lt == T1.lt


def _solve_with_levers(lt, lh, pitch=0.25, dtype=jnp.float64):
    """Stance QP with a hard pitch disturbance; returns (u (T,12), qp)."""
    qp = _make_qp(dtype=dtype)
    # Rebuild the inequality block with explicit levers and re-solve.
    g_u = qps.stage_ineq_block(jnp.asarray(1.0, dtype), lt, lh, dtype=dtype)
    qp = qp._replace(g_u=g_u)
    # Inject the pitch error through the linear cost's x_ref (f rows).
    x_ref = jnp.zeros((T, 12), dtype=dtype).at[:, 5].set(0.55)
    x_ref = x_ref.at[:, 1].set(pitch)  # demand a large pitch step
    f_x = (-(qp.q_diag[None, :] * x_ref)).reshape(-1)
    qp = qp._replace(f=jnp.concatenate([f_x, jnp.zeros(12 * T, dtype=dtype)]))
    res = pdipm.solve(qp, pdipm.PdipmOptions(backend="ric_aug"))
    _, u = qps.split_xu(qp, res.x)
    return np.asarray(u), qp


def test_line_contact_bound_scales_with_lever():
    """The solved pitch moments respect -lh*fz <= my <= lt*fz, and the
    T1-sized foot buys strictly more pitch authority when binding."""
    u_h, _ = _solve_with_levers(0.07, 0.04)
    u_t, _ = _solve_with_levers(T1.lt, T1.lh)
    # Row algebra: -lt*fz - my <= 0 and -lh*fz + my <= 0, i.e.
    # -lt*fz <= my <= lh*fz (toe lever bounds the nose-down moment).
    for u, lt, lh in ((u_h, 0.07, 0.04), (u_t, T1.lt, T1.lh)):
        for foot, (fz_i, my_i) in enumerate(((2, 7), (5, 10))):
            fz, my = u[:, fz_i], u[:, my_i]
            assert np.all(my <= lh * fz + 1e-6)
            assert np.all(-lt * fz - 1e-6 <= my)
    # Binding case: the pitch disturbance saturates the toe lever; the
    # longer foot commands a strictly larger restoring moment.
    peak_h = np.abs(u_h[:, [7, 10]]).max()
    peak_t = np.abs(u_t[:, [7, 10]]).max()
    assert peak_t > 1.5 * peak_h, (peak_h, peak_t)


def test_wrapper_contact_geometry_roundtrip():
    """set_contact_parameters(lt=, lh=) lands in per-env state and changes
    the solved GRMs of a pitch-disturbed batch."""
    from biped_pympc_tpu import ControllerConf, MPCConf, MPCController

    ctrl = MPCController(
        ControllerConf(),
        MPCConf(robot="HECTOR", solver="ric_aug", verbose=False),
        num_envs=2,
    )
    # T1-foot levers on env 1 only.
    ctrl.set_contact_parameters(lt=np.array([0.07, T1.lt]),
                                lh=np.array([0.04, T1.lh]))
    np.testing.assert_allclose(np.asarray(ctrl.state.lt), [0.07, T1.lt])

    obs = np.zeros((2, 13 + 3 * 2 * 5), np.float32)
    obs[:, 2] = 0.55  # height
    obs[:, 3] = np.cos(0.15)  # pitch-tilted quaternion (w, x, y, z)
    obs[:, 5] = np.sin(0.15)
    ctrl.set_command(np.zeros((2, 3), np.float32),
                     np.full(2, 0.55, np.float32))
    ctrl.update_state(obs)
    ctrl.run_mpc()
    grf = np.asarray(ctrl.grf_world)  # (2, 12)
    # Same observation, different foot geometry -> different pitch moments.
    assert np.abs(grf[0, [7, 10]] - grf[1, [7, 10]]).max() > 1e-3
    # Both envs respect their own lever bound (-lt*fz <= my <= lh*fz); the
    # pitch disturbance binds the toe row at exactly -lt*fz per env.
    for e, (lt, lh) in enumerate(((0.07, 0.04), (T1.lt, T1.lh))):
        for fz_i, my_i in ((2, 7), (5, 10)):
            fz, my = grf[e, fz_i], grf[e, my_i]
            assert my <= lh * fz + 1e-3 and my >= -lt * fz - 1e-3
        np.testing.assert_allclose(
            grf[e, [7, 10]], -lt * grf[e, [2, 5]], rtol=0.05
        )
