"""Cross-language check: C++ CPU baseline vs golden NumPy vs JAX PDIPM."""

import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biped_pympc_tpu.ops import pdipm

from test_pdipm import _make_qp, T

pytestmark = [
    pytest.mark.slow,  # integration tier: pytest -m slow (builds C++)
    pytest.mark.skipif(
        shutil.which("make") is None or shutil.which("g++") is None,
        reason="native toolchain unavailable",
    ),
]


@pytest.fixture(scope="module")
def native():
    from biped_pympc_tpu import native as nat

    try:
        nat._ensure_built()
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"native build failed: {e.stderr}")
    return nat


def test_native_matches_jax_solver(native):
    """The C++ pipeline (assembly + PDIPM) must agree with the JAX path."""
    contact = np.ones((T, 2))
    contact[2:5, 0] = 0.0
    qps_batch = [
        _make_qp(seed=s, contact=contact, vx=0.2 * s) for s in range(3)
    ]

    # Rebuild the raw inputs the native API takes (mirrors _make_qp).
    B = 3
    rot = np.tile(np.eye(3), (B, 1, 1))
    i_world = np.tile(np.diag([0.5413, 0.52, 0.0691]), (B, 1, 1))
    body_pos = np.tile([0.0, 0.0, 0.55], (B, 1))
    foot_pos = np.tile([[[0.05, 0.08, 0.0], [0.05, -0.08, 0.0]]], (B, 1, 1, 1))[0]
    foot_pos = np.tile([[0.05, 0.08, 0.0], [0.05, -0.08, 0.0]], (B, 1, 1))
    q_w = np.array([150.0, 150, 250, 100, 100, 250, 1, 1, 5, 10, 10, 1])
    r_w = np.full(12, 1e-5)
    r_w[6:] = 1e-4
    x0 = np.zeros((B, 12))
    x_ref = np.zeros((B, T, 12))
    for s in range(B):
        rng = np.random.default_rng(s)
        x0[s] = rng.uniform(-0.05, 0.05, 12)
        x0[s, 5] += 0.5
        x_ref[s, :, 5] = 0.55
        x_ref[s, :, 9] = 0.2 * s

    x_native = native.solve_batch(
        x0, x_ref, np.tile(contact, (B, 1, 1)), rot, i_world, body_pos,
        foot_pos, q_w, r_w, dt_mpc=0.025, mu=1.0, mass=13.856,
        iterations=20, n_threads=0,
    )

    for s in range(B):
        res = pdipm.solve(qps_batch[s], pdipm.PdipmOptions(backend="tridiag"))
        np.testing.assert_allclose(
            x_native[s], np.asarray(res.x), atol=1e-6,
            err_msg=f"env {s} native vs JAX mismatch",
        )


def test_native_openmp_matches_serial(native):
    B = 4
    rng = np.random.default_rng(7)
    rot = np.tile(np.eye(3), (B, 1, 1))
    i_world = np.tile(np.diag([0.5413, 0.52, 0.0691]), (B, 1, 1))
    body_pos = np.tile([0.0, 0.0, 0.55], (B, 1))
    foot_pos = np.tile([[0.05, 0.08, 0.0], [0.05, -0.08, 0.0]], (B, 1, 1))
    q_w = np.array([150.0, 150, 250, 100, 100, 250, 1, 1, 5, 10, 10, 1])
    r_w = np.full(12, 1e-4)
    x0 = rng.uniform(-0.05, 0.05, (B, 12))
    x0[:, 5] += 0.55
    x_ref = np.zeros((B, T, 12))
    x_ref[:, :, 5] = 0.55
    contact = np.ones((B, T, 2))

    kw = dict(dt_mpc=0.025, mu=1.0, mass=13.856, iterations=20)
    serial = native.solve_batch(
        x0, x_ref, contact, rot, i_world, body_pos, foot_pos, q_w, r_w,
        n_threads=0, **kw,
    )
    parallel = native.solve_batch(
        x0, x_ref, contact, rot, i_world, body_pos, foot_pos, q_w, r_w,
        n_threads=-1, **kw,
    )
    np.testing.assert_allclose(parallel, serial, atol=1e-12)


def test_native_t1_contact_geometry_matches_jax(native):
    """lt/lh/f_max as native runtime params (round 5): a T1-geometry QP
    solved by the C++ oracle must match the JAX path given the same
    levers — and differ from the HECTOR-lever solution."""
    import jax.numpy as jnp
    from biped_pympc_tpu.models.robot import T1
    from biped_pympc_tpu.models.srbd import SrbdLin
    from biped_pympc_tpu.ops import qp as qps

    B = 2
    rot = np.tile(np.eye(3), (B, 1, 1))
    i_world = np.tile(T1.i_body, (B, 1, 1))
    body_pos = np.tile([0.0, 0.0, 0.62], (B, 1))
    foot_pos = np.tile([[0.05, 0.12, 0.0], [0.05, -0.12, 0.0]], (B, 1, 1))
    q_w = np.array([150.0, 150, 250, 100, 100, 250, 1, 1, 5, 10, 10, 1])
    r_w = np.full(12, 1e-5)
    r_w[6:] = 1e-4
    rng = np.random.default_rng(11)
    x0 = rng.uniform(-0.05, 0.05, (B, 12))
    x0[:, 1] += 0.2  # pitch disturbance -> line-contact rows bind
    x0[:, 5] += 0.6
    x_ref = np.zeros((B, T, 12))
    x_ref[:, :, 5] = 0.62
    contact = np.ones((B, T, 2))

    kw = dict(dt_mpc=0.025, mu=1.0, mass=T1.mass, iterations=20, n_threads=0)
    x_t1 = native.solve_batch(
        x0, x_ref, contact, rot, i_world, body_pos, foot_pos, q_w, r_w,
        lt=T1.lt, lh=T1.lh, f_max=1450.0, **kw,
    )
    x_hec = native.solve_batch(
        x0, x_ref, contact, rot, i_world, body_pos, foot_pos, q_w, r_w,
        **kw,  # default HECTOR levers
    )
    assert np.abs(x_t1 - x_hec).max() > 1e-2  # geometry is load-bearing

    for s in range(B):
        lin = SrbdLin(
            rot_body=jnp.asarray(rot[s], jnp.float64),
            inertia_world=jnp.asarray(i_world[s], jnp.float64),
            body_pos=jnp.asarray(body_pos[s], jnp.float64),
            foot_pos=jnp.asarray(foot_pos[s], jnp.float64),
            mass=jnp.asarray(T1.mass, jnp.float64),
            residual_lin_accel=jnp.zeros(3, jnp.float64),
            residual_ang_accel=jnp.zeros(3, jnp.float64),
        )
        qp = qps.build_qp(
            lin, jnp.asarray(x0[s], jnp.float64),
            jnp.asarray(x_ref[s], jnp.float64),
            jnp.asarray(contact[s], jnp.float64),
            jnp.asarray(0.025, jnp.float64), jnp.asarray(1.0, jnp.float64),
            jnp.asarray(q_w, jnp.float64), jnp.asarray(r_w, jnp.float64), T,
            "rt_omega", 1450.0, T1.lt, T1.lh,
        )
        res = pdipm.solve(qp, pdipm.PdipmOptions(backend="ric_aug"))
        np.testing.assert_allclose(
            x_t1[s], np.asarray(res.x), atol=1e-5,
            err_msg=f"env {s} native-T1 vs JAX mismatch",
        )
