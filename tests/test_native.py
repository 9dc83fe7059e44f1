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
