"""URDF ingestion vs the hand-extracted T1 chain constants.

Closes the round-1 gap: `models/t1.py`'s chain constants were transcribed by
hand from the reference's `model/t1_serial.urdf`; `models/urdf.py` derives
them mechanically (the role of the reference's Pinocchio pipeline,
`casadi/t1_kinematics.py:24-54`), so a third robot is addable without
hand-derivation. These tests pin the two sources against each other.

Round-3 close of "What's missing" item 1: the tests run against the
VENDORED kinematics-only fixture (`models/assets/t1_kinematics.urdf`,
derived by `tools/derive_urdf_fixture.py`), so a standalone checkout gets
full parser coverage; when the reference tree is mounted, the fixture and
the original asset are additionally cross-checked to be chain-identical.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from biped_pympc_tpu.models import t1
from biped_pympc_tpu.models.chain import (
    forward_kinematics, geometric_jacobian,
)
from biped_pympc_tpu.models.urdf import T1_FIXTURE_URDF, chain_from_urdf

REFERENCE_URDF = "/root/reference/model/t1_serial.urdf"

_TIPS = ("left_foot_sole_link", "right_foot_sole_link")


def _fixture_chain(leg: int):
    return chain_from_urdf(
        T1_FIXTURE_URDF, "Trunk", _TIPS[leg], locked=("Waist",)
    )


@pytest.mark.parametrize("leg", [0, 1])
def test_urdf_chain_matches_hand_constants(leg):
    got = _fixture_chain(leg)
    want = t1._CHAINS[leg]
    assert got.axes == want.axes == "yxzyyx"
    np.testing.assert_allclose(got.base_offset, want.base_offset, atol=0)
    np.testing.assert_allclose(got.joint_offsets, want.joint_offsets, atol=0)
    np.testing.assert_allclose(got.tip_offset, want.tip_offset, atol=0)


@pytest.mark.parametrize("leg", [0, 1])
def test_urdf_chain_fk_jacobian_agree(leg):
    """FK + LOCAL_WORLD_ALIGNED Jacobian through both chain sources."""
    chain_u = _fixture_chain(leg)
    chain_h = t1._CHAINS[leg]
    rng = np.random.default_rng(11 + leg)
    for _ in range(4):
        q = jnp.asarray(rng.uniform(-1.0, 1.0, size=6))
        p_u, _ = forward_kinematics(chain_u, q)
        p_h, _ = forward_kinematics(chain_h, q)
        np.testing.assert_allclose(np.asarray(p_u), np.asarray(p_h), atol=1e-12)
        j_u = geometric_jacobian(chain_u, q)
        j_h = geometric_jacobian(chain_h, q)
        np.testing.assert_allclose(np.asarray(j_u), np.asarray(j_h), atol=1e-12)


def test_urdf_rejects_out_of_class_chains():
    """Arm chains carry rpy != 0 origins — must raise, not mis-model."""
    with pytest.raises(ValueError, match="rpy"):
        chain_from_urdf(T1_FIXTURE_URDF, "Trunk", "left_hand_link")


def test_urdf_dead_end_raises():
    with pytest.raises(ValueError, match="no joint chain"):
        chain_from_urdf(
            T1_FIXTURE_URDF, "left_hand_link", "right_foot_sole_link"
        )


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_URDF), reason="reference URDF not mounted"
)
@pytest.mark.parametrize("leg", [0, 1])
def test_vendored_fixture_matches_reference_asset(leg):
    """When the reference tree is mounted, the derived fixture must parse
    to exactly the same serial chains as the full original asset."""
    got = _fixture_chain(leg)
    ref = chain_from_urdf(
        REFERENCE_URDF, "Trunk", _TIPS[leg], locked=("Waist",)
    )
    assert got.axes == ref.axes
    np.testing.assert_allclose(got.base_offset, ref.base_offset, atol=0)
    np.testing.assert_allclose(got.joint_offsets, ref.joint_offsets, atol=0)
    np.testing.assert_allclose(got.tip_offset, ref.tip_offset, atol=0)
