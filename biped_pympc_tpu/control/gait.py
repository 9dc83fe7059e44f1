"""Phase-based gait generation — pure functions over per-env gait state.

Functional re-expression of the reference's `GaitGenerator`
(`/root/reference/biped_pympc/core/gait/gait_generator.py:3-252`): the only
mutable state is the scalar gait phase per env; everything else is a pure
function of (phase, durations, dt_mpc). All functions are single-env and
vmapped by the controller; durations are int32 *MPC steps*, per env, so
heterogeneous gaits across a batch jit cleanly (data-dependent, never
shape-dependent).

Gait layout over one cycle (`gait_generator.py:24-31`):
  phase 0 .. ssp[1]:            right swing  (left stance)
  .. + dsp[0]:                  double support
  .. + ssp[0]:                  left swing   (right stance)
  .. + dsp[1]:                  double support
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class GaitParams(NamedTuple):
    """Per-env durations in MPC steps (int32), shape (2,) = [left, right]."""

    dsp_steps: jnp.ndarray  # (2,)
    ssp_steps: jnp.ndarray  # (2,)

    @property
    def cycle_steps(self) -> jnp.ndarray:
        """Total gait cycle length in MPC steps (`gait_generator.py:52`)."""
        return jnp.sum(self.dsp_steps + self.ssp_steps)

    @property
    def swing_steps(self) -> jnp.ndarray:
        """Per-foot swing durations (`gait_generator.py:61-64`)."""
        return jnp.stack([self.ssp_steps[0], self.ssp_steps[1]])

    @property
    def stance_steps(self) -> jnp.ndarray:
        """Per-foot stance durations (`gait_generator.py:56-59`)."""
        tot_dsp = jnp.sum(self.dsp_steps)
        return jnp.stack(
            [self.ssp_steps[1] + tot_dsp, self.ssp_steps[0] + tot_dsp]
        )


def standing_gait(dtype=jnp.int32) -> GaitParams:
    """gait_id 1 (`biped_controller.py:26-28`): dsp=[5,5], ssp=[0,0]."""
    return GaitParams(
        dsp_steps=jnp.asarray([5, 5], dtype), ssp_steps=jnp.asarray([0, 0], dtype)
    )


def walking_gait(dsp: int, ssp: int, dtype=jnp.int32) -> GaitParams:
    """gait_id 2 (`biped_controller.py:29-32`)."""
    return GaitParams(
        dsp_steps=jnp.asarray([dsp, dsp], dtype),
        ssp_steps=jnp.asarray([ssp, ssp], dtype),
    )


def _phase_fracs(p: GaitParams, dtype):
    cycle = p.cycle_steps.astype(dtype)
    ssp = p.ssp_steps.astype(dtype) / cycle
    dsp = p.dsp_steps.astype(dtype) / cycle
    return ssp, dsp


def _safe_div(num, den):
    return num / jnp.where(den != 0, den, 1.0)


def swing_duration_sec(p: GaitParams, dt_mpc: jnp.ndarray) -> jnp.ndarray:
    """(2,) per-foot swing duration in seconds (`gait_generator.py:74`)."""
    return p.swing_steps.astype(dt_mpc.dtype) * dt_mpc


def gait_duration_sec(p: GaitParams, dt_mpc: jnp.ndarray) -> jnp.ndarray:
    return p.cycle_steps.astype(dt_mpc.dtype) * dt_mpc


def advance_phase(phase: jnp.ndarray, p: GaitParams, dt: float,
                  dt_mpc: jnp.ndarray) -> jnp.ndarray:
    """phi += dt / gait_sec, wrap when phi > 1 (`gait_generator.py:82-90`)."""
    phase = phase + dt / gait_duration_sec(p, dt_mpc)
    return phase - (phase > 1.0).astype(phase.dtype)


def contact_sub_phase(phase: jnp.ndarray, p: GaitParams) -> jnp.ndarray:
    """(2,) contact sub-phase; -1 when the foot is swinging.

    Exact mask structure of `gait_generator.py:101-139` (including its use of
    ssp[0] in the left-foot threshold, which assumes a symmetric gait).
    """
    dtype = phase.dtype
    ssp, dsp = _phase_fracs(p, dtype)

    th1 = ssp[0] + dsp[0]
    th2 = th1 + ssp[1]
    left = jnp.where(
        phase < th1,
        _safe_div(phase, th1),
        jnp.where(phase >= th2, _safe_div(phase - th2, dsp[0]), -1.0),
    )

    rth = ssp[1]
    right = jnp.where(
        phase >= rth,
        _safe_div(phase - rth, dsp[0] + ssp[1] + dsp[1]),
        -1.0,
    )
    return jnp.stack([left, right])


def swing_sub_phase(phase: jnp.ndarray, p: GaitParams) -> jnp.ndarray:
    """(2,) swing sub-phase; -1 when the foot is in stance
    (`gait_generator.py:141-171`)."""
    dtype = phase.dtype
    ssp, dsp = _phase_fracs(p, dtype)

    l_start = ssp[1] + dsp[0]
    l_end = l_start + ssp[0]
    left = jnp.where(
        (phase >= l_start) & (phase < l_end),
        _safe_div(phase - l_start, ssp[0]),
        -1.0,
    )
    right = jnp.where(phase < ssp[1], _safe_div(phase, ssp[1]), -1.0)
    return jnp.stack([left, right])


def contact_bool(phase: jnp.ndarray, p: GaitParams) -> jnp.ndarray:
    """(2,) bool (`gait_generator.py:178-194`)."""
    return contact_sub_phase(phase, p) != -1.0


def swing_bool(phase: jnp.ndarray, p: GaitParams) -> jnp.ndarray:
    """(2,) bool (`gait_generator.py:197-213`)."""
    return swing_sub_phase(phase, p) != -1.0


def mpc_contact_table(phase: jnp.ndarray, p: GaitParams, horizon: int) -> jnp.ndarray:
    """(horizon, 2) int32 contact table for the MPC horizon.

    Bins future MPC steps into the 4 gait phases (`gait_generator.py:215-252`).
    """
    cycle = p.cycle_steps
    step0 = (phase * cycle.astype(phase.dtype)).astype(jnp.int32)
    steps = (step0 + jnp.arange(horizon, dtype=jnp.int32)) % cycle
    ssp1 = p.ssp_steps[1]
    dsp0 = p.dsp_steps[0]
    ssp0 = p.ssp_steps[0]
    phase1 = steps < ssp1  # left stance, right swing
    phase3 = (steps >= ssp1 + dsp0) & (steps < ssp1 + dsp0 + ssp0)  # left swing
    left = (~phase3).astype(jnp.int32)
    right = (~phase1).astype(jnp.int32)
    return jnp.stack([left, right], axis=1)
