"""Swing-leg control: Raibert foot placement + cubic Bezier trajectory.

Functional re-expression of the reference's `SwingLegController` and
`SwingLegTrajectory`
(`/root/reference/biped_pympc/controllers/swing_leg_controller.py:9-263`,
`swing_leg_trajectory.py:97-162`). State is an explicit pytree (first-swing
latch, remaining swing time, latched lift-off position); all updates are
masked `jnp.where`, so per-env episodic resets and heterogeneous phases are
data, not control flow. Single-env functions; vmap for the batch.

Both reference frames are supported: "base" (default) plans the swing curve
in the body frame from the measured body-frame foot position; "world" latches
the world-frame foot position, plans in world, and rotates position/velocity
targets back to the body frame (`swing_leg_controller.py:236-258`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Raibert heuristic constants (`swing_leg_controller.py:178-182`).
P_REL_MAX_X = 0.3
P_REL_MAX_Y = 0.3
K_X = 0.03
K_Y = 0.03


class SwingState(NamedTuple):
    """Per-env swing bookkeeping (`swing_leg_controller.py:101-117`)."""

    first_swing: jnp.ndarray  # (2,) bool
    swing_time_remaining: jnp.ndarray  # (2,) seconds
    p0: jnp.ndarray  # (2, 3) latched lift-off foot position (body frame)
    foot_placement_w: jnp.ndarray  # (2, 3) world-frame Raibert target
    foot_placement_b: jnp.ndarray  # (2, 3) body-frame Raibert target


def init_state(dtype=jnp.float32) -> SwingState:
    return SwingState(
        first_swing=jnp.ones(2, dtype=bool),
        swing_time_remaining=jnp.zeros(2, dtype=dtype),
        p0=jnp.zeros((2, 3), dtype=dtype),
        foot_placement_w=jnp.zeros((2, 3), dtype=dtype),
        foot_placement_b=jnp.zeros((2, 3), dtype=dtype),
    )


def reset(state: SwingState, do_reset: jnp.ndarray) -> SwingState:
    """Masked episodic reset: re-arm the first-swing latch
    (`swing_leg_controller.py:281-282`)."""
    return state._replace(
        first_swing=jnp.where(do_reset, True, state.first_swing)
    )


def update_swing_time(
    state: SwingState,
    contact_phase: jnp.ndarray,
    swing_duration: jnp.ndarray,
    dt: float,
) -> SwingState:
    """Remaining-swing-time bookkeeping (`swing_leg_controller.py:146-159`).

    Where first_swing: remaining = duration; else remaining -= dt.
    Feet in contact re-arm the latch.
    """
    remaining = jnp.where(
        state.first_swing, swing_duration, state.swing_time_remaining - dt
    )
    first_swing = jnp.where(contact_phase >= 0, True, state.first_swing)
    return state._replace(
        first_swing=first_swing, swing_time_remaining=remaining
    )


def raibert_placement(
    root_pos: jnp.ndarray,
    rot_body: jnp.ndarray,
    root_vel_w: jnp.ndarray,
    vel_des_w: jnp.ndarray,
    swing_time_remaining: jnp.ndarray,
    hip_positions: jnp.ndarray,
) -> jnp.ndarray:
    """(2, 3) world-frame Raibert foothold (`swing_leg_controller.py:9-61`).

    placement = root + R @ hip + 0.5 v t_remaining + clamp(k (v - v_des)); z=0.
    """
    base = (
        root_pos[None, :]
        + (rot_body @ hip_positions.T).T
        + 0.5 * root_vel_w[None, :] * swing_time_remaining[:, None]
    )
    fb_x = jnp.clip(K_X * (root_vel_w[0] - vel_des_w[0]), -P_REL_MAX_X, P_REL_MAX_X)
    fb_y = jnp.clip(K_Y * (root_vel_w[1] - vel_des_w[1]), -P_REL_MAX_Y, P_REL_MAX_Y)
    fb = jnp.stack([fb_x, fb_y, jnp.zeros_like(fb_x)])
    placement = base + fb[None, :]
    return placement.at[:, 2].set(0.0)


def compute_foot_placement(
    state: SwingState,
    root_pos: jnp.ndarray,
    rot_body: jnp.ndarray,
    root_vel_w: jnp.ndarray,
    vel_des_b: jnp.ndarray,
    hip_positions: jnp.ndarray,
) -> SwingState:
    """Raibert placement in world + body frames
    (`swing_leg_controller.py:161-215`)."""
    vel_des_w = rot_body @ vel_des_b
    placement_w = raibert_placement(
        root_pos, rot_body, root_vel_w, vel_des_w,
        state.swing_time_remaining, hip_positions,
    )
    placement_b = ((placement_w - root_pos[None, :]) @ rot_body)  # R^T (p - r)
    return state._replace(
        foot_placement_w=placement_w, foot_placement_b=placement_b
    )


def cubic_bezier(
    phase: jnp.ndarray,
    swing_time: jnp.ndarray,
    p0: jnp.ndarray,
    pf: jnp.ndarray,
    height: jnp.ndarray,
    cp1: jnp.ndarray,
    cp2: jnp.ndarray,
):
    """Cubic Bezier swing curve with apex-matched z control points.

    Exact port of the math in `swing_leg_trajectory.py:97-136`: cp1/cp2 set
    the xy control points; both z control points are (8 z_apex - z0 - zf)/6 so
    the curve peaks at `height` above p0 at phase 0.5. Returns (p, v); phase
    and swing_time are scalars, p0/pf are (3,).
    """
    p1 = p0 + cp1 * (pf - p0)
    p2 = p0 + cp2 * (pf - p0)
    z_apex = p0[2] + height
    zc = (8.0 * z_apex - p0[2] - pf[2]) / 6.0
    p1 = p1.at[2].set(zc)
    p2 = p2.at[2].set(zc)

    om = 1.0 - phase
    p = om**3 * p0 + 3 * om**2 * phase * p1 + 3 * om * phase**2 * p2 + phase**3 * pf
    v = (
        3 * om**2 * (p1 - p0) + 6 * om * phase * (p2 - p1) + 3 * phase**2 * (pf - p2)
    ) / swing_time
    return p, v


def cycloid(phase, swing_time, p0, pf, height):
    """Alternative cycloid swing curve (`swing_leg_trajectory.py:139-162`)."""
    ph = 2.0 * jnp.pi * phase
    p = (pf - p0) * (ph - jnp.sin(ph)) / (2.0 * jnp.pi) + p0
    v = (pf - p0) * (1.0 - jnp.cos(ph)) / swing_time
    p = p.at[2].set(height * (1.0 - jnp.cos(ph)) / 2.0 + p0[2])
    v = v.at[2].set(height * jnp.pi * jnp.sin(ph) / swing_time)
    return p, v


def compute_foot_desired_position(
    state: SwingState,
    swing_phase: jnp.ndarray,
    contact_phase: jnp.ndarray,
    swing_duration: jnp.ndarray,
    foot_pos_b: jnp.ndarray,
    foot_height: jnp.ndarray,
    cp1: jnp.ndarray,
    cp2: jnp.ndarray,
    curve: str = "bezier",
):
    """Desired swing-foot position/velocity in body frame.

    Mirrors `swing_leg_controller.py:217-263` ("base" frame): latch p0 from
    the measured foot position on the first swing tick, drop the latch while
    swinging, re-arm on contact, then sample the Bezier at the current phase.

    Returns (new_state, p_des (2,3), v_des (2,3)).
    """
    latch = state.first_swing & (swing_phase >= 0)
    p0 = jnp.where(latch[:, None], foot_pos_b, state.p0)

    first_swing = jnp.where(swing_phase >= 0, False, state.first_swing)
    first_swing = jnp.where(contact_phase >= 0, True, first_swing)

    def leg(i):
        ph = jnp.clip(swing_phase[i], 0.0, 1.0)
        if curve == "cycloid":
            return cycloid(
                ph, swing_duration[i], p0[i], state.foot_placement_b[i],
                foot_height,
            )
        return cubic_bezier(
            ph, swing_duration[i], p0[i], state.foot_placement_b[i],
            foot_height, cp1, cp2,
        )

    p_l, v_l = leg(0)
    p_r, v_r = leg(1)
    p_des = jnp.stack([p_l, p_r])
    v_des = jnp.stack([v_l, v_r])
    return state._replace(first_swing=first_swing, p0=p0), p_des, v_des


def compute_foot_desired_position_world(
    state: SwingState,
    swing_phase: jnp.ndarray,
    contact_phase: jnp.ndarray,
    swing_duration: jnp.ndarray,
    foot_pos_w: jnp.ndarray,
    root_pos: jnp.ndarray,
    root_vel_w: jnp.ndarray,
    rot_body: jnp.ndarray,
    foot_height: jnp.ndarray,
    cp1: jnp.ndarray,
    cp2: jnp.ndarray,
    curve: str = "bezier",
):
    """World-frame variant (`swing_leg_controller.py:236-258`): latch the
    world-frame foot position, plan the curve toward the world-frame Raibert
    target, then express targets in the body frame:
        p_b = R^T (p_w - root),  v_b = R^T (v_w - root_vel_w).
    """
    latch = state.first_swing & (swing_phase >= 0)
    p0 = jnp.where(latch[:, None], foot_pos_w, state.p0)

    first_swing = jnp.where(swing_phase >= 0, False, state.first_swing)
    first_swing = jnp.where(contact_phase >= 0, True, first_swing)

    def leg(i):
        ph = jnp.clip(swing_phase[i], 0.0, 1.0)
        if curve == "cycloid":
            return cycloid(
                ph, swing_duration[i], p0[i], state.foot_placement_w[i],
                foot_height,
            )
        return cubic_bezier(
            ph, swing_duration[i], p0[i], state.foot_placement_w[i],
            foot_height, cp1, cp2,
        )

    p_l, v_l = leg(0)
    p_r, v_r = leg(1)
    p_w = jnp.stack([p_l, p_r])  # (2, 3) world
    v_w = jnp.stack([v_l, v_r])
    p_des = (p_w - root_pos[None, :]) @ rot_body  # R^T applied rowwise
    v_des = (v_w - root_vel_w[None, :]) @ rot_body
    return state._replace(first_swing=first_swing, p0=p0), p_des, v_des
