"""Multi-chip scaling: env-batch sharding over a TPU device mesh.

The reference is single-process single-GPU (`SURVEY.md` section 2: no
distributed backend exists to port). The TPU-native scaling design, per
BASELINE.json: the environment batch is the parallel axis — shard it across
every chip of a slice with `jax.sharding`, keep all per-env state resident
(sharded the same way), and reduce only scalar metrics with `psum`-style
collectives over ICI. DCN is touched only by the host fan-out that jax
runtime already performs for multi-host meshes.

Because each env's MPC solve is independent, the sharded step has zero
inter-chip communication in the hot path — the collectives appear only in
`metrics_summary`, so scaling is linear by construction and the design goal
is purely per-chip throughput.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices with the env-batch axis."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env-batch) axis; replicate nothing else."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Place every leaf of a controller-state pytree with its batch axis
    sharded across the mesh."""
    sharding = batch_sharding(mesh)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(place, state)


def sharded_step(step_fn, mesh: Mesh):
    """Wrap a batched pure step (state, *args) -> out so inputs/outputs keep
    batch-axis sharding. jit + sharding constraints: XLA partitions the whole
    step SPMD across the mesh; no collectives are introduced because the
    computation is element-wise in the batch axis."""
    sharding = batch_sharding(mesh)

    @functools.wraps(step_fn)
    def wrapped(state, *args):
        state = jax.lax.with_sharding_constraint(state, sharding)
        return step_fn(state, *args)

    return jax.jit(wrapped)


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """`jax.shard_map` with replication/VMA checking off, across jax
    versions (check_vma on >= 0.7, check_rep before) — required for
    bodies containing `pallas_call` (its outputs carry no VMA metadata).
    Shared by the bench harnesses; `shard_map_step` uses the same logic.
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax spelling
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def shard_map_step(step_fn, mesh: Mesh, with_metrics: bool = True):
    """Explicit-SPMD wrapper via `shard_map`: each device runs `step_fn` on
    its shard of the env batch (all pytree leaves split on their leading
    axis). Because per-env MPC solves are independent, the step body contains
    no collectives; global scalar metrics are reduced with `pmean` over ICI
    when `with_metrics` (the only cross-chip traffic in the system).

    step_fn: (state, *args) -> (state, aux...) with aux[-1 if with_metrics]
    expected to be a per-env (local_B,) cost-like array whose global mean is
    returned alongside. Complements `sharded_step` (the GSPMD variant) with
    the collectives spelled out.
    """
    spec = P(DATA_AXIS)

    def body(state, *args):
        out = step_fn(state, *args)
        if not with_metrics:
            # A per-shard (4,) HybridStats counter leaf has NO valid
            # batch-sharded out_spec: the P(DATA_AXIS) prefix would stitch
            # the shards into a (4*n_devices,) array whose first four
            # entries are silently shard 0's counts (review finding,
            # round 5). The counters are an opt-in metric — strip them in
            # the metrics-free path at the HELPER level so every caller
            # (not just controller_step) is safe.
            if (isinstance(out, tuple) and len(out) == 3
                    and getattr(out[2], "hybrid_counts", None) is not None):
                out = (out[0], out[1],
                       out[2]._replace(hybrid_counts=None))
            return out
        # out = (new_state, tau, mpc_out) with mpc_out.cost (local_B,)
        new_state, tau, mpc_out = out
        global_mean_cost = jax.lax.pmean(
            jnp.mean(mpc_out.cost), axis_name=DATA_AXIS
        )
        if mpc_out.hybrid_counts is not None:
            # Hybrid observability counters are per-SHARD (each device's
            # solve_hybrid sees only its shard); psum them into global
            # counts and move them out of mpc_out (whose leaves are
            # batch-sharded, the wrong out_spec for a replicated (4,)
            # vector).
            counts = jax.lax.psum(
                mpc_out.hybrid_counts, axis_name=DATA_AXIS)
            mpc_out = mpc_out._replace(hybrid_counts=None)
            return new_state, tau, mpc_out, (global_mean_cost, counts)
        return new_state, tau, mpc_out, global_mean_cost

    out_specs = (spec, spec, spec, P()) if with_metrics else spec
    return jax.jit(shard_map_compat(body, mesh, spec, out_specs))


def controller_step(core, mesh: Mesh, with_metrics: bool = False):
    """The blessed sharded control step for a `BipedControllerCore`.

    Pure-JAX solver backends go through GSPMD (`sharded_step`) when
    `with_metrics=False`: the whole step is elementwise in the batch
    axis, so XLA partitions it with zero collectives (verified by the
    HLO check in `bench_mesh.py`). With `with_metrics=True` EVERY
    backend routes through `shard_map` — the `pmean` metric reduction
    needs a named mesh axis, which only shard_map provides.

    The Pallas kernel backends go through `shard_map` instead: a
    `pallas_call` lowers to a TPU custom call for which GSPMD has no
    partitioning rule, so under a plain sharding constraint XLA may
    replicate the kernel at FULL batch on every device (or fail to
    propagate the sharding) — exactly the failure the zero-collective
    check cannot see because it never compiles the kernel. The per-device
    `shard_map` body sidesteps the question by construction: each device
    runs the kernel on its own batch shard (`pallas_call` grid
    batch/tile per shard), which is the behavior sharding is meant to
    buy. Equivalence is pinned by
    `tests/test_controller.py::test_sharded_pallas_step_matches_single_device`
    and exercised by the driver dryrun (`__graft_entry__.dryrun_multichip`).
    """
    # (The per-shard hybrid counters are stripped by shard_map_step itself
    # in the metrics-free path — opt-in psum'd metric with with_metrics.)
    fn = lambda st, o, tw, h: core.control_step(st, o, tw, h)
    if core.mpc_cfg.solver.startswith("pallas"):
        return shard_map_step(fn, mesh, with_metrics=with_metrics)
    if with_metrics:
        return shard_map_step(fn, mesh, with_metrics=True)
    return sharded_step(fn, mesh)


def metrics_summary(values: jnp.ndarray, mesh: Mesh):
    """Global scalar metrics over a sharded (B,) array — mean/max/p50.

    The only cross-chip communication in the system: an ICI all-reduce
    materialized by XLA from these reductions.
    """
    sharding = batch_sharding(mesh)

    @jax.jit
    def f(v):
        v = jax.lax.with_sharding_constraint(v, sharding)
        return {
            "mean": jnp.mean(v),
            "max": jnp.max(v),
            "p50": jnp.median(v),
        }

    return f(values)
