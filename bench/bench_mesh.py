"""Weak-scaling evidence for the env-batch mesh sharding (VERDICT item 3).

The hot path has ZERO inter-chip communication by construction
(`parallel/mesh.py`: per-env solves are independent; collectives exist only
in `metrics_summary`), so scaling should be ~100%. This measures it instead
of asserting it: for each device count N in --devices, a SUBPROCESS (device
count is fixed at backend init) runs the full sharded `run_mpc` step over an
N-device mesh with a FIXED per-device batch (weak scaling), on virtual CPU
devices (`--xla_force_host_platform_device_count`, the same harness the
multichip tests and the driver dryrun use). The real-TPU per-chip anchor is
`bench.py` / BENCH.md.

Usage:
  python bench_mesh.py [--per-device-batch 64] [--devices 1,2,4,8]
Prints one JSON line per device count plus a summary line with parallel
efficiency vs the 1-device run.
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import argparse
import json
import os
import subprocess
import sys


def child(n_dev: int, per_dev: int, chain: int,
          solver: str = "ric") -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import time

    import numpy as np
    import jax.numpy as jnp

    from biped_pympc_tpu import ControllerConf, MPCConf
    from biped_pympc_tpu.control.controller import BipedControllerCore
    from biped_pympc_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) == n_dev, (jax.devices(), n_dev)
    batch = n_dev * per_dev
    # Default: the pure-JAX two-level backend under GSPMD. --solver
    # pallas_* routes the SHIPPED Pallas kernel through shard_map instead
    # (see parallel/mesh.controller_step: no GSPMD partitioning rule
    # exists for a pallas_call); on these virtual CPU devices the kernel
    # runs under the Pallas interpreter, so its --solver timings measure
    # interpreter overhead, not the TPU kernel — use it for the
    # structural sharding evidence (per-shard kernel + zero collectives),
    # and bench.py on hardware for the per-chip rate.
    core = BipedControllerCore(
        ControllerConf(), MPCConf(solver=solver, verbose=False), gait_id=2
    )
    state = core.init_state(batch)
    rng = np.random.default_rng(0)
    num_dof = core.num_dof
    obs = np.zeros((batch, 13 + 6 * num_dof), dtype=np.float32)
    obs[:, 2] = 0.55
    obs[:, 3] = 1.0
    q0 = np.array([0.0, 0.0, 0.45, -0.9, 0.45], dtype=np.float32)
    obs[:, 13: 13 + num_dof] = q0
    obs[:, 13 + num_dof: 13 + 2 * num_dof] = q0
    state = core.set_command(
        state,
        jnp.asarray(rng.uniform(-0.3, 0.3, (batch, 3)).astype(np.float32)),
        jnp.full((batch,), 0.55, dtype=jnp.float32),
    )
    state = core.ingest_state(state, jnp.asarray(obs))
    state = state._replace(
        gait_phase=jnp.asarray(rng.uniform(0, 1, batch).astype(np.float32))
    )

    mesh = pmesh.make_mesh()
    state = pmesh.shard_state(state, mesh)

    def chained_body(st):
        def body(s, _):
            s2, out = core.run_mpc(s)
            return s2, out.grf_world[:, 2].sum()
        _, outs = jax.lax.scan(body, st, None, length=chain)
        return outs

    if solver.startswith("pallas"):
        # shard_map route (the blessed Pallas multi-chip path): each
        # device's kernel runs on its own shard by construction.
        from jax.sharding import PartitionSpec as P

        spec = P(pmesh.DATA_AXIS)
        wrap = lambda f, out_specs: jax.jit(
            pmesh.shard_map_compat(f, mesh, spec, out_specs))
        chained = wrap(chained_body, spec)
        bare_step = wrap(lambda s: core.run_mpc(s), spec)
    else:
        chained = jax.jit(chained_body)
        bare_step = jax.jit(lambda s: core.run_mpc(s))

    # Structural communication-freedom evidence: the compiled SPMD module
    # for the bare sharded MPC step (assembly + batched PDIPM + postprocess,
    # no harness reductions) must contain ZERO cross-device collectives
    # (per-env solves are independent; parallel/mesh.py reduces only
    # metrics). This is the property that makes real multi-chip scaling
    # linear — checkable even where the host lacks the cores to demonstrate
    # it (virtual CPU devices share physical cores; the timing harness's
    # own scalar sync-sum does introduce an all-reduce, excluded here).
    hlo = bare_step.lower(state).compile().as_text()
    n_coll = sum(hlo.count(op) for op in
                 ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all"))

    np.asarray(chained(state))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(state))
        times.append((time.perf_counter() - t0) / chain)
    p50 = float(np.median(times))
    print(json.dumps({
        "devices": n_dev, "per_device_batch": per_dev, "batch": batch,
        "solver": solver,
        "ms_per_solve": round(1e3 * p50, 2),
        "solves_per_s": round(batch * (20 / 5.0) / p50, 1),
        "hot_path_collectives": n_coll,
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=64)
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--solver", type=str, default="ric",
                    help="MPCConf.solver; pallas_* routes through shard_map "
                         "(interpret-mode kernels on CPU devices)")
    ap.add_argument("--child", type=int, default=0)
    args = ap.parse_args()

    if args.child:
        child(args.child, args.per_device_batch, args.chain, args.solver)
        return

    from bench_common import make_emitter

    emit = make_emitter("bench_mesh", vars(args))
    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(n),
             "--per-device-batch", str(args.per_device_batch),
             "--chain", str(args.chain), "--solver", args.solver],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(out.stdout, out.stderr, file=sys.stderr)
            raise SystemExit(f"child {n} failed")
        row = json.loads(line[-1])
        rows.append(row)
        emit(row)

    base = rows[0]["solves_per_s"] / rows[0]["devices"]
    emit({
        "weak_scaling": [
            {
                "devices": r["devices"],
                "solves_per_s": r["solves_per_s"],
                "efficiency": round(
                    r["solves_per_s"] / (r["devices"] * base), 4),
            }
            for r in rows
        ],
        "host_physical_cores": os.cpu_count(),
        "note": "virtual CPU devices share physical cores: efficiency is "
                "meaningful only up to the core count; the structural "
                "claim is hot_path_collectives == 0 (zero cross-device "
                "communication compiled into the sharded step).",
    })


if __name__ == "__main__":
    main()
