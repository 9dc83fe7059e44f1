"""Benchmark: batched SRBD-MPC QP solves/sec/chip (the BASELINE.json metric).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "solves/s", "vs_baseline": R, ...}

Metric definition (BASELINE.json): QP solves/sec/chip at batch 4096, horizon
10, 5 Newton iterations — one "solve" = the work of one launch of the
reference's fused 5-iteration PDIPM CUDA kernel
(`mpc_controller_cusadi.py:28,144`). The full MPC tick runs 20 iterations
(4 launches), so one timed 20-iteration run_mpc = 4 solves per env.

Timing methodology: K MPC solves are CHAINED inside a single jit via
`lax.scan` (each step's state feeds the next), then timed with a forced host
transfer. Per-dispatch host timing on this platform is unreliable (remote
execution pipelining makes same-input dispatches appear ~1000x faster than
the device compute); chaining makes the measured time the real sequential
device time.

vs_baseline is reported against the real-time requirement of the target
deployment (the reference publishes no absolute numbers, `BASELINE.md`):
4096 envs x 100 Hz MPC x 4 launches = 1,638,400 5-iter solves/s. A
vs_baseline of 1.0 means one chip alone sustains the full real-time
batch-4096 workload BASELINE.json budgets for a v5e-16.
"""

import json
import os
import sys
import time

# Shared harness helpers live under bench/ (repo-hygiene move, round 4).
sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench"))

import numpy as np


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        # Before any jax import/backend init: --help must not touch the TPU.
        print("usage: python bench.py [BATCH=4096] [CHAIN_LEN=20] [--mesh]\n\n"
              "Prints one JSON line with qp_solves_per_sec_chip on the "
              "default device.\n--mesh shards the batch over all local "
              "devices (parallel/mesh.py).")
        return

    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.control.controller import BipedControllerCore
    from biped_pympc_tpu.utils.cache import enable_compilation_cache
    from biped_pympc_tpu import ControllerConf, MPCConf

    enable_compilation_cache()  # repeat runs compile in seconds

    use_mesh = "--mesh" in sys.argv
    argv = [a for a in sys.argv if a != "--mesh"]
    batch = int(argv[1]) if len(argv) > 1 else 4096
    # Longer chains amortize the per-dispatch host<->device round-trip
    # (~30 ms on the tunneled runtime): time/step = t_device + overhead/CH.
    # CH=20 keeps the overhead contribution under ~2 ms at any batch.
    chain_len = int(argv[2]) if len(argv) > 2 else 20

    # SHIPPED DEFAULT (round 2): the two-level AUGMENTED kernel with the
    # foot-split stage factorization — robust-accuracy f32 GRFs (max 0.29 N
    # vs f64 golden on the stress QPs, vs 4-65 N tails for the condensed
    # kernels) at 1.23x the round-1 condensed default's cost (47.6 vs
    # 38.8 ms solver-only at b4096; BENCH.md "Round 2"). The speed mode
    # "pallas_ric" (+foot_split) is ~1.6x faster with the documented error
    # tail; pass it as argv[3] to measure. Falls back to the pure-JAX path
    # if the Mosaic compile is unavailable on this runtime.
    solver = argv[3] if len(argv) > 3 else "pallas_ric_aug"
    mpc_cfg = MPCConf(solver=solver, verbose=False)
    core = BipedControllerCore(ControllerConf(), mpc_cfg, gait_id=2)
    state = core.init_state(batch)

    # Realistic domain-randomized walking workload.
    rng = np.random.default_rng(0)
    num_dof = core.num_dof
    obs = np.zeros((batch, 13 + 6 * num_dof), dtype=np.float32)
    obs[:, 2] = 0.55 + rng.uniform(-0.02, 0.02, batch)
    obs[:, 3] = 1.0
    q0 = np.array([0.0, 0.0, 0.45, -0.9, 0.45], dtype=np.float32)
    obs[:, 13: 13 + num_dof] = q0 + rng.uniform(-0.05, 0.05, (batch, num_dof))
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

    mesh = None
    if use_mesh:
        # Shard the env batch over every visible chip (parallel/mesh.py):
        # per-env solves are independent, so the sharded step has zero
        # inter-chip communication and the measured rate is the aggregate
        # of the whole slice. On a 1-chip runtime this is a no-op.
        from biped_pympc_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh()
        state = pmesh.shard_state(state, mesh)
        n_dev = len(jax.devices())
        assert batch % n_dev == 0, f"batch {batch} % devices {n_dev} != 0"

    def chain_body(st):
        def body(s, _):
            s2, out = core.run_mpc(s)
            return s2, out.grf_world[:, 2].sum()
        _, outs = jax.lax.scan(body, st, None, length=chain_len)
        return outs

    if mesh is not None and mpc_cfg.solver.startswith("pallas"):
        # The blessed Pallas multi-chip route (parallel/mesh.controller_step
        # rationale): shard_map runs the kernel per device on its own batch
        # shard — GSPMD has no partitioning rule for a pallas_call, so the
        # plain-jit route could silently replicate it at full batch.
        from jax.sharding import PartitionSpec as P

        spec = P(pmesh.DATA_AXIS)
        chain = jax.jit(pmesh.shard_map_compat(chain_body, mesh, spec, spec))
    else:
        chain = jax.jit(chain_body)

    t0 = time.perf_counter()
    try:
        _ = np.asarray(chain(state))  # compile + first run
    except Exception as e:  # pragma: no cover - runtime-specific
        print(f"# pallas path failed ({type(e).__name__}); falling back "
              "to the pure-JAX solver", file=sys.stderr)
        mesh = None  # the fallback runs unsharded: label it as 1-device
        mpc_cfg = MPCConf(solver="tridiag_aug", verbose=False)
        core = BipedControllerCore(ControllerConf(), mpc_cfg, gait_id=2)
        state = core.init_state(batch)
        state = core.set_command(
            state,
            jnp.asarray(rng.uniform(-0.3, 0.3, (batch, 3)).astype(np.float32)),
            jnp.full((batch,), 0.55, dtype=jnp.float32),
        )
        state = core.ingest_state(state, jnp.asarray(obs))
        state = state._replace(
            gait_phase=jnp.asarray(rng.uniform(0, 1, batch).astype(np.float32))
        )

        chain = jax.jit(chain_body)
        _ = np.asarray(chain(state))
    compile_s = time.perf_counter() - t0

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chain(state))
        times.append((time.perf_counter() - t0) / chain_len)
    p50 = float(np.median(times))  # seconds per one batched 20-iter solve

    launches_per_run = mpc_cfg.newton_iterations / 5.0  # 5-iter solve units
    solves_per_sec = batch * launches_per_run / p50
    realtime_requirement = 4096 * 100 * 4

    n_dev = len(jax.devices()) if mesh is not None else 1
    tag = f"_x{n_dev}chips" if n_dev > 1 else ""
    result = {
        "metric": f"qp_solves_per_sec_chip_b{batch}_h10_5iter{tag}",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / realtime_requirement, 4),
        "extra": {
            "p50_latency_ms_20iter_batch": round(1e3 * p50, 3),
            "batch": batch,
            "devices": n_dev,
            "newton_iterations": mpc_cfg.newton_iterations,
            "chain_len": chain_len,
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
            "solver": mpc_cfg.solver,
            "note": "chained-scan timing; vs_baseline = rate / (4096 envs x "
                    "100 Hz x 4 launches), the real-time requirement "
                    "BASELINE.json budgets for a v5e-16. Default solver: "
                    "the ROBUST-accuracy augmented foot-split kernel (f32 "
                    "GRF max err 0.29 N vs f64 golden on the stress set). "
                    "Round 4 closed the remaining solver levers as measured "
                    "negatives (BENCH.md round-4 sections): KKT "
                    "equilibration neutral on the robust default, the "
                    "12-wide Riccati core structurally rank-deficient on "
                    "swing feet, the true-KKT hybrid flag no better than "
                    "the stale residual, cyclic reduction removed (slower "
                    "at every horizon). Speed mode with a finiteness "
                    "guarantee is pallas_hybrid (31.3 ms solver-only at "
                    "b4096 = 523k units/s, 100% finite at b32768 "
                    "randomized, NOT robust-accuracy); bare pallas_ric is "
                    "quarantined for randomized domains (0.6-0.7% silent "
                    "NaNs). Round 5 keeps this metric at the reference's "
                    "20-iteration definition and moves performance where "
                    "the reference could not: iterations are config, and "
                    "HECTOR's closed loop is MEASURED viable at 10 of 20 "
                    "(100% upright, 30 s randomized protocol) — solver "
                    "24.0 ms at b4096 (2.0x), whole-rollout RL shape "
                    "1.16M (robust) / 1.50M (hybrid) env-steps/s, "
                    "on-device training 1.35M (BENCH.md round-5). The "
                    "randomized f32 accuracy tail is root-caused as "
                    "non-convergence of the reference's own fixed-"
                    "iteration rule (even at f64), measured via "
                    "compensated double-float refinement residuals + "
                    "trajectory isolation; hybrid counters now observe "
                    "the finiteness guarantee per solve.",
        },
    }
    # Prints the ONE stdout JSON line the driver parses AND appends it to
    # results/bench.jsonl (machine-readable round-over-round artifact).
    from bench_common import make_emitter

    emit = make_emitter("bench", {"argv": sys.argv[1:]})
    emit(result)


if __name__ == "__main__":
    main()
