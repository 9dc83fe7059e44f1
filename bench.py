"""Benchmark: batched SRBD-MPC QP solves/sec/chip (the BASELINE.json metric).

Prints ONE JSON line:
  {"metric": "qp_solves_per_sec_chip_b4096_h10_5iter", "value": N,
   "unit": "solves/s", "vs_baseline": R, "extra": {...}}

Metric definition (BASELINE.json): QP solves/sec/chip at batch 4096, horizon
10, 5 Newton iterations — one "solve" = one invocation of the fused
5-iteration PDIPM on one env's QP, i.e. exactly the work of one launch of the
reference's mpc_multiple_iter_5_solver CUDA kernel
(`mpc_controller_cusadi.py:28,144`). The reference publishes no hard number
(`BASELINE.md`); vs_baseline is therefore reported against the *real-time
requirement* of the target deployment: 4096 envs x 100 Hz MPC x 4 outer
iterations = 1,638,400 5-iter solves/s. vs_baseline > 1 means one chip alone
sustains the full real-time batch-4096 workload that BASELINE.json budgets
for a v5e-16.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.control import gait, mpc
    from biped_pympc_tpu.control.controller import BipedControllerCore
    from biped_pympc_tpu import ControllerConf, MPCConf

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = 5

    mpc_cfg = MPCConf(newton_iterations=iters)  # default tridiag_aug + refine=1
    core = BipedControllerCore(ControllerConf(), mpc_cfg, gait_id=2)
    state = core.init_state(batch)

    # Realistic walking-state observations with per-env variation.
    rng = np.random.default_rng(0)
    num_dof = core.num_dof
    obs = np.zeros((batch, 13 + 6 * num_dof), dtype=np.float32)
    obs[:, 2] = 0.55 + rng.uniform(-0.02, 0.02, batch)
    obs[:, 3] = 1.0
    q0 = np.array([0.0, 0.0, 0.45, -0.9, 0.45], dtype=np.float32)
    obs[:, 13: 13 + num_dof] = q0 + rng.uniform(-0.05, 0.05, (batch, num_dof))
    obs[:, 13 + num_dof: 13 + 2 * num_dof] = q0
    obs = jnp.asarray(obs)
    twist = jnp.asarray(
        rng.uniform(-0.3, 0.3, (batch, 3)).astype(np.float32)
    )
    height = jnp.full((batch,), 0.55, dtype=jnp.float32)

    state = core.set_command(state, twist, height)
    state = core.ingest_state(state, obs)

    # Desynchronize gait phases across envs (domain-randomized workload).
    state = state._replace(
        gait_phase=jnp.asarray(rng.uniform(0, 1, batch).astype(np.float32))
    )

    run = jax.jit(lambda st: core.run_mpc(st)[1].grf_world)

    # Warmup / compile.
    t0 = time.perf_counter()
    out = run(state)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    reps = 20
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    p50 = float(np.percentile(times, 50))

    # One run_mpc = 20 Newton iterations = 4 fused 5-iter solves per env
    # (reference runtime structure). 5-iter solves/sec:
    solves_per_sec = batch * (mpc_cfg.newton_iterations / 5 or 1) / p50
    # If configured with 5 iterations directly, each run = 1 solve per env.
    realtime_requirement = 4096 * 100 * 4  # 5-iter solves/s for the target

    result = {
        "metric": f"qp_solves_per_sec_chip_b{batch}_h10_5iter",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / realtime_requirement, 4),
        "extra": {
            "p50_latency_ms": round(1e3 * p50, 3),
            "batch": batch,
            "newton_iterations": mpc_cfg.newton_iterations,
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
            "note": "vs_baseline = rate / (4096 envs x 100 Hz x 4 outer iters) "
                    "— the real-time requirement BASELINE.json budgets for a "
                    "v5e-16; reference publishes no absolute numbers.",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
