"""Batch-sweep benchmark: solves/s vs batch size for each solver method.

Role parity with the reference's benchmark harness
(`/root/reference/biped_pympc/cusadi/run_benchmarks.py:10-96`), which sweeps
batch 1..32768 over {cusadi kernel, torch.vmap, serial CPU, parallel CPU}.
Here the methods are the TPU-native equivalents:

  pallas_ric   - fused Pallas kernel, two-level condensed (shipped default)
  pallas       - fused Pallas kernel, 26-wide Thomas sweep
  xla          - pure-JAX vmapped solver, same algorithm ("ric"), XLA-lowered
                 (the torch.vmap-analog interpreter path)

CPU serial / OpenMP baselines live in `bench_cpu.py` (C++,
`native/srbd_mpc_cpu.cpp`) — run that separately on a CPU host.

Prints one JSON line per (method, batch): ms per batched 20-iteration solve
and 5-iteration-solve-units/s (the headline unit, see bench.py). Chained-scan
timing amortizes the per-dispatch host round-trip.

Usage: python bench_sweep.py [--batches 64,256,1024,4096] [--chain 10]
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="64,256,1024,4096")
    p.add_argument("--methods", default="pallas_ric,pallas,xla")
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--horizon", type=int, default=10)
    p.add_argument("--randomized", action="store_true",
                   help="BASELINE config 5 workload: per-env random mu/f_max/"
                        "contact tables/commands (make_qp_batch_randomized) "
                        "instead of the 8 tiled stress QPs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench_common import (
        make_emitter, make_qp_batch, make_qp_batch_randomized,
    )

    emit = make_emitter("bench_sweep", vars(args))

    def timed_chain(qp, solve_fn, chain, reps):
        @jax.jit
        def chained(q):
            def body(carry, _):
                qq = q._replace(f=q.f + 1e-12 * carry)
                res = solve_fn(qq)
                return res.x, ()
            out, _ = jax.lax.scan(body, jnp.zeros_like(q.f), None, length=chain)
            return out[:, 0].sum()

        t0 = time.perf_counter()
        np.asarray(chained(qp))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(qp))
            ts.append((time.perf_counter() - t0) / chain)
        return float(np.median(ts)), compile_s

    methods = {
        # Round-2 shipped default: robust augmented foot-split kernel.
        "pallas_ricaug_split": lambda q: pdipm_pallas.solve(
            q, pdipm.PdipmOptions(backend="ric_aug", refine_steps=1,
                                  foot_split=True)),
        # Speed mode (documented f32 stress tails).
        "pallas_ric_split": lambda q: pdipm_pallas.solve(
            q, pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                  foot_split=True)),
        "pallas_ric": lambda q: pdipm_pallas.solve(
            q, pdipm.PdipmOptions(backend="ric", refine_steps=1)),
        # Round-3 finiteness-guaranteed speed mode (BENCH.md "hybrid
        # flag"): fast foot-split everywhere + auto-budgeted augmented
        # re-solve of the worst-criterion / non-finite envs.
        "pallas_hybrid": lambda q: pdipm_pallas.solve_hybrid(
            q, pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                  foot_split=True),
            budget=0, flag_tol=1.0,
            aug_opts=pdipm.PdipmOptions(backend="ric_aug", refine_steps=1,
                                        foot_split=True)),
        "pallas": lambda q: pdipm_pallas.solve(
            q, pdipm.PdipmOptions(backend="tridiag", refine_steps=1)),
        "xla": jax.vmap(lambda q: pdipm.solve(
            q, pdipm.PdipmOptions(backend="ric", refine_steps=1))),
    }
    # Alias matching the MPCConf.solver spelling of the shipped default.
    methods["pallas_ric_aug"] = methods["pallas_ricaug_split"]

    for batch in [int(b) for b in args.batches.split(",")]:
        if args.randomized:
            qp = make_qp_batch_randomized(batch, horizon=args.horizon)
        else:
            qp = make_qp_batch(batch, horizon=args.horizon)
        for name in args.methods.split(","):
            try:
                t, compile_s = timed_chain(
                    qp, methods[name], args.chain, args.reps)
                extra = {}
                if args.randomized:
                    # Solution-health stats for the domain-randomized run:
                    # finite fraction + stance-force stats of u0.
                    res = jax.jit(methods[name])(qp)
                    u0 = np.asarray(res.x[:, 120:132])
                    finite = np.isfinite(u0).all(axis=1)
                    fz = u0[:, [2, 5]]
                    extra = {
                        "finite_frac": round(float(finite.mean()), 5),
                        "fz_max_N": round(float(fz.max()), 1),
                        "fz_p50_N": round(float(np.median(fz[fz > 1.0])), 1)
                        if (fz > 1.0).any() else 0.0,
                    }
                emit({
                    **extra,
                    "method": name, "batch": batch,
                    "horizon": args.horizon,
                    "workload": "randomized" if args.randomized else "stress8",
                    "ms_per_solve": round(1e3 * t, 3),
                    "solve_units_per_sec": round(batch * 4 / t, 1),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                })
            except Exception as e:  # pragma: no cover - runtime-specific
                emit({
                    "method": name, "batch": batch,
                    "error": f"{type(e).__name__}",
                })


if __name__ == "__main__":
    main()
