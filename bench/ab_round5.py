"""Round-5 A/B: extended-precision (double-float) refinement residuals.

VERDICT item 3: the round-4 "f32 information limit" conclusion for the
randomized accuracy tail was reached without trying the one standard
mixed-precision lever — refinement residuals computed in ~2x working
precision. `PdipmOptions.refine_residual="df"` (ops/df.py + the kernel
port in ops/pdipm_pallas.py) computes every refinement residual component
as one compensated linear combination; this harness measures it on the
SHIPPED path (fused pallas_ric_aug foot-split kernel, f32, real TPU):

  Phase A: stress-8 set (b256 tiled) + fully randomized b4096
           (`bench_common.make_qp_batch_randomized`), refine_steps x
           residual-precision grid, GRF (u0) error vs the f64 golden
           (CPU pure-JAX ric_aug f64, ~2e-9 from the NumPy rule solver),
           plus chained-solve timing for the df overhead.
  Phase B: trajectory isolation on the worst randomized tail envs —
           kernel-f32 vs f64 iterate distance per Newton iteration
           (1-iteration warm-started launches), to attribute the
           divergence (discrete FTB/pivot event vs accumulated rounding).

Appends results/ab_round5.jsonl.
Usage: python bench/ab_round5.py [--batch 4096] [--phase A|B|AB]
"""
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]

import argparse
import time

import numpy as np

from bench_common import make_emitter, make_qp_batch, make_qp_batch_randomized

NU0 = 120


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--phase", default="AB")
    ap.add_argument("--worst", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    emit = make_emitter("ab_round5", {"batch": args.batch})

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    def golden_u(qp_batch):
        """f64 golden u0 on CPU (pure-JAX ric_aug, rule-exact vs NumPy).

        x64 is scoped here — enabling it globally changes the kernel's
        pivot argmax index dtype to int64, which Mosaic cannot lower.
        """
        with jax.enable_x64(True):
            qp64 = jax.tree.map(
                lambda a: jax.device_put(
                    jnp.asarray(np.asarray(a), jnp.float64), cpu), qp_batch)
            with jax.default_device(cpu):
                sol = jax.jit(jax.vmap(lambda q: pdipm.solve(
                    q, pdipm.PdipmOptions(backend="ric_aug"))))(qp64)
            return np.asarray(sol.x)[:, NU0:NU0 + 12]

    def base_opts(**kw):
        # The production kernel configuration (controller defaults).
        return pdipm.PdipmOptions(backend="ric_aug", foot_split=True, **kw)

    VARIANTS = {
        "r0": base_opts(refine_steps=0),
        "r1_f32": base_opts(refine_steps=1),
        "r1_df": base_opts(refine_steps=1, refine_residual="df"),
        "r2_f32": base_opts(refine_steps=2),
        "r2_df": base_opts(refine_steps=2, refine_residual="df"),
        "r3_df": base_opts(refine_steps=3, refine_residual="df"),
    }

    def run_variant(qp_batch, opts, timeit=False):
        qp32 = jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(np.asarray(a), jnp.float32),
                                     tpu), qp_batch)
        fn = jax.jit(lambda q: pdipm_pallas.solve(q, opts))
        sol = jax.block_until_ready(fn(qp32))
        ms = None
        if timeit:
            t0 = time.perf_counter()
            for _ in range(3):
                sol = jax.block_until_ready(fn(qp32))
            ms = 1e3 * (time.perf_counter() - t0) / 3
        return np.asarray(sol.x)[:, NU0:NU0 + 12], ms

    if "A" in args.phase:
        stress = make_qp_batch(256)
        gold8 = golden_u(jax.tree.map(lambda a: a[:8], stress))
        datasets = [("stress256", stress, np.tile(gold8, (32, 1)))]
        rnd = make_qp_batch_randomized(args.batch)
        datasets.append(("randomized", rnd, golden_u(rnd)))

        for setname, qpb, gold in datasets:
            for vname, opts in VARIANTS.items():
                u, ms = run_variant(qpb, opts, timeit=(setname == "randomized"))
                err = np.abs(u - gold)
                per_env = err.max(axis=1)
                emit({
                    "phase": "A", "set": setname, "variant": vname,
                    "max_N": round(float(err.max()), 4),
                    "p95_env_N": round(float(np.percentile(per_env, 95)), 5),
                    "p99_env_N": round(float(np.percentile(per_env, 99)), 4),
                    "n_gt_1N": int((per_env > 1.0).sum()),
                    "n_gt_01N": int((per_env > 0.1).sum()),
                    "n_env": len(per_env),
                    **({"solve_ms": round(ms, 2)} if ms else {}),
                })

    if "B" in args.phase:
        rnd = make_qp_batch_randomized(args.batch)
        gold = golden_u(rnd)
        opts32 = VARIANTS["r1_f32"]
        qp32 = jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(np.asarray(a), jnp.float32),
                                     tpu), rnd)
        sol = jax.block_until_ready(
            jax.jit(lambda q: pdipm_pallas.solve(q, opts32))(qp32))
        per_env = np.abs(np.asarray(sol.x)[:, NU0:NU0 + 12] - gold).max(axis=1)
        worst = np.argsort(per_env)[-args.worst:][::-1]
        emit({"phase": "B", "worst_envs": worst.tolist(),
              "worst_err_N": [round(float(per_env[i]), 3) for i in worst]})

        # 1-iteration warm-started launches: kernel f32 (TPU) vs pure-JAX
        # f64 (CPU), tracking iterate distance + complementarity per step.
        # The f32 chunks run first (x64 off — Mosaic needs int32 argmax),
        # then the f64 chain under scoped x64.
        chunk32 = jax.jit(
            lambda q, st: pdipm_pallas.solve(
                q, opts32._replace(iterations=1), state=st))
        for env in worst.tolist():
            q32e = jax.tree.map(lambda a: a[env:env + 1], qp32)
            st32 = None
            traj32 = []
            for k in range(20):
                r32 = jax.block_until_ready(chunk32(q32e, st32))
                st32 = pdipm.PdipmState(r32.x, r32.s, r32.z, r32.y)
                traj32.append((np.asarray(r32.x[0], np.float64),
                               np.asarray(r32.s[0], np.float64),
                               np.asarray(r32.z[0], np.float64)))
            rows = []
            with jax.enable_x64(True):
                o64 = pdipm.PdipmOptions(backend="ric_aug", iterations=1)
                q64e = jax.tree.map(
                    lambda a: jax.device_put(
                        jnp.asarray(np.asarray(a[env]), jnp.float64), cpu),
                    rnd)
                st64 = None
                for k in range(20):
                    with jax.default_device(cpu):
                        r64 = pdipm.solve(q64e, o64, state=st64)
                    st64 = pdipm.PdipmState(r64.x, r64.s, r64.z, r64.y)
                    x32, s32, z32 = traj32[k]
                    x64 = np.asarray(r64.x)
                    du = float(np.abs(
                        x32[NU0:NU0 + 12] - x64[NU0:NU0 + 12]).max())
                    dxm = float(np.abs(x32 - x64).max())
                    mu32 = float(np.sum(s32 * z32) / 160)
                    mu64 = float(np.sum(np.asarray(r64.s)
                                        * np.asarray(r64.z)) / 160)
                    rows.append({"it": k + 1, "du0_N": round(du, 5),
                                 "dx_max": round(dxm, 5),
                                 "mu32": f"{mu32:.3e}",
                                 "mu64": f"{mu64:.3e}"})
            emit({"phase": "B", "env": int(env),
                  "final_err_N": round(float(per_env[env]), 3),
                  "trajectory": rows})


if __name__ == "__main__":
    main()
