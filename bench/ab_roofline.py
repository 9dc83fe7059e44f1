"""Speed-of-light analysis for the fused PDIPM kernel (VERDICT item 2).

Three measurements feeding the BENCH.md "speed of light" section:

1. **Empirical VPU f32 roofline**: a Pallas kernel issuing K dependent
   full-array fma passes over a VMEM-resident (256, 512) f32 tile — each
   pass is 128k independent lanes, so the chain measures elementwise fma
   THROUGHPUT, not latency. This is the attainable ceiling for the PDIPM
   kernel, whose every hot op is an elementwise/rank-1 VPU op.
2. **Analytic flop count** of one PDIPM iteration per env (ric / ric_aug,
   dense and foot-split), from the kernel's actual op inventory.
3. **Sustained throughput**: measured ms per 20-iteration batch-4096 solve
   (chained-scan) -> flops/s -> utilization of the measured roofline.

Why the MXU cannot help (structural): every contraction in the solver is
per-env — (n, n, B) x (n, B) batched matvecs and rank-1 eliminations with
B in lanes. An MXU matmul needs one operand SHARED across the batch; the
only shared operands here are constant selectors. Contractions are over
n <= 14 (split: <= 12), so even a hypothetical lane-batched MXU mapping
would run at (n/128)^2 < 1% systolic utilization — below the VPU path.
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import json
import time

import numpy as np


def measure_vpu_roofline():
    """Two empirical f32 fma ceilings bracketing the kernel's op mix.

    * "fma_peak": NACC independent (8, 128) accumulators updated in a
      fori_loop — the carries live in vregs, so this is raw VPU fma issue
      throughput with no VMEM traffic in the loop.
    * "stream": one full-array fma pass per loop iteration over a VMEM-
      resident (256, 512) tile — every op reads 2 operands from / writes 1
      result to VMEM, the all-traffic bound. Real kernel ops sit between
      the two (Mosaic fuses op chains, reusing vregs within e.g. one GJ
      elimination step, but each step still round-trips its tile).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def timed(run_fn, consts, x0, flops_per_call):
        # x feeds through the scan carry so no call can be hoisted.
        @jax.jit
        def chained(consts, x):
            def body(x, _):
                return run_fn(consts, x), ()
            out, _ = jax.lax.scan(body, x, None, length=10)
            return out

        np.asarray(chained(consts, x0))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(chained(consts, x0))
            ts.append(time.perf_counter() - t0)
        return flops_per_call * 10 / float(np.median(ts))

    # --- vreg-resident fma peak: sweep the independent-chain count so
    # dependent-fma latency is hidden; report the best ---
    K1 = 100000
    peak = 0.0
    for nacc in (16, 32, 64, 128):
        def peak_kernel(a_ref, x_ref, o_ref, n=nacc):
            a = a_ref[...]
            xs = tuple(x_ref[8 * i: 8 * (i + 1)] for i in range(n))

            def body(_, xs):
                return tuple(x * a + 1e-7 for x in xs)

            xs = jax.lax.fori_loop(0, K1, body, xs)
            o_ref[...] = jnp.concatenate(xs, axis=0)

        def run_peak(a, x, k=peak_kernel, n=nacc):
            return pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8 * n, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a, x)

        a1 = jnp.asarray(
            rng.uniform(0.999, 1.001, (8, 128)).astype(np.float32))
        x1 = jnp.asarray(
            rng.uniform(0.5, 1.5, (8 * nacc, 128)).astype(np.float32))
        rate = timed(run_peak, a1, x1, 2.0 * nacc * 8 * 128 * K1)
        print(json.dumps({"nacc": nacc,
                          "tflops": round(rate / 1e12, 3)}), flush=True)
        peak = max(peak, rate)

    # --- VMEM streaming ceiling ---
    M, N, K2 = 256, 512, 20000

    def stream_kernel(a_ref, b_ref, x_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]

        def body(_, x):
            return x * a + b

        o_ref[...] = jax.lax.fori_loop(0, K2, body, x_ref[...])

    def run_stream(ab, x):
        return pl.pallas_call(
            stream_kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(ab[0], ab[1], x)

    a2 = jnp.asarray(rng.uniform(0.999, 1.001, (M, N)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(-1e-6, 1e-6, (M, N)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(0.5, 1.5, (M, N)).astype(np.float32))
    stream = timed(run_stream, (a2, b2), x2, 2.0 * M * N * K2)

    return {"fma_peak": peak, "stream": stream}


def flop_model(T=10, refine=1):
    """Per-env per-iteration fma counts from the kernel op inventory.

    Counts one fma as 2 flops; mask/select arithmetic of the in-place GJ
    counted at ~1 extra mul per updated element (measured form). Returns a
    dict per variant.
    """
    NI, NUv, NXv = 16, 12, 12

    def gj(n, stages):  # in-place no-pivot GJ: n steps x (n*n fma + n*n mask)
        return stages * n * (n * n * 2)

    def gj_piv(n, stages):  # pivoted tableau GJ: (n, 2n) tableau + search
        return stages * n * (n * 2 * n * 2 + 3 * n)

    def mm(m, k, n):
        return m * k * n

    def mv(m, n):
        return m * n

    # shared: residuals + operators (g/a/gT/aT/hd) per application set
    resid = 240 + T * (mv(NI, NUv) * 2 + mv(NXv, NXv) * 4) + 3 * T * NI
    op_apply = 240 + T * (mv(NI, NUv) * 2 + mv(NXv, NXv) * 4)

    def tail(kuu_cost_included):  # y-chain build + inverses
        coup = (T - 1) * 2 * mm(12, 12, 12) + mm(12, 12, 12)  # S^T M S + adqad
        return coup + gj(12, T)

    def solve_cost(kinv_apply):
        # fold + 2 sweeps + backsub + x recovery
        sweeps = 2 * T * mv(12, 12) * 2
        return 2 * kinv_apply + sweeps + 2 * T * mv(12, 12) + 4 * T * 12

    out = {}
    # --- ric dense ---
    gtwg = T * NI * mv(12, 12)  # 16 rank-1 (12x12) updates per stage
    bkb = 2 * T * mm(12, 12, 12)
    kfac = gj(14, T)
    kapp = T * mv(14, 14)
    per_solve = solve_cost(kapp)
    n_solves = 2 * (1 + refine)
    n_applies = 2 * refine
    out["ric_dense"] = (resid + gtwg + kfac + bkb + tail(True)
                        + n_solves * per_solve + n_applies * op_apply)
    # --- ric foot-split ---
    gtwg_s = T * (8 * mv(4, 4) * 2)  # per-foot 8 rank-1 (4x4)
    kfac_s = gj(4, 2 * T)
    bkb_s = 2 * T * (mm(12, 4, 4) + mm(12, 4, 12)) + 4 * mv(12, 12)
    kapp_s = 2 * T * mv(4, 4) + 10 * T  # two 4-wide mv + pairs/singles
    out["ric_split"] = (resid + gtwg_s + kfac_s + bkb_s + tail(True)
                        + n_solves * solve_cost(kapp_s)
                        + n_applies * op_apply)
    # --- ric_aug dense (30-wide pivoted) ---
    kfac_a = gj_piv(30, T)
    kapp_a = T * mv(30, 30)
    bkb_a = 2 * T * mm(12, 12, 12)
    out["ricaug_dense"] = (resid + kfac_a + bkb_a + tail(True)
                           + n_solves * solve_cost(kapp_a)
                           + n_applies * op_apply)
    # --- ric_aug foot-split (two 12-wide pivoted) ---
    kfac_as = gj_piv(12, 2 * T)
    kapp_as = 2 * T * mv(12, 12) + 10 * T
    bkb_as = 2 * T * (mm(12, 4, 4) + mm(12, 4, 12)) + 4 * mv(12, 12)
    out["ricaug_split"] = (resid + kfac_as + bkb_as + tail(True)
                           + n_solves * solve_cost(kapp_as)
                           + n_applies * op_apply)
    # Packed forms: identical arithmetic (layout-only change), so the same
    # flop model — their occupancy, not their flops, is what moves.
    out["ric_split_pack"] = out["ric_split"]
    out["ricaug_split_pack"] = out["ricaug_split"]
    return {k: 2 * v for k, v in out.items()}  # fma -> flops


def main():
    import sys

    from bench_common import make_chained, make_emitter, make_qp_batch
    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    emit = make_emitter("ab_roofline", {"argv": sys.argv[1:]})
    ceil = measure_vpu_roofline()
    emit({
        "vpu_f32_fma_peak_tflops": round(ceil["fma_peak"] / 1e12, 3),
        "vpu_f32_stream_tflops": round(ceil["stream"] / 1e12, 3),
    })
    peak = ceil["fma_peak"]
    if "--ceil-only" in sys.argv:
        return

    model = flop_model()
    batch = 4096
    qp = make_qp_batch(batch)
    for name, opts in {
        "ric_dense": pdipm.PdipmOptions(backend="ric", refine_steps=1),
        "ric_split": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                        foot_split=True),
        "ricaug_dense": pdipm.PdipmOptions(backend="ric_aug", refine_steps=1),
        "ricaug_split": pdipm.PdipmOptions(backend="ric_aug", refine_steps=1,
                                           foot_split=True),
        # Round-3 sublane-packed forms (same flop model as the unpacked
        # split — packing changes layout, not arithmetic).
        "ric_split_pack": pdipm.PdipmOptions(
            backend="ric", refine_steps=1, foot_split=True, foot_pack=True),
        "ricaug_split_pack": pdipm.PdipmOptions(
            backend="ric_aug", refine_steps=1, foot_split=True,
            foot_pack=True),
    }.items():
        fn = make_chained(lambda q, o=opts: pdipm_pallas.solve(q, o), 10)
        np.asarray(fn(qp))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(qp))
            ts.append((time.perf_counter() - t0) / 10)
        t = float(np.median(ts))
        flops = model[name] * 20 * batch  # 20 iterations
        emit({
            "variant": name,
            "ms_per_20iter_b4096": round(1e3 * t, 2),
            "model_flops_per_env_iter": model[name],
            "sustained_tflops": round(flops / t / 1e12, 3),
            "util_vs_fma_peak": round(flops / t / peak, 3),
            "util_vs_stream": round(flops / t / ceil["stream"], 3),
        })


if __name__ == "__main__":
    main()
