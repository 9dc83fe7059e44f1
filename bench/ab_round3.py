"""Round-3 TPU measurement session: sublane packing + hybrid calibration.

One process (single claim of the TPU runtime) measuring, in order:

A. Packed vs unpacked foot-split kernels (`PdipmOptions.foot_pack`, the
   round-2 "Speed of light" lever (b)): chained-scan ms per 20-iteration
   solve, variants interleaved per rep, batches 256/4096. Also records
   per-variant compile seconds.
B. f32 GRF accuracy guard for the packed kernels vs the f64 golden rule
   solver on the 8 stress QPs (ab_accuracy methodology) — packing must not
   move the accuracy class (it is layout-only; pinned at f64 by
   tests/test_pdipm_pallas.py, re-checked here at f32 on hardware).
C. Hybrid flag calibration (the BENCH.md "hybrid flag" section's data):
   on the domain-randomized batch-4096 workload, solve with the fast
   condensed kernel AND the robust augmented kernel; report the
   correlation between the fast path's final residual criterion
   max(||rx||, ||rs||, ||re||, mu) and its GRF error vs the augmented
   anchor, for a sweep of flag_tol thresholds (flagged count, caught
   fraction of bad envs, worst unflagged error). Then time solve_hybrid
   at b4096 (chained) and check 100%-finite + flag stats at b32768.
D. Hybrid stress-set accuracy vs the f64 golden (b256): the headline
   accuracy-class claim for the hybrid as a shipped default candidate.

Results also append to results/ab_round3.jsonl (machine-readable).
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import time

import numpy as np

from bench_common import (
    make_chained, make_emitter, make_qp_batch, make_qp_batch_randomized,
)

NU0 = 120  # u_0 offset in the stacked solution (x block = 12 * T = 120)


def golden_u(qp, n_distinct=8):
    """f64 golden u0 for the first n_distinct problems, tiled to batch."""
    import jax

    from biped_pympc_tpu.ops import reference_pdipm
    from biped_pympc_tpu.ops import qp as qps

    batch = qp.f.shape[0]
    qp_host = jax.tree.map(np.asarray, qp)
    gold = np.empty((n_distinct, 12))
    for i in range(n_distinct):
        qi = jax.tree.map(lambda a: a[i], qp_host)
        H, f, A, b, G, d = [
            np.asarray(m, np.float64) for m in qps.dense_matrices(qi)]
        gx, *_ = reference_pdipm.solve(
            H, f, A, b, G, d,
            *reference_pdipm.initialize_variables(G, d, A.shape[0]),
            iterations=20,
        )
        gold[i] = gx[NU0:NU0 + 12]
    return np.tile(gold, (batch // n_distinct, 1))


def main():
    import jax

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    emit = make_emitter("ab_round3")
    chain = 10
    reps = 6

    fast_opts = pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                   foot_split=True, foot_pack=True)
    aug_opts = pdipm.PdipmOptions(backend="ric_aug", refine_steps=1,
                                  foot_split=True, foot_pack=True)

    # ---------------- A: packed vs unpacked ----------------
    variants = {
        "ric_split": fast_opts._replace(foot_pack=False),
        "ric_split_pack": fast_opts,
        "ricaug_split": aug_opts._replace(foot_pack=False),
        "ricaug_split_pack": aug_opts,
    }
    for batch in (256, 4096):
        qp = make_qp_batch(batch)
        fns = {}
        for name, opts in variants.items():
            fn = make_chained(
                lambda q, o=opts: pdipm_pallas.solve(q, o), chain)
            t0 = time.perf_counter()
            np.asarray(fn(qp))  # compile
            emit({"compiled": name, "batch": batch,
                  "compile_s": round(time.perf_counter() - t0, 1)})
            fns[name] = fn
        times = {name: [] for name in fns}
        for _ in range(reps):
            for name, fn in fns.items():
                t0 = time.perf_counter()
                np.asarray(fn(qp))
                times[name].append((time.perf_counter() - t0) / chain)
        out = {"phase": "A_pack", "batch": batch}
        for name, ts in times.items():
            out[f"{name}_ms"] = round(1e3 * float(np.median(ts)), 2)
        emit(out)

    # ---------------- B: packed accuracy guard (stress set) -------------
    batch = 256
    qp = make_qp_batch(batch)
    gold = golden_u(qp)
    for name, opts in variants.items():
        res = pdipm_pallas.solve(qp, opts)
        e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold).max(axis=1)
        emit({"phase": "B_acc", "variant": name,
              "median_N": round(float(np.median(e)), 4),
              "p99_N": round(float(np.percentile(e, 99)), 3),
              "max_N": round(float(e.max()), 3)})

    # ---------------- C: hybrid flag calibration ----------------
    for batch in (4096, 32768):
        qp = make_qp_batch_randomized(batch)
        res_f = pdipm_pallas.solve(qp, fast_opts)
        res_a = pdipm_pallas.solve(qp, aug_opts)
        xf = np.asarray(res_f.x)
        xa = np.asarray(res_a.x)
        crit = np.asarray(res_f.residuals).max(axis=1)
        crit = np.where(np.isfinite(crit) & np.isfinite(xf).all(axis=1),
                        crit, np.inf)
        err = np.abs(xf[:, NU0:NU0 + 12] - xa[:, NU0:NU0 + 12]).max(axis=1)
        err = np.where(np.isfinite(err), err, np.inf)
        n_nan = int((~np.isfinite(xf).all(axis=1)).sum())
        bad1 = err > 1.0
        bad5 = err > 5.0
        row = {
            "phase": "C_flag", "batch": batch,
            "fast_nan_envs": n_nan,
            "fast_nan_frac": round(n_nan / batch, 5),
            "err_vs_aug_p50_N": round(float(np.median(err)), 4),
            "err_vs_aug_p99_N": round(
                float(np.percentile(err[np.isfinite(err)], 99)), 3)
            if np.isfinite(err).any() else None,
            "n_err_gt_1N": int(bad1.sum()),
            "n_err_gt_5N": int(bad5.sum()),
            "auto_budget": max(64, batch // 32),
            "thresholds": [],
        }
        for tol in (0.03, 0.1, 0.3, 1.0, 3.0, 10.0, 30.0):
            flag = crit > tol
            unflagged_err = err[~flag]
            row["thresholds"].append({
                "flag_tol": tol,
                "flagged": int(flag.sum()),
                "caught_gt_1N": round(
                    float((bad1 & flag).sum() / max(1, bad1.sum())), 4),
                "caught_gt_5N": round(
                    float((bad5 & flag).sum() / max(1, bad5.sum())), 4),
                "worst_unflagged_N": round(
                    float(unflagged_err.max()), 3)
                if unflagged_err.size else 0.0,
            })
        emit(row)

    # hybrid timing at b4096 (chained) + plain-fast and plain-aug anchors
    batch = 4096
    qp = make_qp_batch_randomized(batch)
    flag_tol = 1.0
    hyb_fn = make_chained(
        lambda q: pdipm_pallas.solve_hybrid(
            q, fast_opts, budget=0, flag_tol=flag_tol, aug_opts=aug_opts),
        chain)
    t0 = time.perf_counter()
    np.asarray(hyb_fn(qp))
    emit({"compiled": "hybrid_b4096",
          "compile_s": round(time.perf_counter() - t0, 1)})
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(hyb_fn(qp))
        ts.append((time.perf_counter() - t0) / chain)
    t_h = float(np.median(ts))
    emit({"phase": "C_hybrid_timing", "batch": batch,
          "flag_tol": flag_tol, "budget": max(64, batch // 32),
          "hybrid_ms": round(1e3 * t_h, 2),
          "hybrid_units_per_s": round(batch * 4 / t_h, 1)})

    # b32768 finiteness + throughput of the hybrid (3-chain to bound time)
    batch = 32768
    qp = make_qp_batch_randomized(batch)
    hyb = jax.jit(lambda q: pdipm_pallas.solve_hybrid(
        q, fast_opts, budget=0, flag_tol=flag_tol, aug_opts=aug_opts))
    t0 = time.perf_counter()
    res = hyb(qp)
    x = np.asarray(res.x)
    emit({"compiled": "hybrid_b32768",
          "compile_s": round(time.perf_counter() - t0, 1)})
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        x = np.asarray(hyb(qp).x)
        ts.append(time.perf_counter() - t0)
    t_h = float(np.median(ts))
    finite = np.isfinite(x).all(axis=1)
    emit({"phase": "C_hybrid_b32768", "batch": batch,
          "finite_frac": round(float(finite.mean()), 6),
          "n_nonfinite": int((~finite).sum()),
          "budget": max(64, batch // 32),
          "hybrid_ms": round(1e3 * t_h, 2),
          "hybrid_units_per_s": round(batch * 4 / t_h, 1),
          "note": "single-dispatch timing (no chain): includes one "
                  "host round-trip, so units/s is a lower bound"})

    # ---------------- D: hybrid stress-set accuracy vs golden ------------
    batch = 256
    qp = make_qp_batch(batch)
    gold = golden_u(qp)
    res = pdipm_pallas.solve_hybrid(
        qp, fast_opts, budget=0, flag_tol=flag_tol, aug_opts=aug_opts)
    e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold).max(axis=1)
    emit({"phase": "D_hybrid_acc", "flag_tol": flag_tol,
          "median_N": round(float(np.median(e)), 4),
          "p99_N": round(float(np.percentile(e, 99)), 3),
          "max_N": round(float(e.max()), 3)})


if __name__ == "__main__":
    main()
