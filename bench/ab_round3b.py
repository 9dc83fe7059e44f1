"""Round-3 follow-up TPU session.

A2. Apply-only packing A/B: `foot_pack="apply"` keeps the lane-stacked GJ
    (the full paired GJ measured slower in ab_round3.py phase A) and only
    repacks the stored K^-1 column-wise for full-sublane applies. Chained
    timing vs the unpacked split kernels, b4096.
B2. Accuracy guard for the apply-pack (stress set, vs f64 golden).
C2. Hybrid flag-component analysis: WHICH residual component of the fast
    path's criterion actually correlates with its GRF error vs the
    augmented anchor. ab_round3.py showed max(||rx||,||rs||,||re||,mu)
    separates NaN/divergence but not the f32 condensation error tail
    (worst unflagged 34 N at flag_tol=1). Here each component — and the
    max excluding the noisy stationarity row rx — gets its own threshold
    sweep at its own quantiles, on the same randomized b4096 workload.

Appends to results/ab_round3b.jsonl.
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
from ab_round3 import NU0, golden_u


def main():
    import jax

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    emit = make_emitter("ab_round3b")
    chain = 10
    reps = 6

    variants = {
        "ric_split": pdipm.PdipmOptions(
            backend="ric", refine_steps=1, foot_split=True),
        "ric_split_papply": pdipm.PdipmOptions(
            backend="ric", refine_steps=1, foot_split=True,
            foot_pack="apply"),
        "ricaug_split": pdipm.PdipmOptions(
            backend="ric_aug", refine_steps=1, foot_split=True),
        "ricaug_split_papply": pdipm.PdipmOptions(
            backend="ric_aug", refine_steps=1, foot_split=True,
            foot_pack="apply"),
    }

    # ---------------- A2: apply-pack timing ----------------
    batch = 4096
    qp = make_qp_batch(batch)
    fns = {}
    for name, opts in variants.items():
        fn = make_chained(lambda q, o=opts: pdipm_pallas.solve(q, o), chain)
        t0 = time.perf_counter()
        np.asarray(fn(qp))
        emit({"compiled": name, "batch": batch,
              "compile_s": round(time.perf_counter() - t0, 1)})
        fns[name] = fn
    times = {name: [] for name in fns}
    for _ in range(reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(qp))
            times[name].append((time.perf_counter() - t0) / chain)
    out = {"phase": "A2_papply", "batch": batch}
    for name, ts in times.items():
        out[f"{name}_ms"] = round(1e3 * float(np.median(ts)), 2)
    emit(out)

    # ---------------- B2: apply-pack accuracy guard ----------------
    qp = make_qp_batch(256)
    gold = golden_u(qp)
    for name in ("ric_split_papply", "ricaug_split_papply"):
        res = pdipm_pallas.solve(qp, variants[name])
        e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold).max(axis=1)
        emit({"phase": "B2_acc", "variant": name,
              "median_N": round(float(np.median(e)), 4),
              "p99_N": round(float(np.percentile(e, 99)), 3),
              "max_N": round(float(e.max()), 3)})

    # ---------------- C2: flag-component correlation ----------------
    batch = 4096
    qp = make_qp_batch_randomized(batch)
    res_f = pdipm_pallas.solve(qp, variants["ric_split"])
    res_a = pdipm_pallas.solve(qp, variants["ricaug_split"])
    xf = np.asarray(res_f.x)
    xa = np.asarray(res_a.x)
    r = np.asarray(res_f.residuals)  # (B, 4): rx, rs, re, mu
    err = np.abs(xf[:, NU0:NU0 + 12] - xa[:, NU0:NU0 + 12]).max(axis=1)
    err = np.where(np.isfinite(err), err, np.inf)
    bad1 = err > 1.0
    bad5 = err > 5.0
    finite_rows = np.isfinite(r).all(axis=1) & np.isfinite(xf).all(axis=1)

    components = {
        "rx": r[:, 0], "rs": r[:, 1], "re": r[:, 2], "mu": r[:, 3],
        "max_all": r.max(axis=1),
        "max_no_rx": r[:, 1:].max(axis=1),
    }
    for name, c in components.items():
        c = np.where(finite_rows, c, np.inf)
        cf = c[np.isfinite(c)]
        # rank correlation (Spearman via argsort ranks) on finite envs
        mask = np.isfinite(c) & np.isfinite(err)
        rc = np.corrcoef(
            np.argsort(np.argsort(c[mask])),
            np.argsort(np.argsort(err[mask])))[0, 1] if mask.sum() > 2 else 0
        row = {"phase": "C2_flag_component", "component": name,
               "spearman_vs_err": round(float(rc), 4), "thresholds": []}
        for q in (0.5, 0.8, 0.9, 0.95, 0.99):
            tol = float(np.quantile(cf, q))
            flag = c > tol
            unf = err[~flag]
            row["thresholds"].append({
                "quantile": q, "tol": round(tol, 5),
                "flagged": int(flag.sum()),
                "caught_gt_1N": round(
                    float((bad1 & flag).sum() / max(1, bad1.sum())), 4),
                "caught_gt_5N": round(
                    float((bad5 & flag).sum() / max(1, bad5.sum())), 4),
                "worst_unflagged_N": round(float(unf.max()), 3)
                if unf.size else 0.0,
            })
        emit(row)


if __name__ == "__main__":
    main()
