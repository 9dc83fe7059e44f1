"""Round-4 TPU measurement session: KKT equilibration + true-KKT hybrid flag
+ bcr horizon table.

Phases (select via argv, default "ABC"; e.g. `python bench/ab_round4.py ABCDE`):

A. Stress-8 f32 GRF accuracy vs the f64 golden (b256, ab_accuracy
   methodology) for the equilibration variants: the shipped default
   (ric_aug split r1), the same + Jacobi KKT scaling, r0 + Jacobi (can
   scaling replace refinement?), r1 + Jacobi + the cheaper aff_ref
   corrector (3 solves + 1 apply vs 4 + 2 — rejected unscaled at 15.1 N,
   CPU-measured 0.63 N scaled), and the condensed kernel +- Jacobi.
B. Chained-scan timing (interleaved, b256 + b4096) for the same variants,
   with per-variant compile seconds.
C. Randomized-domain b4096 (BASELINE config 5): per-variant finiteness +
   u0 error vs the augmented anchor, AND the round-4 hybrid-flag
   calibration — Spearman + threshold/recall tables for BOTH criteria
   (the round-3 stale "resid" criterion and the new true-KKT criterion
   `pdipm.kkt_error`, VERDICT r3 item 3), plus chained timing of
   solve_hybrid(flag="kkt").
D. b32768 randomized finiteness for the best condensed candidate and the
   kkt-flagged hybrid.
E. Horizon table: T=10/20/40 rows for ric split / ric_aug split at b1024
   (VERDICT r3 item 6), with compile seconds and VMEM-failure capture.
   The original session also timed the bcr kernel here (its log-depth
   advantage had never been measured where it was claimed to matter); it
   lost at every horizon and was REMOVED from the tree — the bcr_r1 rows
   in results/ab_round4.jsonl are that recorded evidence and cannot be
   regenerated (the backends now raise on "bcr").
F. Golden attribution of the scaled-vs-unscaled randomized disagreement
   tail: the worst >1 N disagreement envs re-solved with the f64
   reference PDIPM on CPU; which variant is closer to truth?
G. Jacobi x scheduled refinement: does kkt_scale="jacobi" rescue the
   refine_skip_iters accuracy loss (round-3 rejected lever) at lower
   cost than full refinement?

Results append to results/ab_round4.jsonl.
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

NU0 = 120  # u_0 offset (x block = 12 * T = 120) at horizon 10


def golden_u(qp, n_distinct=8):
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
            iterations=20)
        gold[i] = gx[NU0:NU0 + 12]
    return np.tile(gold, (batch // n_distinct, 1))


def spearman(a, b):
    """Rank correlation without scipy; ties broken by order."""
    ra = np.empty_like(a)
    ra[np.argsort(a)] = np.arange(a.size)
    rb = np.empty_like(b)
    rb[np.argsort(b)] = np.arange(b.size)
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra * ra).sum() * (rb * rb).sum()))


def variant_set(pdipm):
    o = pdipm.PdipmOptions
    return {
        "ricaug_split_r1": o(backend="ric_aug", foot_split=True,
                             refine_steps=1),
        "ricaug_split_r1_jac": o(backend="ric_aug", foot_split=True,
                                 refine_steps=1, kkt_scale="jacobi"),
        "ricaug_split_r0_jac": o(backend="ric_aug", foot_split=True,
                                 refine_steps=0, kkt_scale="jacobi"),
        "ricaug_split_r1_jac_affref": o(backend="ric_aug", foot_split=True,
                                        refine_steps=1, kkt_scale="jacobi",
                                        corrector_form="aff_ref"),
        "ric_split_r1": o(backend="ric", foot_split=True, refine_steps=1),
        "ric_split_r1_jac": o(backend="ric", foot_split=True, refine_steps=1,
                              kkt_scale="jacobi"),
    }


def main():
    phases = (_sys.argv[1] if len(_sys.argv) > 1 else "ABC").upper()
    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    emit = make_emitter("ab_round4", {"phases": phases})
    chain = 10
    reps = 6
    variants = variant_set(pdipm)

    # ---------------- A: stress accuracy ----------------
    if "A" in phases:
        batch = 256
        qp = make_qp_batch(batch)
        gold = golden_u(qp)
        for name, opts in variants.items():
            res = pdipm_pallas.solve(qp, opts)
            e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold).max(axis=1)
            emit({"phase": "A_acc", "variant": name,
                  "median_N": round(float(np.median(e)), 4),
                  "p99_N": round(float(np.percentile(e, 99)), 3),
                  "max_N": round(float(e.max()), 3)})

    # ---------------- B: timing ----------------
    if "B" in phases:
        for batch in (256, 4096):
            qp = make_qp_batch(batch)
            fns = {}
            for name, opts in variants.items():
                fn = make_chained(
                    lambda q, o=opts: pdipm_pallas.solve(q, o), chain)
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
            out = {"phase": "B_time", "batch": batch}
            for name, ts in times.items():
                ms = 1e3 * float(np.median(ts))
                out[f"{name}_ms"] = round(ms, 2)
                out[f"{name}_units_per_s"] = round(batch * 4 / (ms / 1e3), 0)
            emit(out)

    # ---------------- C: randomized accuracy + flag calibration ----------
    if "C" in phases:
        batch = 4096
        qp = make_qp_batch_randomized(batch)
        anchor = pdipm_pallas.solve(qp, variants["ricaug_split_r1"])
        xa = np.asarray(anchor.x)
        for name in ("ric_split_r1", "ric_split_r1_jac",
                     "ricaug_split_r0_jac", "ricaug_split_r1_jac_affref",
                     "ricaug_split_r1_jac"):
            res = pdipm_pallas.solve(qp, variants[name])
            x = np.asarray(res.x)
            finite = np.isfinite(x).all(axis=1)
            err = np.abs(x[:, NU0:NU0 + 12] - xa[:, NU0:NU0 + 12]).max(axis=1)
            err = np.where(finite, err, np.inf)
            fin_err = err[np.isfinite(err)]
            emit({"phase": "C_rand", "variant": name, "batch": batch,
                  "n_nonfinite": int((~finite).sum()),
                  "err_vs_aug_p50_N": round(float(np.median(fin_err)), 4)
                  if fin_err.size else None,
                  "err_vs_aug_p99_N": round(float(np.percentile(fin_err, 99)), 3)
                  if fin_err.size else None,
                  "err_vs_aug_max_N": round(float(fin_err.max()), 3)
                  if fin_err.size else None,
                  "n_err_gt_1N": int((err > 1.0).sum()),
                  "n_err_gt_5N": int((err > 5.0).sum())})

        # flag calibration on the bare condensed fast path (hybrid's inner)
        fast = variants["ric_split_r1"]
        res_f = pdipm_pallas.solve(qp, fast)
        xf = np.asarray(res_f.x)
        finite_f = np.isfinite(xf).all(axis=1)
        err = np.abs(xf[:, NU0:NU0 + 12] - xa[:, NU0:NU0 + 12]).max(axis=1)
        err = np.where(finite_f, err, np.inf)
        kkt = np.asarray(jax.jit(jax.vmap(pdipm.kkt_error))(qp, res_f))
        crit_resid = np.asarray(res_f.residuals).max(axis=1)
        crit_resid = np.where(np.isfinite(crit_resid) & finite_f,
                              crit_resid, np.inf)
        crits = {
            "resid_stale": crit_resid,
            "kkt_stat": np.where(finite_f, kkt[:, 0], np.inf),
            "kkt_comp": np.where(finite_f, kkt[:, 3], np.inf),
            "kkt_max": np.where(finite_f, kkt.max(axis=1), np.inf),
        }
        fe = np.isfinite(err)
        bad1, bad5 = err > 1.0, err > 5.0
        for cname, crit in crits.items():
            row = {"phase": "C_flag", "criterion": cname, "batch": batch,
                   "spearman_vs_err": round(
                       spearman(crit[fe], err[fe]), 3),
                   "thresholds": []}
            # recall/cost at quantile-based thresholds of the criterion
            for q in (0.99, 0.97, 0.95, 0.90, 0.75, 0.50):
                tol = float(np.quantile(crit[np.isfinite(crit)], q))
                flag = ~(crit <= tol)  # non-finite => flagged
                unflagged = err[~flag]
                row["thresholds"].append({
                    "quantile": q, "tol": round(tol, 4),
                    "flagged": int(flag.sum()),
                    "caught_gt_1N": round(
                        float((bad1 & flag).sum() / max(1, bad1.sum())), 4),
                    "caught_gt_5N": round(
                        float((bad5 & flag).sum() / max(1, bad5.sum())), 4),
                    "worst_unflagged_N": round(float(unflagged.max()), 3)
                    if unflagged.size else 0.0})
            emit(row)

        # timing: hybrid with the kkt flag vs the resid flag (chained)
        aug = variants["ricaug_split_r1"]
        for fl in ("resid", "kkt"):
            fn = make_chained(
                lambda q, f=fl: pdipm_pallas.solve_hybrid(
                    q, fast, budget=0, flag_tol=1.0, aug_opts=aug, flag=f),
                chain)
            t0 = time.perf_counter()
            np.asarray(fn(qp))
            emit({"compiled": f"hybrid_{fl}", "batch": batch,
                  "compile_s": round(time.perf_counter() - t0, 1)})
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn(qp))
                ts.append((time.perf_counter() - t0) / chain)
            t_h = float(np.median(ts))
            emit({"phase": "C_hybrid_time", "flag": fl, "batch": batch,
                  "ms": round(1e3 * t_h, 2),
                  "units_per_s": round(batch * 4 / t_h, 0)})

    # ---------------- D: b32768 finiteness ----------------
    if "D" in phases:
        batch = 32768
        qp = make_qp_batch_randomized(batch)
        for name in ("ric_split_r1_jac",):
            fn = jax.jit(
                lambda q, o=variants[name]: pdipm_pallas.solve(q, o))
            x = np.asarray(fn(qp).x)
            finite = np.isfinite(x).all(axis=1)
            emit({"phase": "D_b32768", "variant": name,
                  "n_nonfinite": int((~finite).sum()),
                  "finite_frac": round(float(finite.mean()), 6)})
        hyb = jax.jit(lambda q: pdipm_pallas.solve_hybrid(
            q, variants["ric_split_r1_jac"], budget=0, flag_tol=1.0,
            aug_opts=variants["ricaug_split_r1"], flag="kkt"))
        ts = []
        x = np.asarray(hyb(qp).x)  # compile
        for _ in range(3):
            t0 = time.perf_counter()
            x = np.asarray(hyb(qp).x)
            ts.append(time.perf_counter() - t0)
        finite = np.isfinite(x).all(axis=1)
        t_h = float(np.median(ts))
        emit({"phase": "D_hybrid_kkt_b32768", "batch": batch,
              "n_nonfinite": int((~finite).sum()),
              "finite_frac": round(float(finite.mean()), 6),
              "ms": round(1e3 * t_h, 2),
              "units_per_s": round(batch * 4 / t_h, 0),
              "note": "single-dispatch timing: lower bound"})

    # ---------------- G: jacobi x scheduled refinement ------------------
    if "G" in phases:
        # Round 3 measured refine_skip_iters alone breaking the robust
        # class (skip5: 0.29 -> 10.4 N stress) because early unrefined
        # steps leave the f64 trajectory irrecoverably. Jacobi scaling
        # improves exactly the unrefined factorization (its only real
        # win). Does jac + skip hold the robust class at lower cost?
        o = pdipm.PdipmOptions
        gv = {
            "r1": o(backend="ric_aug", foot_split=True, refine_steps=1),
            "r1_skip5": o(backend="ric_aug", foot_split=True,
                          refine_steps=1, refine_skip_iters=5),
            "r1_jac_skip5": o(backend="ric_aug", foot_split=True,
                              refine_steps=1, kkt_scale="jacobi",
                              refine_skip_iters=5),
            "r1_jac_skip10": o(backend="ric_aug", foot_split=True,
                               refine_steps=1, kkt_scale="jacobi",
                               refine_skip_iters=10),
        }
        batch = 256
        qp = make_qp_batch(batch)
        gold = golden_u(qp)
        for name, opts in gv.items():
            res = pdipm_pallas.solve(qp, opts)
            e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold).max(axis=1)
            emit({"phase": "G_acc", "variant": name,
                  "median_N": round(float(np.median(e)), 4),
                  "p99_N": round(float(np.percentile(e, 99)), 3),
                  "max_N": round(float(e.max()), 3)})
        batch = 4096
        qp = make_qp_batch(batch)
        fns = {}
        for name, opts in gv.items():
            fn = make_chained(
                lambda q, o2=opts: pdipm_pallas.solve(q, o2), chain)
            np.asarray(fn(qp))
            fns[name] = fn
        times = {name: [] for name in fns}
        for _ in range(reps):
            for name, fn in fns.items():
                t0 = time.perf_counter()
                np.asarray(fn(qp))
                times[name].append((time.perf_counter() - t0) / chain)
        out = {"phase": "G_time", "batch": batch}
        for name, ts in times.items():
            ms = 1e3 * float(np.median(ts))
            out[f"{name}_ms"] = round(ms, 2)
        emit(out)

    # ---------------- F: jac-vs-unscaled disagreement attribution --------
    if "F" in phases:
        # Phase C measured the scaled/unscaled augmented kernels deviating
        # by >5 N on ~1% of randomized envs — deviation from the anchor
        # does not say WHICH is wrong. Golden-attribute: solve the
        # disagreeing envs with the f64 reference PDIPM on CPU and score
        # both variants against it.
        from biped_pympc_tpu.ops import reference_pdipm
        from biped_pympc_tpu.ops import qp as qps

        batch = 4096
        qp = make_qp_batch_randomized(batch)
        r1 = pdipm_pallas.solve(qp, variants["ricaug_split_r1"])
        rj = pdipm_pallas.solve(qp, variants["ricaug_split_r1_jac"])
        x1 = np.asarray(r1.x)
        xj = np.asarray(rj.x)
        dis = np.abs(x1[:, NU0:NU0 + 12] - xj[:, NU0:NU0 + 12]).max(axis=1)
        idx = np.argsort(-dis)[:48]
        idx = idx[dis[idx] > 1.0]
        qp_host = jax.tree.map(np.asarray, qp)
        wins_j = wins_1 = 0
        e1s, ejs = [], []
        for i in idx:
            qi = jax.tree.map(lambda a: a[int(i)], qp_host)
            H, f, A, b, G, d = [
                np.asarray(m, np.float64) for m in qps.dense_matrices(qi)]
            gx, *_ = reference_pdipm.solve(
                H, f, A, b, G, d,
                *reference_pdipm.initialize_variables(G, d, A.shape[0]),
                iterations=20)
            gu = gx[NU0:NU0 + 12]
            e1 = float(np.abs(x1[i, NU0:NU0 + 12] - gu).max())
            ej = float(np.abs(xj[i, NU0:NU0 + 12] - gu).max())
            e1s.append(e1)
            ejs.append(ej)
            wins_j += ej < e1
            wins_1 += e1 < ej
        emit({"phase": "F_attrib", "batch": batch,
              "n_disagree_gt_1N": int((dis > 1.0).sum()),
              "n_checked": int(len(idx)),
              "jac_closer": int(wins_j), "unscaled_closer": int(wins_1),
              "unscaled_err_med_N": round(float(np.median(e1s)), 3)
              if e1s else None,
              "jac_err_med_N": round(float(np.median(ejs)), 3)
              if ejs else None,
              "unscaled_err_max_N": round(float(np.max(e1s)), 3)
              if e1s else None,
              "jac_err_max_N": round(float(np.max(ejs)), 3)
              if ejs else None})

    # ---------------- E: horizon table (bcr justification) ----------------
    if "E" in phases:
        from biped_pympc_tpu.ops import pdipm as _p
        # "bcr" ran in the original session and lost at every horizon; the
        # backend was removed (raises ValueError now). Its measured rows
        # remain in results/ab_round4.jsonl as the removal evidence.
        hv = {
            "ric_split_r1": _p.PdipmOptions(backend="ric", foot_split=True,
                                            refine_steps=1),
            "ricaug_split_r1": _p.PdipmOptions(backend="ric_aug",
                                               foot_split=True,
                                               refine_steps=1),
        }
        batch = 1024
        for horizon in (10, 20, 40):
            qp = make_qp_batch(batch, horizon=horizon)
            for name, opts in hv.items():
                try:
                    fn = make_chained(
                        lambda q, o=opts: pdipm_pallas.solve(q, o), 6)
                    t0 = time.perf_counter()
                    np.asarray(fn(qp))
                    comp = round(time.perf_counter() - t0, 1)
                    ts = []
                    for _ in range(4):
                        t0 = time.perf_counter()
                        np.asarray(fn(qp))
                        ts.append((time.perf_counter() - t0) / 6)
                    emit({"phase": "E_horizon", "T": horizon, "batch": batch,
                          "variant": name, "compile_s": comp,
                          "ms": round(1e3 * float(np.median(ts)), 2)})
                except Exception as ex:  # VMEM / Mosaic failures are data
                    emit({"phase": "E_horizon", "T": horizon, "batch": batch,
                          "variant": name,
                          "error": f"{type(ex).__name__}: {str(ex)[:300]}"})


if __name__ == "__main__":
    main()
