"""Round-2 solver decision matrix: accuracy AND speed of the foot-split set.

One TPU process measuring, for each candidate default:
  1. f32 GRF accuracy vs the f64 golden rule solver on the 8 stress QPs
     (`ab_accuracy.py` methodology, batch 256);
  2. ms per full 20-iteration batch-4096 solve (`ab_split.py` chained-scan
     methodology, variants interleaved per rep).

Candidates (round-2b edit — the round-2a five-way matrix lives in
.ab_round2.log; this file now measures the corrector-form follow-up):
  ricaug_split_r1   - the shipped robust default (foot-split augmented,
                      refine 1, reference "delta" corrector form)
  ricaug_split_aff  - same factorization, "aff_ref" corrector (refined
                      affine + unrefined corrector, 3 solves + 1 apply):
                      measures whether only the affine refinement is
                      load-bearing. RESULT: no — max 15.1 N stress error.
  ric_dense_aff     - condensed dense with "aff_ref", same question for
                      the speed-mode factorization.
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

from bench_common import make_chained, make_qp_batch


def main():
    import jax

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas, reference_pdipm
    from biped_pympc_tpu.ops import qp as qps
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    variants = {
        "ricaug_split_r1": pdipm.PdipmOptions(backend="ric_aug",
                                              refine_steps=1,
                                              foot_split=True),
        # 3 solves + 1 apply: refined affine, unrefined corrector (the
        # sum_refine isolation says only the affine refinement is
        # load-bearing — this is the measurement of that claim).
        "ricaug_split_aff": pdipm.PdipmOptions(backend="ric_aug",
                                               refine_steps=1,
                                               foot_split=True,
                                               corrector_form="aff_ref"),
        "ric_dense_aff": pdipm.PdipmOptions(backend="ric",
                                            refine_steps=1,
                                            corrector_form="aff_ref"),
    }

    # ---- accuracy (batch 256, 8 distinct stress QPs) ----
    batch_a = 256
    qp_a = make_qp_batch(batch_a)
    qp_host = jax.tree.map(np.asarray, qp_a)
    NU0 = 120
    gold8 = np.empty((8, 12))
    for i in range(8):
        qi = jax.tree.map(lambda a: a[i], qp_host)
        H, f, A, b, G, d = [
            np.asarray(m, np.float64) for m in qps.dense_matrices(qi)]
        gx, *_ = reference_pdipm.solve(
            H, f, A, b, G, d,
            *reference_pdipm.initialize_variables(G, d, A.shape[0]),
            iterations=20,
        )
        gold8[i] = gx[NU0:NU0 + 12]
    gold_u = np.tile(gold8, (batch_a // 8, 1))

    for name, opts in variants.items():
        res = pdipm_pallas.solve(qp_a, opts)
        e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold_u).max(axis=1)
        print(json.dumps({
            "acc_variant": name,
            "median_N": round(float(np.median(e)), 4),
            "p99_N": round(float(np.percentile(e, 99)), 3),
            "max_N": round(float(e.max()), 3),
        }), flush=True)

    # ---- speed (batch 4096, chained-scan, interleaved) ----
    chain, reps = 10, 6
    qp = make_qp_batch(4096)
    fns = {
        name: make_chained(lambda q, o=opts: pdipm_pallas.solve(q, o), chain)
        for name, opts in variants.items()
    }
    for name, fn in fns.items():
        t0 = time.perf_counter()
        np.asarray(fn(qp))
        print(json.dumps({"compiled": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    times = {name: [] for name in fns}
    for _ in range(reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(qp))
            times[name].append((time.perf_counter() - t0) / chain)
    out = {"batch": 4096}
    for name, ts in times.items():
        out[f"{name}_ms"] = round(1e3 * float(np.median(ts)), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
