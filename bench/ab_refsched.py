"""Scheduled-refinement A/B (round 3): skip refinement on early Newton
steps of the robust augmented kernel.

Refinement is this implementation's own f32 repair (the f64 reference
does plain solves); round-2 established it is load-bearing near
convergence (aff_ref/sum_refine rejections). Hypothesis here: the FIRST
iterations are far from complementarity — benign reduced-KKT scales —
so their refinement solves are dispensable. If true, skip/20 of the
refinement cost (~25% of total at skip=10, refine=1) comes off the
robust default with no accuracy-class change.

Measures, for skip in {0, 5, 10, 15} on ricaug_split (+ ric_split at
the winning skip): stress-set GRF accuracy vs the f64 golden (b256) and
chained-scan ms at b4096. Appends to results/ab_refsched.jsonl.
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import time

import numpy as np

from ab_round3 import NU0, golden_u
from bench_common import make_chained, make_emitter, make_qp_batch


def main():
    import jax

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    emit = make_emitter("ab_refsched")
    chain = 10
    reps = 6

    base = pdipm.PdipmOptions(backend="ric_aug", refine_steps=1,
                              foot_split=True)
    variants = {
        f"ricaug_split_skip{k}": base._replace(refine_skip_iters=k)
        for k in (0, 5, 10, 15)
    }
    variants["ric_split_skip10"] = pdipm.PdipmOptions(
        backend="ric", refine_steps=1, foot_split=True,
        refine_skip_iters=10)

    # Accuracy first (cheap compiles at b256).
    qp_a = make_qp_batch(256)
    gold = golden_u(qp_a)
    for name, opts in variants.items():
        res = pdipm_pallas.solve(qp_a, opts)
        e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold).max(axis=1)
        emit({"phase": "acc", "variant": name,
              "median_N": round(float(np.median(e)), 4),
              "p99_N": round(float(np.percentile(e, 99)), 3),
              "max_N": round(float(e.max()), 3)})

    # Timing (interleaved, b4096).
    qp = make_qp_batch(4096)
    fns = {}
    for name, opts in variants.items():
        fn = make_chained(lambda q, o=opts: pdipm_pallas.solve(q, o), chain)
        t0 = time.perf_counter()
        np.asarray(fn(qp))
        emit({"compiled": name,
              "compile_s": round(time.perf_counter() - t0, 1)})
        fns[name] = fn
    times = {name: [] for name in fns}
    for _ in range(reps):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(qp))
            times[name].append((time.perf_counter() - t0) / chain)
    out = {"phase": "time", "batch": 4096}
    for name, ts in times.items():
        out[f"{name}_ms"] = round(1e3 * float(np.median(ts)), 2)
    emit(out)


if __name__ == "__main__":
    main()
