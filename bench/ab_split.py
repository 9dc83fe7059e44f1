"""Interleaved A/B: foot-split vs dense stage-block factorization (TPU).

The stage [u, nu] / [u, z, nu] blocks are EXACTLY block-diagonal by foot
(see `PdipmOptions.foot_split`); this measures what the structural split
buys on hardware for both the fast condensed kernel ("ric") and the robust
augmented kernel ("ric_aug", whose 30-wide pivoted GJ was ~2/3 of its
runtime). Methodology as ab_gj.py: walking stress QPs, chained-scan device
timing, variants interleaved per rep; ms per full 20-iteration solve.
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

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    chain = 10
    reps = 6
    variants = {
        "ric_dense": pdipm.PdipmOptions(backend="ric", refine_steps=1),
        "ric_split": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                        foot_split=True),
        "ricaug_dense": pdipm.PdipmOptions(backend="ric_aug", refine_steps=1),
        "ricaug_split": pdipm.PdipmOptions(backend="ric_aug", refine_steps=1,
                                           foot_split=True),
    }

    for batch in (256, 4096):
        qp = make_qp_batch(batch)
        fns = {
            name: make_chained(
                lambda q, o=opts: pdipm_pallas.solve(q, o), chain)
            for name, opts in variants.items()
        }
        for name, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(qp))  # compile
            print(json.dumps({"compiled": name, "batch": batch,
                              "compile_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        times = {name: [] for name in fns}
        for _ in range(reps):
            for name, fn in fns.items():
                t0 = time.perf_counter()
                np.asarray(fn(qp))
                times[name].append((time.perf_counter() - t0) / chain)
        out = {"batch": batch}
        for name, ts in times.items():
            out[f"{name}_ms"] = round(1e3 * float(np.median(ts)), 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
