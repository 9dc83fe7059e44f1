"""Interleaved A/B timing of the pallas_ric K-inverse variants.

Measurement script (same methodology as bench_sweep.py): walking stress QPs
(`bench_common.make_qp_batch`), chained-scan device timing, variants
interleaved per rep to cancel runtime drift. Variants: pivoted GJ, no-pivot
GJ (the default), and the rank-2 Schur "ric2" form. f32 accuracy of the
same variants is measured by `ab_accuracy.py`.
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
    import jax.numpy as jnp

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


    chain = 10
    reps = 6
    variants = {
        "pivot": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                    k_pivot=True),
        "nopivot": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                      k_pivot=False),
        "ric2": pdipm.PdipmOptions(backend="ric2", refine_steps=1),
    }

    for batch in (256, 1024, 4096):
        qp = make_qp_batch(batch)
        fns = {
            name: make_chained(
                lambda q, o=opts: pdipm_pallas.solve(q, o), chain)
            for name, opts in variants.items()
        }
        for fn in fns.values():
            np.asarray(fn(qp))  # compile
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
