"""f32 GRF accuracy vs the f64 golden rule solver for pallas_ric variants.

Measurement script: 8 distinct contact-chattering walking QPs (tiled to a
256 batch, `bench_common.make_qp_batch`), u0 (the GRFs) compared against
`ops/reference_pdipm.py` at 20 iterations.
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import json

import numpy as np

from bench_common import make_qp_batch


def main():
    import jax

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas, reference_pdipm
    from biped_pympc_tpu.ops import qp as qps

    batch = 256
    qp = make_qp_batch(batch)
    # The batch tiles 8 distinct problems; only solve those on the host.
    qp_host = jax.tree.map(np.asarray, qp)

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
    gold_u = np.tile(gold8, (batch // 8, 1))

    variants = {
        "ric_pivot_r1": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                           k_pivot=True),
        "ric_nopivot_r1": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                             k_pivot=False),
        "ric_nopivot_r2": pdipm.PdipmOptions(backend="ric", refine_steps=2,
                                             k_pivot=False),
        "ric2_r1": pdipm.PdipmOptions(backend="ric2", refine_steps=1),
        "ric_aug_r1": pdipm.PdipmOptions(backend="ric_aug", refine_steps=1),
        "ric_comb_r1": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                          corrector_form="combined"),
        "ric_comb_r2": pdipm.PdipmOptions(backend="ric", refine_steps=2,
                                          corrector_form="combined"),
        "ricaug_comb_r1": pdipm.PdipmOptions(backend="ric_aug",
                                             refine_steps=1,
                                             corrector_form="combined"),
        "ric_sumref_r1": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                            corrector_form="sum_refine"),
        "ricaug_sumref_r1": pdipm.PdipmOptions(backend="ric_aug",
                                               refine_steps=1,
                                               corrector_form="sum_refine"),
    }
    for name, opts in variants.items():
        res = pdipm_pallas.solve(qp, opts)
        e = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold_u).max(axis=1)
        print(json.dumps({
            "acc_variant": name,
            "median_N": round(float(np.median(e)), 4),
            "p99_N": round(float(np.percentile(e, 99)), 3),
            "max_N": round(float(e.max()), 3),
            "per_problem_N": [round(float(v), 3) for v in e[:8]],
        }), flush=True)


if __name__ == "__main__":
    main()
