"""Lane-tile width A/B for the shipped split kernels (round 3).

Hypothesis: the two-level split kernels' sequential y-chain ops run at
bt = tile lanes (one 128-lane tile today) — if those small ops are
issue-limited rather than throughput-limited, a wider lane tile (256,
512 envs per grid step) would pipeline them better and close part of
the split's sustained-TF/s gap vs the dense variant (1.09 vs 1.41,
`results/ab_roofline.jsonl`). The round-0 256-lane experiment was on
the Thomas kernel whose ops were already wide; this measures it on the
architecture where it could matter. Chained-scan interleaved, b4096.

Appends to results/ab_tile.jsonl.
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import time

import numpy as np

from bench_common import make_emitter, make_qp_batch


def main():
    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    emit = make_emitter("ab_tile")
    chain = 10
    reps = 6
    batch = 4096
    qp = make_qp_batch(batch)

    opts = {
        "ric_split": pdipm.PdipmOptions(backend="ric", refine_steps=1,
                                        foot_split=True),
        "ricaug_split": pdipm.PdipmOptions(backend="ric_aug",
                                           refine_steps=1, foot_split=True),
    }

    fns = {}
    for name, o in opts.items():
        for tile in (128, 256, 512):
            key = f"{name}_t{tile}"

            def make(o=o, tile=tile):
                @jax.jit
                def chained(q):
                    def body(carry, _):
                        qq = q._replace(f=q.f + 1e-12 * carry)
                        res = pdipm_pallas.solve(qq, o, tile=tile)
                        return res.x, ()
                    out, _ = jax.lax.scan(
                        body, jnp.zeros_like(q.f), None, length=chain)
                    return out[:, 0].sum()
                return chained

            fn = make()
            t0 = time.perf_counter()
            try:
                np.asarray(fn(qp))
            except Exception as e:  # Mosaic/VMEM rejection is a result too
                emit({"compiled": key, "error": type(e).__name__,
                      "msg": str(e)[:200]})
                continue
            emit({"compiled": key,
                  "compile_s": round(time.perf_counter() - t0, 1)})
            fns[key] = fn

    times = {k: [] for k in fns}
    for _ in range(reps):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(qp))
            times[k].append((time.perf_counter() - t0) / chain)
    out = {"phase": "tile_ab", "batch": batch}
    for k, ts in times.items():
        out[f"{k}_ms"] = round(1e3 * float(np.median(ts)), 2)
    emit(out)


if __name__ == "__main__":
    main()
