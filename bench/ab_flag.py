"""Hybrid-solver flag calibration: does the PDIPM residual find the f32 tail?

The hybrid TPU solve runs the fast condensed kernel (`pallas_ric`) on every
env, then re-solves only flagged envs with the robust augmented kernel
(`pallas_ric_aug`). This script measures, on the 8-problem contact-chatter
stress set AND a real 256-env domain-randomized walking workload (QPs
captured from the production assembly path at several rollout times):

  * per-env u0 (GRF) error of f32 pallas_ric / pallas_ric2 / pallas_ric_aug
    vs the f64 golden rule solver (`ops/reference_pdipm.py`);
  * the correlation between that error and the kernel's own final residual
    criterion max(||rx||, ||rs||, ||re||, mu);
  * for candidate thresholds: miss count (err > 0.5 N not flagged) and
    flag count (re-solve cost).

Usage: python ab_flag.py  (real TPU; golden runs on host NumPy)
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import json
import sys

import numpy as np

from bench_common import make_qp_batch


def golden_u0(qp_host, n):
    import jax

    from biped_pympc_tpu.ops import reference_pdipm
    from biped_pympc_tpu.ops import qp as qps

    NU0 = 120
    gold = np.empty((n, 12))
    for i in range(n):
        qi = jax.tree.map(lambda a: a[i], qp_host)
        H, f, A, b, G, d = [
            np.asarray(m, np.float64) for m in qps.dense_matrices(qi)]
        gx, *_ = reference_pdipm.solve(
            H, f, A, b, G, d,
            *reference_pdipm.initialize_variables(G, d, A.shape[0]),
            iterations=20,
        )
        gold[i] = gx[NU0:NU0 + 12]
    return gold


def collect_walking_qps(batch=256, seconds=(1, 3)):
    """QP batches from the production assembly path mid-rollout."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "examples"))
    from tpu_rollout import init_carry, make_rollout

    from biped_pympc_tpu import ControllerConf, MPCConf
    from biped_pympc_tpu.control.controller import BipedControllerCore

    core = BipedControllerCore(
        ControllerConf(),
        MPCConf(solver="pallas_ric", verbose=False),
        gait_id=2,
    )
    rollout, _ = make_rollout(core, 1.0)
    rollout = jax.jit(rollout)
    carry = init_carry(core, batch, 0.3, 0.55)
    rng = np.random.default_rng(0)
    state, x, foot_w = carry
    twist = np.zeros((batch, 3), np.float32)
    twist[:, 0] = rng.uniform(-0.3, 0.5, batch)
    twist[:, 1] = rng.uniform(-0.15, 0.15, batch)
    twist[:, 2] = rng.uniform(-0.1, 0.1, batch)  # world-frame-valid turning
    state = core.set_command(state, jnp.asarray(twist),
                             jnp.full((batch,), 0.55, jnp.float32))
    state = state._replace(
        gait_phase=jnp.asarray(rng.uniform(0, 1, batch).astype(np.float32)))
    carry = (state, x, foot_w)

    qps_out = []
    for sec in range(max(seconds)):
        carry, _ = rollout(carry)
        if (sec + 1) in seconds:
            state = carry[0]
            _, _, qp = core.assemble_mpc(state)
            # Drop envs that already fell / went non-finite.
            ok = np.isfinite(np.asarray(qp.f)).all(axis=1)
            qp = jax.tree.map(lambda a: a[np.where(ok)[0]], qp)
            qps_out.append(jax.tree.map(np.asarray, qp))
            print(json.dumps({"collected_s": sec + 1,
                              "n_envs": int(ok.sum())}), flush=True)
    return qps_out


def analyze(tag, qp, n_distinct=None):
    import jax

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas
    from biped_pympc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(qp.f.shape[0])
    qp_host = jax.tree.map(np.asarray, qp)
    nd = n_distinct or batch
    gold = golden_u0(qp_host, nd)
    gold_u = np.tile(gold, (max(1, batch // nd), 1))[:batch]

    NU0 = 120
    out = {}
    for name, opts in {
        "ric": pdipm.PdipmOptions(backend="ric", refine_steps=1),
        "ric2": pdipm.PdipmOptions(backend="ric2", refine_steps=1),
        "ric_aug": pdipm.PdipmOptions(backend="ric_aug", refine_steps=1),
    }.items():
        res = pdipm_pallas.solve(qp, opts)
        err = np.abs(np.asarray(res.x)[:, NU0:NU0 + 12] - gold_u).max(axis=1)
        r = np.asarray(res.residuals)  # (B, 4): ||rx||, ||rs||, ||re||, mu
        crit = r.max(axis=1)
        out[name] = (err, crit)
        rep = {
            "tag": tag, "variant": name, "batch": batch,
            "err_median_N": round(float(np.median(err)), 4),
            "err_p99_N": round(float(np.percentile(err, 99)), 3),
            "err_max_N": round(float(err.max()), 3),
        }
        if name != "ric_aug":
            for tol in (0.1, 0.3, 1.0, 3.0, 10.0, 30.0):
                flagged = crit > tol
                miss = (err > 0.5) & ~flagged
                rep[f"tol{tol}"] = {
                    "flagged": int(flagged.sum()),
                    "missed>0.5N": int(miss.sum()),
                    "worst_missed_N": round(float(err[~flagged].max()), 3)
                    if (~flagged).any() else 0.0,
                }
        print(json.dumps(rep), flush=True)
    # Cross-check: which envs are bad and what do their criteria look like?
    err, crit = out["ric"]
    bad = np.argsort(err)[-8:][::-1]
    print(json.dumps({
        "tag": tag, "worst_envs": [
            {"err_N": round(float(err[i]), 2),
             "crit": round(float(crit[i]), 3)} for i in bad]
    }), flush=True)
    return out


def main():
    qp_stress = make_qp_batch(256)
    analyze("stress8", qp_stress, n_distinct=8)
    for i, qp in enumerate(collect_walking_qps()):
        analyze(f"walk{i}", qp)


if __name__ == "__main__":
    main()
