"""f32 GRF accuracy vs the f64 golden rule solver for pallas_ric variants.

Temporary measurement script: 256 walking-class QPs, u0 (the GRFs) compared
against `ops/reference_pdipm.py` at 20 iterations. Dense matrices are
assembled per-env on the host (`dense_matrices` is a NumPy helper).
"""

import json

import numpy as np


def main():
    import jax

    from biped_pympc_tpu.ops import pdipm, pdipm_pallas, reference_pdipm
    from biped_pympc_tpu.ops import qp as qps

    import jax.numpy as jnp
    from biped_pympc_tpu.models.srbd import SrbdLin

    def make_qp_batch(batch: int, horizon: int = 10):
        rng = np.random.default_rng(0)
        qs = []
        for s in range(8):
            x0 = jnp.asarray(
                np.concatenate([
                    rng.uniform(-0.05, 0.05, 3), [0, 0, 0.55],
                    rng.uniform(-0.1, 0.1, 3), [0.05 * s, 0, 0],
                ]).astype(np.float32))
            x_ref = jnp.tile(
                jnp.asarray([0, 0, 0, 0, 0, 0.55, 0, 0, 0, 0.3, 0, 0],
                            jnp.float32), (horizon, 1))
            contact = jnp.asarray(
                (np.arange(horizon * 2).reshape(horizon, 2) + s) % 2,
                jnp.float32)
            lin = SrbdLin(
                rot_body=jnp.eye(3, dtype=jnp.float32),
                inertia_world=jnp.asarray(
                    np.diag([0.5413, 0.52, 0.0691]), jnp.float32),
                body_pos=x0[3:6],
                foot_pos=x0[3:6] + jnp.asarray(
                    [[0.02, 0.06, -0.55], [0.02, -0.06, -0.55]], jnp.float32),
                mass=jnp.float32(13.856),
                residual_lin_accel=jnp.zeros(3, jnp.float32),
                residual_ang_accel=jnp.zeros(3, jnp.float32),
            )
            qs.append(qps.build_qp(
                lin, x0, x_ref, contact, jnp.float32(0.025), jnp.float32(1.0),
                jnp.asarray([150, 150, 250, 100, 100, 250, 1, 1, 5, 10, 10, 1],
                            jnp.float32),
                jnp.asarray([1e-5] * 6 + [1e-4] * 6, jnp.float32),
                horizon,
            ))
        one = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
        rep = max(1, batch // 8)
        full = jax.tree.map(
            lambda a: jnp.tile(a, (rep,) + (1,) * (a.ndim - 1)), one)
        return jax.tree.map(lambda a: a[:batch], full)

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
        "ric2_r1": pdipm.PdipmOptions(backend="ric2", refine_steps=1),
        "ric2_r2": pdipm.PdipmOptions(backend="ric2", refine_steps=2),
        "ric_nopivot_r2": pdipm.PdipmOptions(backend="ric", refine_steps=2,
                                             k_pivot=False),
        "ric_aug_r1": pdipm.PdipmOptions(backend="ric_aug", refine_steps=1),
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
