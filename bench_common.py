"""Shared workload builder for the benchmark / measurement scripts.

One definition of the walking-class stress-QP batch so `bench_sweep.py`,
`ab_accuracy.py` and `ab_kpivot.py` always measure the same problem set
(8 base variants with contact-chattering tables, tiled to the batch size).
"""

import numpy as np


def make_qp_batch(batch: int, horizon: int = 10):
    """(StageQP with leading batch axis) walking-class stress QPs."""
    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu.models.srbd import SrbdLin
    from biped_pympc_tpu.ops import qp as qps

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


def make_chained(solve_fn, chain):
    """Chained-scan device-timing harness shared by the ab_* benchmarks.

    Chains `chain` dependent solves inside one jit (each step's x feeds a
    1e-12 perturbation of the next problem's f) so the measured wall time
    is real sequential device compute, not pipelined same-input dispatch.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(q):
        def body(carry, _):
            qq = q._replace(f=q.f + 1e-12 * carry)
            res = solve_fn(qq)
            return res.x, ()
        out, _ = jax.lax.scan(body, jnp.zeros_like(q.f), None, length=chain)
        return out[:, 0].sum()
    return chained
