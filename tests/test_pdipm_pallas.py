"""Pallas fused-kernel PDIPM vs the pure-JAX solver (interpret mode on CPU).

The kernel implements exactly the "tridiag" backend's algorithm; on the real
TPU it matched the JAX path to ~2e-4 at low iteration counts (f32 path
equality) — here we run the interpreter for platform-independent coverage
with a short iteration budget (interpret mode is slow).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import biped_pympc_tpu.ops.pdipm_pallas as pp
from biped_pympc_tpu.ops import pdipm

from test_pdipm import _make_qp


pytestmark = pytest.mark.slow  # integration tier: pytest -m slow


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pp.pl, "pallas_call", patched)


def test_pallas_kernel_matches_jax_tridiag(interpret_pallas):
    qs = [_make_qp(seed=s, dtype=jnp.float32, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="tridiag", refine_steps=1, iterations=2)
    res_k = pp.solve(batch, opts, tile=4)
    ref = jax.vmap(lambda q: pdipm.solve(q, opts))(batch)
    np.testing.assert_allclose(
        np.asarray(res_k.x), np.asarray(ref.x), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_k.z), np.asarray(ref.z), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_k.residuals), np.asarray(ref.residuals),
        rtol=1e-3, atol=1e-4,
    )


def test_pallas_kernel_horizon20(interpret_pallas):
    """The kernel is horizon-generic: T=20 blocks (480v/280eq/320ineq)."""
    import test_horizon20 as h20

    qp64 = h20._qp20()
    qp = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), qp64)
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), qp, qp)
    opts = pdipm.PdipmOptions(backend="tridiag", refine_steps=1, iterations=2)
    res_k = pp.solve(batch, opts, tile=2)
    ref = jax.vmap(lambda q: pdipm.solve(q, opts))(batch)
    np.testing.assert_allclose(
        np.asarray(res_k.x), np.asarray(ref.x), atol=5e-3
    )


def test_pallas_kernel_ric_backend(interpret_pallas):
    """Two-level condensed kernel (shipped default): lane-stacked [u, nu]
    inverses + 12-wide dual-Riccati y-chain. Algebraically exact at f64."""
    qs = [_make_qp(seed=s, dtype=jnp.float64, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="ric", refine_steps=1, iterations=2)
    res_k = pp.solve(batch, opts, tile=4)
    ref = jax.vmap(lambda q: pdipm.solve(q, opts))(batch)
    np.testing.assert_allclose(
        np.asarray(res_k.x), np.asarray(ref.x), rtol=1e-9, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res_k.residuals), np.asarray(ref.residuals),
        rtol=1e-9, atol=1e-10,
    )


def test_pallas_kernel_ric2_backend(interpret_pallas):
    """Rank-2 Schur variant ("ric2", pallas-only): eliminates the 2-wide nu
    block by the closed-form block-inverse identity so the lane-stacked
    inverse is 12-wide SPD only. Exact algebra — must match the pure-JAX
    "ric" backend at f64 to roundoff."""
    qs = [_make_qp(seed=s, dtype=jnp.float64, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    res_k = pp.solve(
        batch,
        pdipm.PdipmOptions(backend="ric2", refine_steps=1, iterations=2),
        tile=4,
    )
    ref_opts = pdipm.PdipmOptions(backend="ric", refine_steps=1, iterations=2)
    ref = jax.vmap(lambda q: pdipm.solve(q, ref_opts))(batch)
    np.testing.assert_allclose(
        np.asarray(res_k.x), np.asarray(ref.x), rtol=1e-9, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res_k.residuals), np.asarray(ref.residuals),
        rtol=1e-9, atol=1e-10,
    )


def test_pallas_kernel_ric_aug_backend(interpret_pallas):
    """Two-level augmented kernel (f32-robust accuracy mode)."""
    qs = [_make_qp(seed=s, dtype=jnp.float64, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="ric_aug", refine_steps=1, iterations=2)
    res_k = pp.solve(batch, opts, tile=4)
    ref = jax.vmap(lambda q: pdipm.solve(q, opts))(batch)
    np.testing.assert_allclose(
        np.asarray(res_k.x), np.asarray(ref.x), rtol=1e-9, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res_k.z), np.asarray(ref.z), rtol=1e-9, atol=1e-10
    )


def test_pallas_kernel_aug_backend(interpret_pallas):
    """The 42-wide augmented kernel variant matches the JAX tridiag_aug path."""
    qs = [_make_qp(seed=s, dtype=jnp.float32, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(
        backend="tridiag_aug", refine_steps=1, iterations=2
    )
    res_k = pp.solve(batch, opts, tile=4)
    ref = jax.vmap(lambda q: pdipm.solve(q, opts))(batch)
    np.testing.assert_allclose(
        np.asarray(res_k.x), np.asarray(ref.x), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_k.z), np.asarray(ref.z), atol=1e-4
    )


def test_pallas_warm_start_chunking_matches_fixed(interpret_pallas):
    """Two warm-started 1-iteration launches == one 2-iteration launch.

    Pins the kernel's optional state inputs (x0, s0, z0, y0): splitting
    the fixed iteration loop across launches is the same arithmetic up to
    compiler reassociation (the 1- and 2-iteration programs fuse
    differently; measured drift ~1e-4 absolute on s ~ O(100))."""
    qs = [_make_qp(seed=s, dtype=jnp.float32, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="ric", refine_steps=1, iterations=2)
    fixed = pp.solve(batch, opts, tile=4)
    o1 = opts._replace(iterations=1)
    r1 = pp.solve(batch, o1, tile=4)
    st = pdipm.PdipmState(r1.x, r1.s, r1.z, r1.y)
    r2 = pp.solve(batch, o1, tile=4, state=st)
    np.testing.assert_allclose(
        np.asarray(r2.x), np.asarray(fixed.x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(r2.s), np.asarray(fixed.s), rtol=1e-3, atol=1e-3)


def test_pallas_solve_adaptive(interpret_pallas):
    """solve_adaptive: tol=0 runs the full cap and equals fixed solve; a
    huge tol stops after one launch (its stale residual criterion is inf
    on entry, then the first chunk's residuals satisfy any large tol)."""
    qs = [_make_qp(seed=s, dtype=jnp.float32, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="ric", refine_steps=1, iterations=2,
                              iterations_per_launch=1)
    fixed = pp.solve(batch, opts, tile=4)
    ad = pp.solve_adaptive(batch, opts, tol=0.0, tile=4)
    np.testing.assert_allclose(
        np.asarray(ad.x), np.asarray(fixed.x), rtol=1e-3, atol=1e-3)
    one = pp.solve(batch, opts._replace(iterations=1), tile=4)
    ad_loose = pp.solve_adaptive(batch, opts, tol=1e12, tile=4)
    np.testing.assert_allclose(
        np.asarray(ad_loose.x), np.asarray(one.x), rtol=1e-3, atol=1e-3)
    # Non-divisible cap: 3 = 2x1 + rem 1 runs exactly 3 iterations.
    o3 = opts._replace(iterations=3, iterations_per_launch=2)
    fixed3 = pp.solve(batch, o3, tile=4)
    ad3 = pp.solve_adaptive(batch, o3, tol=0.0, tile=4)
    np.testing.assert_allclose(
        np.asarray(ad3.x), np.asarray(fixed3.x), rtol=1e-3, atol=1e-3)


def test_pallas_hybrid_merge_logic(interpret_pallas):
    """solve_hybrid = fast-path result where unflagged, augmented where
    flagged: pinned by driving flag_tol to the two extremes."""
    qs = [_make_qp(seed=s, dtype=jnp.float32, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="ric", refine_steps=1, iterations=2)
    aug = opts._replace(backend="ric_aug", aug_pivot=True)

    fast = pp.solve(batch, opts, tile=4)
    robust = pp.solve(batch, aug, tile=4)

    # flag_tol = +inf: nothing flagged, identical to the fast path.
    hyb_none = pp.solve_hybrid(
        batch, opts, budget=4, flag_tol=np.inf, tile=4)
    np.testing.assert_array_equal(np.asarray(hyb_none.x), np.asarray(fast.x))

    # flag_tol = -1: every env flagged (budget covers the batch), identical
    # to the augmented path.
    hyb_all = pp.solve_hybrid(batch, opts, budget=4, flag_tol=-1.0, tile=4)
    np.testing.assert_array_equal(np.asarray(hyb_all.x), np.asarray(robust.x))
    np.testing.assert_array_equal(np.asarray(hyb_all.z), np.asarray(robust.z))

    # budget < batch: only the worst-criterion envs can be re-solved; the
    # rest must be bitwise the fast path even at flag_tol = -1.
    hyb_b2 = pp.solve_hybrid(batch, opts, budget=2, flag_tol=-1.0, tile=4)
    crit = np.asarray(fast.residuals).max(axis=1)
    worst2 = set(np.argsort(crit)[-2:].tolist())
    for i in range(4):
        if i in worst2:
            # Re-solved lanes match the augmented path (not bitwise: the
            # budget-sized launch has a different lane count, so f32
            # reassociation differs at roundoff).
            np.testing.assert_allclose(
                np.asarray(hyb_b2.x[i]), np.asarray(robust.x[i]), atol=1e-5)
        else:
            np.testing.assert_array_equal(
                np.asarray(hyb_b2.x[i]), np.asarray(fast.x[i]))


@pytest.mark.parametrize("backend", ["ric", "ric_aug"])
def test_pallas_foot_pack_matches_unpacked(interpret_pallas, backend):
    """Sublane packing (foot_pack) is a pure layout change: the paired
    Gauss-Jordan runs the same per-half recurrence with the same pivot
    choices, so at f64 it must match the lane-stacked foot-split kernel
    to roundoff (summation-order differences only in the packed bkb
    contraction), and stay close to the pure-JAX reference."""
    qs = [_make_qp(seed=s, dtype=jnp.float64, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(
        backend=backend, refine_steps=1, iterations=3, foot_split=True)
    res_unpacked = pp.solve(batch, opts, tile=4)
    res_packed = pp.solve(batch, opts._replace(foot_pack=True), tile=4)
    np.testing.assert_allclose(
        np.asarray(res_packed.x), np.asarray(res_unpacked.x),
        rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(res_packed.z), np.asarray(res_unpacked.z),
        rtol=1e-11, atol=1e-11)
    # Apply-only packing (foot_pack="apply"): same lane-stacked GJ, the
    # stored inverse repacked column-wise — identical up to the packed
    # apply's reduction order.
    res_pa = pp.solve(batch, opts._replace(foot_pack="apply"), tile=4)
    np.testing.assert_allclose(
        np.asarray(res_pa.x), np.asarray(res_unpacked.x),
        rtol=1e-11, atol=1e-11)
    if backend == "ric_aug":
        # The no-pivot paired form too (aug_pivot=False diagnostics path).
        res_np = pp.solve(
            batch, opts._replace(foot_pack=True, aug_pivot=False), tile=4)
        res_np_u = pp.solve(batch, opts._replace(aug_pivot=False), tile=4)
        np.testing.assert_allclose(
            np.asarray(res_np.x), np.asarray(res_np_u.x),
            rtol=1e-11, atol=1e-11)


def test_pallas_hybrid_nan_rescue(interpret_pallas, monkeypatch):
    """A non-finite fast-path env is ALWAYS re-solved (round-2 review fix):
    both failure shapes — NaN residual criterion, and finite criterion
    around a NaN solution (last-step blow-up) — must come back as the
    augmented result, even with the tolerance gate disabled (flag_tol=inf).
    """
    qs = [_make_qp(seed=s, dtype=jnp.float32, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="ric", refine_steps=1, iterations=2)
    aug = opts._replace(backend="ric_aug", aug_pivot=True)
    fast = pp.solve(batch, opts, tile=4)
    robust = pp.solve(batch, aug, tile=4)

    orig_solve = pp.solve

    def poisoned(qp, o=pdipm.PdipmOptions(), tile=128, state=None):
        res = orig_solve(qp, o, tile, state)
        if qp.f.shape[0] == 4 and o.backend == "ric":
            # env 1: NaN solution under a finite residual criterion;
            # env 2: NaN residual criterion.
            res = res._replace(
                x=res.x.at[1].set(jnp.nan),
                residuals=res.residuals.at[2].set(jnp.nan),
            )
        return res

    monkeypatch.setattr(pp, "solve", poisoned)
    hyb = pp.solve_hybrid(batch, opts, budget=2, flag_tol=np.inf, tile=4)
    assert np.isfinite(np.asarray(hyb.x)).all()
    for i in (1, 2):  # rescued with the augmented solution
        np.testing.assert_allclose(
            np.asarray(hyb.x[i]), np.asarray(robust.x[i]), atol=1e-5)
    for i in (0, 3):  # untouched envs keep the fast path bitwise
        np.testing.assert_array_equal(
            np.asarray(hyb.x[i]), np.asarray(fast.x[i]))

    # Auto budget (budget=0 -> max(64, B//32), clamped to the batch): with
    # flag_tol=-1 every env is re-solved, i.e. the augmented result.
    monkeypatch.setattr(pp, "solve", orig_solve)
    hyb_auto = pp.solve_hybrid(batch, opts, budget=0, flag_tol=-1.0, tile=4)
    np.testing.assert_array_equal(
        np.asarray(hyb_auto.x), np.asarray(robust.x))


def test_pallas_foot_split_matches_dense(interpret_pallas):
    """Foot-split kernel factors == dense kernel factors at f64 roundoff
    (exact block-diagonal decomposition; different summation order only)."""
    qs = [_make_qp(seed=s, dtype=jnp.float64, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    for backend in ("ric", "ric_aug"):
        opts = pdipm.PdipmOptions(
            backend=backend, refine_steps=1, iterations=3, foot_split=True)
        res_split = pp.solve(batch, opts, tile=4)
        res_dense = pp.solve(batch, opts._replace(foot_split=False), tile=4)
        np.testing.assert_allclose(
            np.asarray(res_split.x), np.asarray(res_dense.x),
            rtol=1e-12, atol=1e-12)
        ref = jax.vmap(
            lambda q: pdipm.solve(q, opts))(batch)
        np.testing.assert_allclose(
            np.asarray(res_split.x), np.asarray(ref.x),
            rtol=1e-12, atol=1e-12)


def test_pallas_kernel_jacobi_scale(interpret_pallas):
    """Jacobi-equilibrated kernel factorizations reproduce the pure-JAX
    scaled solver exactly at f64 (round-4 kkt_scale lever)."""
    qs = [_make_qp(seed=s, dtype=jnp.float64, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    for backend, split in [("ric", False), ("ric_aug", True)]:
        opts = pdipm.PdipmOptions(
            backend=backend, foot_split=split, refine_steps=1, iterations=2,
            kkt_scale="jacobi")
        res_k = pp.solve(batch, opts, tile=4)
        ref = jax.vmap(lambda q: pdipm.solve(q, opts))(batch)
        np.testing.assert_allclose(
            np.asarray(res_k.x), np.asarray(ref.x), rtol=1e-9, atol=1e-10,
            err_msg=f"{backend} split={split}")


def test_hybrid_stats_and_budget_exceeded(interpret_pallas, monkeypatch):
    """Round-5 observability: solve_hybrid(with_stats=True) reports
    flagged/nonfinite/resolved counts, and `dropped_nonfinite` detects the
    budget-exceeded lapse of the finiteness guarantee (3 NaN envs vs
    budget 2 -> one env returned non-finite AND the counter says so)."""
    qs = [_make_qp(seed=s, dtype=jnp.float32, vx=0.1 * s) for s in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *qs)
    opts = pdipm.PdipmOptions(backend="ric", refine_steps=1, iterations=2)

    # Healthy batch, generous budget: nothing non-finite, nothing dropped.
    res, st = pp.solve_hybrid(batch, opts, budget=4, flag_tol=np.inf,
                              tile=4, with_stats=True)
    assert int(st.nonfinite) == 0 and int(st.dropped_nonfinite) == 0
    assert int(st.flagged) == 0 and int(st.resolved) == 0

    # flag_tol=-1: everything flagged and re-solved within budget.
    _, st_all = pp.solve_hybrid(batch, opts, budget=4, flag_tol=-1.0,
                                tile=4, with_stats=True)
    assert int(st_all.flagged) == 4 and int(st_all.resolved) == 4
    assert int(st_all.dropped_nonfinite) == 0

    # Poison 3 envs non-finite; budget 2 -> guarantee lapses on 1 env,
    # and the lapse is OBSERVABLE (dropped_nonfinite == 1), with the
    # returned batch indeed carrying exactly one non-finite env.
    orig_solve = pp.solve

    def poisoned(qp, o=pdipm.PdipmOptions(), tile=128, state=None):
        res = orig_solve(qp, o, tile, state)
        if qp.f.shape[0] == 4 and o.backend == "ric":
            res = res._replace(
                x=res.x.at[0].set(jnp.nan).at[1].set(jnp.nan).at[2].set(
                    jnp.nan))
        return res

    monkeypatch.setattr(pp, "solve", poisoned)
    res_l, st_l = pp.solve_hybrid(batch, opts, budget=2, flag_tol=np.inf,
                                  tile=4, with_stats=True)
    assert int(st_l.nonfinite) == 3
    assert int(st_l.resolved) == 2
    assert int(st_l.dropped_nonfinite) == 1
    bad = ~np.isfinite(np.asarray(res_l.x)).all(axis=1)
    assert bad.sum() == 1  # the counter told the truth


def test_hybrid_stats_through_controller_and_wrapper(interpret_pallas):
    """hybrid_counts ride MpcOutput through run_mpc and surface in the
    wrapper's hybrid_stats property; other solvers report none."""
    import numpy as _np
    from biped_pympc_tpu import ControllerConf, MPCConf, MPCController

    ctrl = MPCController(
        ControllerConf(),
        MPCConf(solver="pallas_hybrid", hybrid_budget=2, verbose=False),
        num_envs=4,
    )
    assert ctrl.hybrid_stats == {}  # before the first solve
    obs = _np.zeros((4, 13 + 30), _np.float32)
    obs[:, 2] = 0.55
    obs[:, 3] = 1.0
    ctrl.update_state(obs)
    ctrl.run_mpc()
    st = ctrl.hybrid_stats
    assert set(st) == {"flagged", "nonfinite", "resolved",
                       "dropped_nonfinite"}
    assert st["nonfinite"] == 0 and st["dropped_nonfinite"] == 0

    ctrl2 = MPCController(
        ControllerConf(), MPCConf(solver="ric_aug", verbose=False),
        num_envs=2)
    ctrl2.update_state(obs[:2])
    ctrl2.run_mpc()
    assert ctrl2.hybrid_stats == {}


def test_pallas_df_refine_residual(interpret_pallas):
    """refine_residual="df" in the fused aug kernels: at f64 the
    compensated residual is a no-op (plain == df to roundoff); at f32 the
    df path stays finite and matches the f64 anchor at least as well as
    the plain-f32 residual on the stress problems."""
    qs64 = [_make_qp(seed=s, dtype=jnp.float64, vx=0.1 * s) for s in range(4)]
    b64 = jax.tree.map(lambda *xs: jnp.stack(xs), *qs64)
    opts = pdipm.PdipmOptions(backend="ric_aug", refine_steps=1, iterations=6)
    plain64 = pp.solve(b64, opts, tile=4)
    df64 = pp.solve(b64, opts._replace(refine_residual="df"), tile=4)
    np.testing.assert_allclose(
        np.asarray(df64.x), np.asarray(plain64.x), rtol=1e-9, atol=1e-9)

    b32 = jax.tree.map(lambda a: a.astype(jnp.float32), b64)
    plain32 = pp.solve(b32, opts, tile=4)
    df32 = pp.solve(b32, opts._replace(refine_residual="df"), tile=4)
    assert np.isfinite(np.asarray(df32.x)).all()
    anchor = np.asarray(plain64.x)
    e_plain = np.abs(np.asarray(plain32.x) - anchor).max()
    e_df = np.abs(np.asarray(df32.x) - anchor).max()
    assert e_df <= 2.0 * e_plain, (e_plain, e_df)
