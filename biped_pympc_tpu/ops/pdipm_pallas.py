"""Fused Pallas TPU kernel: the entire fixed-iteration PDIPM in VMEM.

This is the performance-critical native core replacing the reference's
generated CUDA kernels (`cusadi/src/generateCUDACode.py` one-thread-per-env
tape kernels). Measurement motivated the design: the pure-XLA solver is
HBM-bound — every Gauss-Jordan step of every stage inverse round-trips the
full (batch, 38, 76) tableau through HBM, ~0.5 GB of traffic per stage
inverse. This kernel runs ALL 20 Mehrotra iterations for a tile of envs with
every intermediate resident in VMEM; HBM sees only the QP data once in and
the solution once out.

Layout: batch-in-lanes. Every per-env quantity is stored with the env tile as
the LAST (lane) axis, so each elimination step, matvec and reduction is a
wide, regular VPU op across 128 envs at once — the TPU-native analog of the
reference's one-CUDA-thread-per-env scalar tape.

The algorithm is the normal-form block-tridiagonal backend of `ops/pdipm.py`
(backend="tridiag") with one extra exact condensation: the x_{t+1} rows have
a diagonal well-conditioned pivot (Q + beta) and are eliminated analytically,
so the Riccati-style Thomas factorization runs per-stage Gauss-Jordan on
26-wide blocks [u, nu, y] (partial pivoting via masked argmax — per-env pivot
choices are data), with the Riccati xx-inverse in closed form
(M = Q~^-1 + Q~^-1 N_yy Q~^-1). Two RHS per iteration plus optional
iterative refinement; f32 end to end. A 42-wide augmented variant
(opts.backend == "tridiag_aug") keeps the inequality duals in the stage block
for the f32-robust accuracy mode. (A block-cyclic-reduction variant that
replaced the T-deep Thomas sweep with ceil(log2 T)+1 levels of lane-batched
inverses was REMOVED in round 4: the kernels are VPU-tile-throughput-bound,
not dependency-latency-bound, so its log-depth never paid — measured slower
at EVERY horizon, 29.5/56.2/113.6 ms vs the split Riccati kernel's
10.9/18.4/34.6 ms at T=10/20/40 b1024, with 3-4x the compile time;
results/ab_round4.jsonl phase E.) Measured on v5e, batch-1024 20-iteration
solve: 27.6 ms (26-form) / 65.6 ms (42-form) vs 3520 ms for the XLA
jnp.linalg.inv path; see BENCH.md.

Block budget per 128-env tile (f32, lane-padded):
  stage inverses (10, 26, 26, 128)  ~3.7 MB
  GJ tableau     (26, 56, 128)      ~0.8 MB
  QP data + iterates + sweep state  ~1.5 MB     => ~6 MB < 16 MB VMEM
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from biped_pympc_tpu.ops import qp as qps
from biped_pympc_tpu.ops.pdipm import (
    PdipmOptions, PdipmResult, PdipmState, init_state,
    kkt_error as pdipm_kkt_error,
)
from biped_pympc_tpu.ops.qp import NU, NX, N_INEQ_PER_STAGE, N_MX_PER_STAGE, StageQP

# Condensed stage block layout [u(12), nu(2), y(12)] = 26: the x_{t+1}
# block (diagonal pivot Q+beta) is eliminated analytically before the GJ.
_CY0 = 14  # start of the y rows in the condensed block
SC = 26

# Augmented condensed layout [u(12), z(16), nu(2), y(12)] = 42: keeps the
# inequality duals in the stage block (no G^T W^-1 G condensation — the
# f32-robust form, see ops/pdipm.py "tridiag_aug"), with the x block still
# eliminated analytically. Selected with opts.backend == "tridiag_aug".
_AZ0 = 12
_ANU0 = 28
_AY0 = 30
SA_C = 42


def _mv(mat, vec):
    """Batched matvec, batch in lanes: (m, n, B) x (n, B) -> (m, B)."""
    return jnp.sum(mat * vec[None, :, :], axis=1)


def _mm(a, b):
    """Batched matmul, batch in lanes: (m, k, B) x (k, n, B) -> (m, n, B)."""
    return jnp.sum(a[:, :, None, :] * b[None, :, :, :], axis=1)


def _mtm(a, b):
    """a^T b, batch in lanes: (k, m, B) x (k, n, B) -> (m, n, B)."""
    return jnp.sum(a[:, :, None, :] * b[:, None, :, :], axis=0)


def _gj_inverse(s_mat):
    """Invert (n, n, B) via Gauss-Jordan with per-lane partial pivoting.

    The elimination loop is unrolled with static step indices — Mosaic TC
    kernels do not lower dynamic_slice on values, and static slicing makes
    the row/column extractions free.
    """
    n = s_mat.shape[0]
    bt = s_mat.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=s_mat.dtype)[:, :, None], (n, n, bt))
    aug = jnp.concatenate([s_mat, eye], axis=1)  # (n, 2n, B)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)

    for k in range(n):
        col = jnp.abs(aug[:, k, :])  # (n, B)
        cand = jnp.where(row_idx >= k, col, -1.0)
        p = jnp.argmax(cand, axis=0)  # (B,)

        onehot_p = row_idx == p[None, :]  # (n, B)
        is_k = (row_idx == k)  # (n, 1)
        row_k = aug[k]  # (2n, B)
        row_p = jnp.sum(jnp.where(onehot_p[:, None, :], aug, 0.0), axis=0)
        aug = jnp.where(
            is_k[:, :, None], row_p[None, :, :],
            jnp.where(onehot_p[:, None, :], row_k[None, :, :], aug),
        )
        pivot = row_p[k]  # (B,)
        pivot_row = row_p / pivot[None, :]  # (2n, B)
        aug = jnp.where(is_k[:, :, None], pivot_row[None, :, :], aug)
        factors = jnp.where(is_k, 0.0, aug[:, k, :])  # (n, B)
        aug = aug - factors[:, None, :] * pivot_row[None, :, :]
    return aug[:, n:, :]


def _gj_inverse_nopivot(s_mat):
    """Invert (n, n, B) via Gauss-Jordan WITHOUT pivot search.

    Valid for symmetric definite matrices (diagonal pivots never vanish):
    the dual-Riccati y-chain blocks are negative definite, so the pivot
    search + row-swap selects of `_gj_inverse` (~40% of the per-step
    tableau passes) are pure overhead there.
    """
    n = s_mat.shape[0]
    bt = s_mat.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=s_mat.dtype)[:, :, None], (n, n, bt))
    aug = jnp.concatenate([s_mat, eye], axis=1)  # (n, 2n, B)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    for k in range(n):
        pivot_row = aug[k] / aug[k, k][None, :]  # (2n, B)
        is_k = row_idx == k
        factors = jnp.where(is_k, 0.0, aug[:, k, :])  # (n, B)
        aug = jnp.where(
            is_k[:, :, None], pivot_row[None, :, :],
            aug - factors[:, None, :] * pivot_row[None, :, :],
        )
    return aug[:, n:, :]


def _gj_inverse_nopivot_inplace(s_mat):
    """Invert (n, n, B) in place (no augmented tableau, no pivot search).

    The classic in-situ Jordan inversion: at step k the stored array holds
    the partially inverted matrix, so the identity half of the augmented
    tableau is never materialized — each elimination step updates an
    (n, n, B) array instead of (n, 2n, B), ~2x less VPU tile traffic than
    `_gj_inverse_nopivot` at the same flop recurrence. Only valid without
    pivoting (a row swap would scramble the implicit column permutation),
    i.e. for the symmetric-definite blocks this kernel feeds it.
    """
    n = s_mat.shape[0]
    a = s_mat
    dt = s_mat.dtype
    # Float one-hot masks instead of boolean selects: Mosaic cannot insert
    # a non-trivial minor dim on sub-32-bit (i1) vectors, and multiplicative
    # masking maps to plain VPU fma anyway.
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    for k in range(n):
        ipiv = 1.0 / a[k, k]  # (B,)
        ekr = (row_idx == k).astype(dt)  # (n, 1) one-hot at k
        ekc = (col_idx == k).astype(dt)  # (1, n) one-hot at k
        # row k of the result: scaled row, diagonal entry -> 1/pivot.
        # Multiplicative one-hot, NOT p + ekr*(ipiv - p): the blended form
        # computes the diagonal as 1 - a_kk*ipiv + ipiv, whose ~1-sized
        # terms absorb ipiv entirely when a_kk ~ 1e8 (the condensed-W
        # scale) — measured as a catastrophic inverse error.
        p_row = ipiv[None, :] * (a[k] * (1.0 - ekr) + ekr)  # (n, B), by col
        # multipliers; forced to EXACTLY -1 at row k (multiplicative zero
        # then subtract the one-hot — never a - (a+1), which absorbs the 1
        # when a_kk ~ 1e8, the condensed-W scale) so the rank-1 update
        # itself writes +p_row into the (zeroed-by-cross) row k
        f = a[:, k, :] * (1.0 - ekr) - ekr
        # cross mask: zero row k AND column k of a — with f_k = -1 the
        # single fused update then produces every case of the Jordan step:
        #   i!=k, j!=k: a_ij - f_i p_j ; i!=k, j=k: -f_i/pivot ; i=k: p_row.
        cross = ((1.0 - ekr) * (1.0 - ekc))[:, :, None]  # (n, n, 1)
        a = a * cross - f[:, None, :] * p_row[None, :, :]
    return a


def _gj_pair_inplace(a):
    """Invert TWO independent (n, n, L) matrix batches packed side by side
    in COLUMNS of one (n, 2n, L) array, in place, no pivot search.

    Sublane-packing lever (BENCH.md round-2 "Speed of light" (b)): the two
    4-wide foot blocks of the split condensed factorization each store
    (4, 4, L) — only 4 of 8 sublanes of every VPU tile carry data. Packing
    [K_L | K_R] column-wise fills the tile exactly: each Jordan step
    eliminates row k of BOTH matrices simultaneously (identical column
    structure), with per-half pivots and two half-masked rank-1 updates.
    Per-half recurrence identical to `_gj_inverse_nopivot_inplace`; the
    tableau passes per step go 2 -> 3, each at full sublane occupancy on
    HALF the lanes. MEASURED NEGATIVE on v5e (BENCH.md round 3 "Sublane
    packing": ric split 30.9 vs 29.9 ms at b4096) — the extra masked
    pass costs more than the occupancy returns; kept as a tested variant
    (`PdipmOptions.foot_pack`), default off. Only valid for the no-pivot
    (symmetric-definite) blocks.
    """
    n = a.shape[0]
    dt = a.dtype
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)
    colv = jax.lax.broadcasted_iota(jnp.int32, (2 * n, 1), 0)  # (2n, 1)
    colh = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * n), 1)  # (1, 2n)
    hl_v = (colv < n).astype(dt)  # (2n, 1) left-half col mask
    hr_v = 1.0 - hl_v
    for k in range(n):
        ipivL = 1.0 / a[k, k]  # (B,)
        ipivR = 1.0 / a[k, n + k]
        ekr = (row_idx == k).astype(dt)  # (n, 1)
        ekc_v = ((colv == k) | (colv == n + k)).astype(dt)  # (2n, 1)
        ekc_h = ((colh == k) | (colh == n + k)).astype(dt)  # (1, 2n)
        # Scaled pivot row for both halves at once; diagonal -> 1/pivot
        # (multiplicative one-hot — see `_gj_inverse_nopivot_inplace` on
        # why the blended form loses the inverse at condensed-W scales).
        ipiv_cols = hl_v * ipivL[None, :] + hr_v * ipivR[None, :]  # (2n, B)
        p_row = ipiv_cols * (a[k] * (1.0 - ekc_v) + ekc_v)  # (2n, B)
        p_row_l = p_row * hl_v
        p_row_r = p_row * hr_v
        # Per-half multipliers, exactly -1 at row k (writes +p_row there).
        f_l = a[:, k, :] * (1.0 - ekr) - ekr  # (n, B)
        f_r = a[:, n + k, :] * (1.0 - ekr) - ekr
        cross = ((1.0 - ekr) * (1.0 - ekc_h))[:, :, None]  # (n, 2n, 1)
        a = (a * cross
             - f_l[:, None, :] * p_row_l[None, :, :]
             - f_r[:, None, :] * p_row_r[None, :, :])
    return a


def _gj_pair_pivot(s_pair):
    """Invert two independent (n, n, L) batches packed column-wise in one
    (n, 2n, L) array WITH per-half, per-lane partial pivoting.

    The augmented foot-split factor needs the pivot search for f32
    robustness (`PdipmOptions.aug_pivot`); packing the two 12-wide foot
    tableaus side by side keeps every augmented-tableau pass at full
    sublane width while halving the lane count, and the stored inverse
    pair feeds the packed `K^-1` apply (full 24-sublane tiles instead of
    two 16-padded 12-wide applies). Each half runs the exact
    `_gj_inverse` recurrence with its own pivot choice and row swaps
    (the halves' row orders evolve independently). MEASURED NEGATIVE on
    v5e (BENCH.md round 3: 85.2 vs 47.9 ms at b4096 — the per-half
    pivot search's swap-mask blends swamp the occupancy win); kept as a
    tested variant, default off.
    """
    n = s_pair.shape[0]
    bt = s_pair.shape[-1]
    dt = s_pair.dtype
    eye = jnp.eye(n, dtype=dt)[:, :, None]
    aug = jnp.concatenate(
        [s_pair[:, :n], jnp.broadcast_to(eye, (n, n, bt)),
         s_pair[:, n:], jnp.broadcast_to(eye, (n, n, bt))], axis=1,
    )  # (n, 4n, B): [A_L | I | A_R | I]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)
    colh = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * n), 1)  # (1, 4n)
    colv = jax.lax.broadcasted_iota(jnp.int32, (4 * n, 1), 0)  # (4n, 1)
    hl_h = (colh < 2 * n).astype(dt)  # (1, 4n) left-tableau mask
    hr_h = 1.0 - hl_h
    hl_v = (colv < 2 * n).astype(dt)  # (4n, 1)
    hr_v = 1.0 - hl_v

    for k in range(n):
        colL = jnp.abs(aug[:, k, :])  # (n, B)
        colR = jnp.abs(aug[:, 2 * n + k, :])
        cand_mask = row_idx >= k
        pL = jnp.argmax(jnp.where(cand_mask, colL, -1.0), axis=0)  # (B,)
        pR = jnp.argmax(jnp.where(cand_mask, colR, -1.0), axis=0)
        ohL = (row_idx == pL[None, :]).astype(dt)  # (n, B)
        ohR = (row_idx == pR[None, :]).astype(dt)
        is_k = (row_idx == k)  # (n, 1)
        isk_f = is_k.astype(dt)
        row_k = aug[k]  # (4n, B)
        row_pL = jnp.sum(ohL[:, None, :] * aug, axis=0)  # (4n, B)
        row_pR = jnp.sum(ohR[:, None, :] * aug, axis=0)
        # Combined swapped-in pivot row: L tableau cols from row pL, R
        # tableau cols from row pR.
        row_p = row_pL * hl_v + row_pR * hr_v  # (4n, B)
        # Swap: row k <- row_p; rows pL/pR receive row_k's matching half.
        swapmask = (ohL[:, None, :] * hl_h[:, :, None]
                    + ohR[:, None, :] * hr_h[:, :, None])  # (n, 4n, B)
        keep = (1.0 - isk_f)[:, :, None] * (1.0 - swapmask)
        aug = (aug * keep
               + isk_f[:, :, None] * row_p[None, :, :]
               + swapmask * row_k[None, :, :])
        pivL = row_p[k]  # (B,)
        pivR = row_p[2 * n + k]
        ipiv_cols = hl_v / pivL[None, :] + hr_v / pivR[None, :]  # (4n, B)
        pivot_row = row_p * ipiv_cols  # (4n, B)
        aug = jnp.where(is_k[:, :, None], pivot_row[None, :, :], aug)
        f_l = (1.0 - isk_f) * aug[:, k, :]  # (n, B)
        f_r = (1.0 - isk_f) * aug[:, 2 * n + k, :]
        aug = (aug
               - f_l[:, None, :] * (pivot_row * hl_v)[None, :, :]
               - f_r[:, None, :] * (pivot_row * hr_v)[None, :, :])
    # [L inverse | R inverse] packed (n, 2n, B)
    return jnp.concatenate([aug[:, n: 2 * n], aug[:, 3 * n:]], axis=1)


def _pdipm_kernel(
    horizon: int,
    opts: PdipmOptions,
    warm: bool,
    # refs: inputs (7 QP refs; +4 state refs x0/s0/z0/y0 when warm)
    # then outputs (x, s, z, y, res) and the scratch ref.
    *refs,
):
    if warm:
        (hd_ref, f_ref, ad_ref, bd_ref, b_ref, gu_ref, d_ref,
         x0_ref, s0_ref, z0_ref, y0_ref,
         x_out, s_out, z_out, y_out, res_out, sinv_ref) = refs
    else:
        (hd_ref, f_ref, ad_ref, bd_ref, b_ref, gu_ref, d_ref,
         x_out, s_out, z_out, y_out, res_out, sinv_ref) = refs
    T = horizon
    nz = 2 * NX * T
    ni = N_INEQ_PER_STAGE * T
    ne = (NX + N_MX_PER_STAGE) * T
    gj_nopivot = (
        _gj_inverse_nopivot_inplace
        if opts.gj_form == "inplace"
        else _gj_inverse_nopivot
    )

    def jacobi_scaled(gj, k_st):
        """`opts.kkt_scale == "jacobi"`: invert through the symmetric
        diagonally-equilibrated form K_hat = D K D, D = rsqrt(|diag K|)
        (K^-1 = D K_hat^-1 D exactly; see PdipmOptions.kkt_scale). Pure
        factorization preconditioning — the reference iterate rule is
        untouched. k_st: lane-stacked (n, n, L)."""
        if opts.kkt_scale != "jacobi":
            return gj(k_st)
        n = k_st.shape[0]
        dia = jnp.concatenate(
            [jnp.abs(k_st[i, i])[None, :] for i in range(n)], axis=0
        )  # (n, L)
        dsc = jax.lax.rsqrt(jnp.maximum(dia, 1e-30))
        k_hat = k_st * dsc[:, None, :] * dsc[None, :, :]
        return gj(k_hat) * dsc[:, None, :] * dsc[None, :, :]

    hd = hd_ref[...]  # (nz, B)
    f = f_ref[...]
    ad = ad_ref[...]  # (12, 12, B)
    bd = bd_ref[...]
    b = b_ref[...]  # (ne, B)
    gu = gu_ref[...]  # (16, 12, B)
    d = d_ref[...]  # (ni, B)
    bt = hd.shape[-1]
    dtype = hd.dtype

    # Mx selector rows built from iota (pallas kernels cannot capture host
    # constants): e_sel[0, 6] = e_sel[1, 9] = 1.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (N_MX_PER_STAGE, NU), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (N_MX_PER_STAGE, NU), 1)
    e2 = (((row_i == 0) & (col_i == 6)) | ((row_i == 1) & (col_i == 9))).astype(
        dtype
    )
    e_sel = jnp.broadcast_to(e2[:, :, None], (N_MX_PER_STAGE, NU, bt))
    col12 = jax.lax.broadcasted_iota(jnp.int32, (NU, 1), 0)[:, 0]
    onehot6 = (col12 == 6).astype(dtype)  # (12,)
    onehot9 = (col12 == 9).astype(dtype)

    def split_xu(v):  # (nz, B) -> (T, 12, B), (T, 12, B)
        return (v[: NX * T].reshape(T, NX, bt), v[NX * T:].reshape(T, NU, bt))

    def g_mv(v):  # G @ v -> (ni, B)
        _, u = split_xu(v)
        out = jnp.sum(gu[None] * u[:, None, :, :], axis=2)  # (T, 16, B)
        return out.reshape(ni, bt)

    def gT_mv(lam):  # (ni, B) -> (nz, B)
        lam_s = lam.reshape(T, N_INEQ_PER_STAGE, bt)
        out = jnp.sum(gu[None] * lam_s[:, :, None, :], axis=1)  # (T, 12, B)
        return jnp.concatenate(
            [jnp.zeros((NX * T, bt), dtype), out.reshape(NU * T, bt)], axis=0
        )

    def a_mv(v):  # A @ v -> (ne, B)
        xs, u = split_xu(v)
        prev = jnp.concatenate([jnp.zeros((1, NX, bt), dtype), xs[:-1]], axis=0)
        adp = jnp.sum(ad[None] * prev[:, None, :, :], axis=2)  # (T, 12, B)
        bdu = jnp.sum(bd[None] * u[:, None, :, :], axis=2)
        dyn = (xs - adp - bdu).reshape(NX * T, bt)
        mx = jnp.stack([u[:, 6, :], u[:, 9, :]], axis=1).reshape(
            N_MX_PER_STAGE * T, bt
        )
        return jnp.concatenate([dyn, mx], axis=0)

    def aT_mv(y):  # (ne, B) -> (nz, B)
        ydyn = y[: NX * T].reshape(T, NX, bt)
        ymx = y[NX * T:].reshape(T, N_MX_PER_STAGE, bt)
        ynext = jnp.concatenate([ydyn[1:], jnp.zeros((1, NX, bt), dtype)], axis=0)
        # grad_x[t, j] = ydyn[t, j] - sum_i Ad[i, j] ynext[t, i]
        gx = ydyn - jnp.sum(ad[None] * ynext[:, :, None, :], axis=1)
        gub = -jnp.sum(bd[None] * ydyn[:, :, None, :], axis=1)  # (T, 12, B)
        gub = gub + onehot6[None, :, None] * ymx[:, 0:1, :] \
            + onehot9[None, :, None] * ymx[:, 1:2, :]
        return jnp.concatenate(
            [gx.reshape(NX * T, bt), gub.reshape(NU * T, bt)], axis=0
        )

    def frac_to_boundary(v, dv):
        cand = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), 1.0)
        alpha = jnp.minimum(1.0, opts.frac_to_boundary * jnp.min(cand, axis=0))
        return jnp.maximum(alpha, opts.alpha_min)  # (B,)

    q_diag = hd[:NX]  # (12, B): per-env state weights (tiled across stages)
    r_diag = hd[NX * T: NX * T + NU]

    # x-block elimination: the x_{t+1} rows have a diagonal, well-conditioned
    # pivot (Q + beta >= 1), so they are condensed analytically and the GJ
    # runs on 26-wide blocks [u(12), nu(2), y(12)] — ~3x fewer elimination
    # flops and half the stage-inverse storage vs the full 38-wide form.
    q_inv = 1.0 / (q_diag + opts.beta)  # (12, B)

    def factor(w_inv):
        """Thomas forward pass: store per-stage condensed inverses."""
        w_s = w_inv.reshape(T, N_INEQ_PER_STAGE, bt)

        def stage(t, m_prev):
            # u-block Hessian: R + beta + G^T W^-1 G
            gtwg = jnp.sum(
                gu[:, :, None, :] * gu[:, None, :, :] * w_s[t][:, None, None, :],
                axis=0,
            )  # (12, 12, B)
            eye12 = jnp.eye(NX, dtype=dtype)[:, :, None]
            ru = gtwg + eye12 * (r_diag[:, None, :] + opts.beta)
            # y,y: -delta I - Ad M_prev Ad^T (Riccati) - Q~^-1 (x elimination)
            adm = _mm(ad, m_prev)  # (12, 12, B)
            # admadt[i, l] = sum_k adm[i, k] ad[l, k]
            admadt = jnp.sum(adm[:, None, :, :] * ad[None, :, :, :], axis=2)
            yy = -opts.delta * eye12 - admadt - eye12 * q_inv[:, None, :]
            z_nu2 = -opts.delta * jnp.broadcast_to(
                jnp.eye(N_MX_PER_STAGE, dtype=dtype)[:, :, None],
                (N_MX_PER_STAGE, N_MX_PER_STAGE, bt),
            )
            zf = lambda r, c: jnp.zeros((r, c, bt), dtype)
            # rows [u, nu, y] x cols [u(12), nu(2), y(12)]
            row_u = jnp.concatenate(
                [ru, jnp.swapaxes(e_sel, 0, 1), -jnp.swapaxes(bd, 0, 1)],
                axis=1)
            row_nu = jnp.concatenate(
                [e_sel, z_nu2, zf(N_MX_PER_STAGE, NX)], axis=1)
            row_y = jnp.concatenate([-bd, zf(NX, N_MX_PER_STAGE), yy], axis=1)
            s_mat = jnp.concatenate([row_u, row_nu, row_y], axis=0)

            s_inv = _gj_inverse(s_mat)  # (SC, SC, B)
            sinv_ref[t] = s_inv
            # Riccati xx-inverse, closed form: M = Q~^-1 + Q~^-1 Nyy Q~^-1
            nyy = s_inv[_CY0:, _CY0:, :]  # (12, 12, B)
            m_next = eye12 * q_inv[:, None, :] \
                + q_inv[:, None, :] * nyy * q_inv[None, :, :]
            return m_next

        m_prev = jnp.zeros((NX, NX, bt), dtype)
        for t in range(T):
            m_prev = stage(t, m_prev)

    def pack_stage(r1, r4):
        """canonical rhs -> condensed (T, 26, B) blocks + x-rhs (T, 12, B).

        The condensed y-row rhs is r_y - Q~^-1 r_x (from the x elimination)."""
        rx = r1[: NX * T].reshape(T, NX, bt)
        ru = r1[NX * T:].reshape(T, NU, bt)
        ry = r4[: NX * T].reshape(T, NX, bt)
        rnu = r4[NX * T:].reshape(T, N_MX_PER_STAGE, bt)
        ry_c = ry - q_inv[None] * rx
        return jnp.concatenate([ru, rnu, ry_c], axis=1), rx

    def thomas_solve(r1_hat, r4):
        """Two-sweep condensed solve; x recovered per stage in closed form."""
        r, rx_s = pack_stage(r1_hat, r4)  # (T, SC, B), (T, 12, B)

        g_list = []
        sol_prev_x = jnp.zeros((NX, bt), dtype)
        for t in range(T):
            r_t = r[t]
            g_t = jnp.concatenate(
                [r_t[:_CY0], r_t[_CY0:] + _mv(ad, sol_prev_x)], axis=0
            )
            g_list.append(g_t)
            sol = _mv(sinv_ref[t], g_t)  # (SC, B)
            # x = Q~^-1 (r_x - y)
            sol_prev_x = q_inv * (rx_s[t] - sol[_CY0:, :])

        w_list = [None] * T
        x_list = [None] * T
        w_y_next = jnp.zeros((NX, bt), dtype)
        for t in range(T - 1, -1, -1):
            # next stage's dual couples into this stage's x-row: the x-rhs
            # becomes r_x + Ad^T w_y_next, shifting the condensed y-rhs by
            # -Q~^-1 Ad^T w_y_next. NOTE: slice and None must be separate
            # indexing ops (combined -> gather Mosaic rejects).
            adT_wy = jnp.sum(ad * w_y_next[:, None, :], axis=0)  # (12, B)
            g_t = g_list[t]
            g_mod = jnp.concatenate(
                [g_t[:_CY0], g_t[_CY0:] - q_inv * adT_wy], axis=0
            )
            w_t = _mv(sinv_ref[t], g_mod)
            w_y = w_t[_CY0:, :]
            x_list[t] = q_inv * (rx_s[t] + adT_wy - w_y)
            w_list[t] = w_t
            w_y_next = w_y
        w = jnp.stack(w_list)
        xs = jnp.stack(x_list)

        du = w[:, :NU, :].reshape(NU * T, bt)
        dnu = w[:, NU:_CY0, :].reshape(N_MX_PER_STAGE * T, bt)
        dy = w[:, _CY0:, :].reshape(NX * T, bt)
        dx = xs.reshape(NX * T, bt)
        dxz = jnp.concatenate([dx, du], axis=0)
        dyv = jnp.concatenate([dy, dnu], axis=0)
        return dxz, dyv

    # ------------------------------------------------------------------
    # Two-level condensed variant (opts.backend == "ric"): work-minimal.
    #
    # The kernel is VPU-tile-throughput-bound (measured: the removed
    # lane-stacked cyclic-reduction variant's depth win was exactly offset
    # by its extra tiles — see the module docstring), so the lever is
    # total elimination work. Per stage the [u (12), nu (2)] block K_t
    # couples to the dual y_t only through F = [-Bd, 0]; all T K_t inverses
    # are independent and are lane-concatenated into ONE 14-wide GJ.
    # Eliminating [u, nu] leaves a pure y-chain 12x12 block-tridiagonal
    # (static coupling S = Q~^-1 Ad^T) factored by a sequential dual-Riccati
    # sweep of 12-wide inverses — ~5x less sequential work than the 26-wide
    # Thomas sweep and ~2x fewer total elimination flops. Validated against
    # the pure-JAX "ric" backend (which matches the golden solver).
    # ------------------------------------------------------------------

    def split_lanes(x, n):
        return [x[..., i * bt: (i + 1) * bt] for i in range(n)]

    def _ric_tail_bkb(bkb_st):
        """Shared dual-Riccati y-chain from Bd (K^-1)_uu Bd^T (lane-stacked).

        Returns (yhat_inv list of T (12,12,bt), s_coup (12,12,bt),
        bd_st (12,12,T*bt)) — used by "ric"/"ric2"/foot-split variants."""
        eye12 = jnp.eye(NX, dtype=dtype)[:, :, None]
        bd_st = jnp.concatenate([bd] * T, axis=-1)
        bkb = split_lanes(bkb_st, T)

        adq = ad * q_inv[None, :, :]
        adqad = jnp.sum(adq[:, None, :, :] * ad[None, :, :, :], axis=2)
        s_coup = q_inv[:, None, :] * jnp.swapaxes(ad, 0, 1)  # Q~^-1 Ad^T
        s_coup_t = jnp.swapaxes(s_coup, 0, 1)

        yhat_inv = []
        m_prev = None
        for t in range(T):
            yy = -opts.delta * eye12 - eye12 * q_inv[:, None, :] - bkb[t]
            if t >= 1:
                yy = yy - adqad - _mm(_mm(s_coup_t, m_prev), s_coup)
            m_prev = gj_nopivot(yy)  # yy is negative definite
            yhat_inv.append(m_prev)
        return yhat_inv, s_coup, bd_st

    def _ric_tail(kuu_st):
        """`_ric_tail_bkb` from a dense (12, 12, T*bt) (K^-1)_uu."""
        bd_st = jnp.concatenate([bd] * T, axis=-1)
        bkb_st = _mm(_mm(bd_st, kuu_st), jnp.swapaxes(bd_st, 0, 1))
        return _ric_tail_bkb(bkb_st)

    # ------------------------------------------------------------------
    # Foot-split helpers (opts.foot_split): the stage blocks decompose
    # EXACTLY by foot — no cost term, G row, or Mx selector couples foot
    # L's inputs {F_L, M_L} to foot R's (only the dynamics do, and they
    # live in the y-chain). u = [F_L(0:3), F_R(3:6), M_L(6:9), M_R(9:12)];
    # per foot the dense coupling is {F(3), M_y(1)} (+ that foot's z rows
    # in the augmented form), M_x pairs with its nu row in a W-independent
    # 2x2, and M_z is bare diagonal. Verified exactly (zero off-block
    # entries; blockwise inverse == dense inverse, tests vs f64 golden).
    # Elimination work: two 4-wide (ric) / 12-wide (ric_aug) lane-stacked
    # GJs instead of one 14-/30-wide — ~21x / ~7.8x fewer factor flops.
    # ------------------------------------------------------------------

    def _cols_L(m):  # (r, 12, B) -> (r, 4, B): cols {0, 1, 2, 7}
        return jnp.concatenate([m[:, 0:3], m[:, 7:8]], axis=1)

    def _cols_R(m):  # cols {3, 4, 5, 10}
        return jnp.concatenate([m[:, 3:6], m[:, 10:11]], axis=1)

    def _pair_single_coeffs():
        """Per-env inverse coefficients of the W-independent sub-blocks.

        [M_x, nu] 2x2 = [[r+beta, 1], [1, -delta]] per foot, plus bare M_z
        scalars; all constant across stages AND iterations. All entries are
        keepdims (1, B) rows — Mosaic's layout inference rejects the
        implicit-dim layouts rank-dropping row reads produce (sublane
        offset >= tile height check in InferVectorLayout)."""
        out = {}
        for name, j in (("6", 6), ("9", 9)):
            rj = r_diag[j:j + 1] + opts.beta  # (1, B)
            det = -rj * opts.delta - 1.0
            out[name] = (-opts.delta / det, -1.0 / det, rj / det)
        out["8"] = 1.0 / (r_diag[8:9] + opts.beta)
        out["11"] = 1.0 / (r_diag[11:12] + opts.beta)
        return out

    def _tile_lanes(x, n):
        return jnp.concatenate([x] * n, axis=-1)

    def _bkb_couter(cf):
        """W-independent scalar columns: c_j * bd_j bd_j^T, same every
        stage. Keepdims slices only (see `_pair_single_coeffs`)."""
        couter = None
        for j, c in ((6, cf["6"][0]), (8, cf["8"]),
                     (9, cf["9"][0]), (11, cf["11"])):
            bj = bd[:, j:j + 1, :]  # (12, 1, B)
            o = bj * jnp.swapaxes(bj, 0, 1) * c[None]  # c: (1, B)
            couter = o if couter is None else couter + o
        return _tile_lanes(couter, T)

    def _split_bkb(k4L_inv_st, k4R_inv_st, cf):
        """Bd (K^-1)_uu Bd^T from the foot-split pieces, lane-stacked."""
        bdL4_st = _tile_lanes(_cols_L(bd), T)  # (12, 4, T*bt)
        bdR4_st = _tile_lanes(_cols_R(bd), T)
        bkb = _mm(_mm(bdL4_st, k4L_inv_st), jnp.swapaxes(bdL4_st, 0, 1)) \
            + _mm(_mm(bdR4_st, k4R_inv_st), jnp.swapaxes(bdR4_st, 0, 1))
        return bkb + _bkb_couter(cf)

    def _split_bkb_pack(k8_st, cf):
        """`_split_bkb` from the PACKED (4, 8, T*bt) [K_L^-1 | K_R^-1]
        inverse pair: the dominant (12, 12, ...) outer contraction runs
        over the packed 8-column axis in one full-sublane pass instead of
        two 8-padded 4-wide passes. (Part of the measured-negative
        foot_pack variant set — see `_gj_pair_inplace`.)"""
        bdL4_st = _tile_lanes(_cols_L(bd), T)  # (12, 4, T*bt)
        bdR4_st = _tile_lanes(_cols_R(bd), T)
        # m1 = [Bd_L K_L^-1 | Bd_R K_R^-1]  (12, 8, T*bt)
        m1 = jnp.concatenate(
            [_mm(bdL4_st, k8_st[:, 0:4, :]), _mm(bdR4_st, k8_st[:, 4:8, :])],
            axis=1)
        bd_p = jnp.concatenate([bdL4_st, bdR4_st], axis=1)  # (12, 8, T*bt)
        # bkb[i, l] = sum_j m1[i, j] bd_p[l, j] — one packed contraction.
        bkb = jnp.sum(m1[:, None, :, :] * bd_p[None, :, :, :], axis=2)
        return bkb + _bkb_couter(cf)

    def factor_ric_split(w_inv):
        """Foot-split "ric" factor: two lane-stacked 4-wide SPD inverses.

        Returns (kinv callable, yhat_inv, s_coup, bd_st) — drop-in for
        `factor_ric` (same `ric_solve`)."""
        w_s = w_inv.reshape(T, N_INEQ_PER_STAGE, bt)
        eye4 = jnp.eye(4, dtype=dtype)[:, :, None]
        guL4 = _cols_L(gu[0:8])  # (8, 4, B): foot-L rows x active cols
        guR4 = _cols_R(gu[8:16])
        rL = jnp.concatenate([r_diag[0:3], r_diag[7:8]], axis=0)  # (4, B)
        rR = jnp.concatenate([r_diag[3:6], r_diag[10:11]], axis=0)

        ksL, ksR = [], []
        for t in range(T):
            gtwgL = jnp.sum(
                guL4[:, :, None, :] * guL4[:, None, :, :]
                * w_s[t][0:8][:, None, None, :], axis=0)  # (4, 4, B)
            gtwgR = jnp.sum(
                guR4[:, :, None, :] * guR4[:, None, :, :]
                * w_s[t][8:16][:, None, None, :], axis=0)
            ksL.append(gtwgL + eye4 * (rL[:, None, :] + opts.beta))
            ksR.append(gtwgR + eye4 * (rR[:, None, :] + opts.beta))
        cf = _pair_single_coeffs()
        c6 = tuple(_tile_lanes(c, T) for c in cf["6"])
        c9 = tuple(_tile_lanes(c, T) for c in cf["9"])
        c8 = _tile_lanes(cf["8"], T)
        c11 = _tile_lanes(cf["11"], T)

        if opts.foot_pack:
            if opts.foot_pack == "apply":
                # Apply-only packing: keep the (measured-faster) lane-
                # stacked GJ, then repack the stored inverses column-wise
                # so every K^-1 apply runs at full sublane width.
                k4_inv = gj_nopivot(jnp.concatenate(ksL + ksR, axis=-1))
                L = T * bt
                k8 = jnp.concatenate(
                    [k4_inv[..., :L], k4_inv[..., L:]], axis=1)
            else:
                # Fully packed: ONE (4, 8, T*bt) paired no-pivot GJ — both
                # feet share each elimination step at full tile occupancy.
                pair = jnp.concatenate(
                    [jnp.concatenate([kl, kr], axis=1)
                     for kl, kr in zip(ksL, ksR)], axis=-1)  # (4, 8, T*bt)
                k8 = _gj_pair_inplace(pair)

            def kinv(r_st):  # (14, L) -> (14, L); keepdims rows (layout)
                rhs8 = jnp.concatenate(
                    [r_st[0:3], r_st[7:8], r_st[3:6], r_st[10:11]], axis=0)
                prod = k8 * rhs8[None, :, :]  # (4, 8, L) full sublanes
                duL4 = jnp.sum(prod[:, 0:4, :], axis=1)  # (4, L)
                duR4 = jnp.sum(prod[:, 4:8, :], axis=1)
                du6 = c6[0] * r_st[6:7] + c6[1] * r_st[12:13]
                dn0 = c6[1] * r_st[6:7] + c6[2] * r_st[12:13]
                du9 = c9[0] * r_st[9:10] + c9[1] * r_st[13:14]
                dn1 = c9[1] * r_st[9:10] + c9[2] * r_st[13:14]
                return jnp.concatenate([
                    duL4[0:3], duR4[0:3], du6, duL4[3:4],
                    c8 * r_st[8:9], du9, duR4[3:4],
                    c11 * r_st[11:12], dn0, dn1,
                ], axis=0)

            bkb_st = _split_bkb_pack(k8, cf)
            return (kinv,) + _ric_tail_bkb(bkb_st)

        # ONE 4-wide no-pivot GJ over [L stages | R stages] lanes (SPD).
        k4_inv = jacobi_scaled(gj_nopivot, jnp.concatenate(ksL + ksR, axis=-1))
        L = T * bt
        k4L_inv_st = k4_inv[..., :L]
        k4R_inv_st = k4_inv[..., L:]

        def kinv(r_st):  # (14, L) -> (14, L); keepdims rows only (layout)
            duL4 = _mv(k4L_inv_st, jnp.concatenate(
                [r_st[0:3], r_st[7:8]], axis=0))
            duR4 = _mv(k4R_inv_st, jnp.concatenate(
                [r_st[3:6], r_st[10:11]], axis=0))
            du6 = c6[0] * r_st[6:7] + c6[1] * r_st[12:13]
            dn0 = c6[1] * r_st[6:7] + c6[2] * r_st[12:13]
            du9 = c9[0] * r_st[9:10] + c9[1] * r_st[13:14]
            dn1 = c9[1] * r_st[9:10] + c9[2] * r_st[13:14]
            return jnp.concatenate([
                duL4[0:3], duR4[0:3], du6, duL4[3:4],
                c8 * r_st[8:9], du9, duR4[3:4],
                c11 * r_st[11:12], dn0, dn1,
            ], axis=0)

        bkb_st = _split_bkb(k4L_inv_st, k4R_inv_st, cf)
        return (kinv,) + _ric_tail_bkb(bkb_st)

    def factor_ric_aug_split(w_diag):
        """Foot-split "ric_aug" factor: two lane-stacked 12-wide pivoted
        GJs [F(3), M_y(1), z_f(8)] instead of one 30-wide — the same
        per-block partial pivoting that makes the augmented form f32-robust
        (pivoting across exactly-decoupled blocks is vacuous), at ~7.8x
        fewer elimination flops. Returns (kinv, yhat_inv, s_coup, bd_st)."""
        w_s = w_diag.reshape(T, N_INEQ_PER_STAGE, bt)
        guL4 = _cols_L(gu[0:8])  # (8, 4, B)
        guR4 = _cols_R(gu[8:16])
        rL = jnp.concatenate([r_diag[0:3], r_diag[7:8]], axis=0)
        rR = jnp.concatenate([r_diag[3:6], r_diag[10:11]], axis=0)
        eye4 = jnp.eye(4, dtype=dtype)[:, :, None]
        zi = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        zj = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
        z_eye8 = (zi == zj).astype(dtype)[:, :, None]  # (8, 8, 1)

        def foot_blocks(gu4, rr, w_rows):
            ks = []
            for t in range(T):
                ww = -z_eye8 * w_rows[t][:, None, :]  # diag(-W_f)
                row_u = jnp.concatenate(
                    [eye4 * (rr[:, None, :] + opts.beta),
                     jnp.swapaxes(gu4, 0, 1)], axis=1)  # (4, 12, B)
                row_z = jnp.concatenate([gu4, ww], axis=1)  # (8, 12, B)
                ks.append(jnp.concatenate([row_u, row_z], axis=0))
            return ks

        ksL = foot_blocks(guL4, rL, [w_s[t][0:8] for t in range(T)])
        ksR = foot_blocks(guR4, rR, [w_s[t][8:16] for t in range(T)])
        cf = _pair_single_coeffs()
        c6 = tuple(_tile_lanes(c, T) for c in cf["6"])
        c9 = tuple(_tile_lanes(c, T) for c in cf["9"])
        c8 = _tile_lanes(cf["8"], T)
        c11 = _tile_lanes(cf["11"], T)

        def kinv_from(apply_lr):
            """Common assembly from (rhs_L12, rhs_R12) -> (wL, wR)."""
            def kinv(r_st):  # (30, L) -> (30, L); rows [u(12), z(16),
                # nu(2)]; keepdims rows only (`_pair_single_coeffs` note)
                rhsL = jnp.concatenate(
                    [r_st[0:3], r_st[7:8], r_st[12:20]], axis=0)
                rhsR = jnp.concatenate(
                    [r_st[3:6], r_st[10:11], r_st[20:28]], axis=0)
                wL, wR = apply_lr(rhsL, rhsR)
                du6 = c6[0] * r_st[6:7] + c6[1] * r_st[28:29]
                dn0 = c6[1] * r_st[6:7] + c6[2] * r_st[28:29]
                du9 = c9[0] * r_st[9:10] + c9[1] * r_st[29:30]
                dn1 = c9[1] * r_st[9:10] + c9[2] * r_st[29:30]
                return jnp.concatenate([
                    wL[0:3], wR[0:3], du6, wL[3:4],
                    c8 * r_st[8:9], du9, wR[3:4],
                    c11 * r_st[11:12],
                    wL[4:12], wR[4:12], dn0, dn1,
                ], axis=0)
            return kinv

        if opts.foot_pack:
            # Sublane-packed: every K^-1 apply becomes a full-24-sublane
            # product instead of two 16-padded 12-wide matvecs. Two
            # factor routes: foot_pack="apply" keeps the lane-stacked GJ
            # and just repacks its result column-wise; foot_pack=True
            # also pairs the GJ itself ((12, 24, T*bt) tableau, per-half
            # pivot search when aug_pivot) — measured slower (BENCH.md
            # round 3), kept as the tested full-pack variant.
            if opts.foot_pack == "apply":
                aug_gj = _gj_inverse if opts.aug_pivot else gj_nopivot
                ka_inv = aug_gj(jnp.concatenate(ksL + ksR, axis=-1))
                L = T * bt
                ka_pack = jnp.concatenate(
                    [ka_inv[..., :L], ka_inv[..., L:]], axis=1)
            else:
                pair = jnp.concatenate(
                    [jnp.concatenate([kl, kr], axis=1)
                     for kl, kr in zip(ksL, ksR)], axis=-1)  # (12,24,T*bt)
                ka_pack = (
                    _gj_pair_pivot(pair) if opts.aug_pivot
                    else _gj_pair_inplace(pair)
                )  # (12, 24, T*bt) = [K_L^-1 | K_R^-1]

            def apply_lr(rhsL, rhsR):
                rhs24 = jnp.concatenate([rhsL, rhsR], axis=0)  # (24, L)
                prod = ka_pack * rhs24[None, :, :]  # (12, 24, L)
                return (jnp.sum(prod[:, 0:12, :], axis=1),
                        jnp.sum(prod[:, 12:24, :], axis=1))

            k8_like = jnp.concatenate(
                [ka_pack[0:4, 0:4, :], ka_pack[0:4, 12:16, :]], axis=1)
            bkb_st = _split_bkb_pack(k8_like, cf)
            return (kinv_from(apply_lr),) + _ric_tail_bkb(bkb_st)

        aug_gj = _gj_inverse if opts.aug_pivot else gj_nopivot
        ka_inv = jacobi_scaled(
            aug_gj, jnp.concatenate(ksL + ksR, axis=-1))  # (12,12,2T*bt)
        L = T * bt
        kaL_inv_st = ka_inv[..., :L]
        kaR_inv_st = ka_inv[..., L:]

        def apply_lr(rhsL, rhsR):
            return _mv(kaL_inv_st, rhsL), _mv(kaR_inv_st, rhsR)

        bkb_st = _split_bkb(
            kaL_inv_st[0:4, 0:4], kaR_inv_st[0:4, 0:4], cf)
        return (kinv_from(apply_lr),) + _ric_tail_bkb(bkb_st)

    def factor_ric2(w_inv):
        """Rank-2 variant of `factor_ric`: the 2-wide nu block (diagonal
        -delta pivot) is eliminated by the Schur identity instead of sitting
        in the GJ, so the lane-stacked inverse is 12-wide SPD Ru only
        (no-pivot). K^-1 is applied through the block formula
          K^-1 = [[Ru^-1 + Ru^-1 E^T S^-1 E Ru^-1, -Ru^-1 E^T S^-1],
                  [-S^-1 E Ru^-1,                   S^-1]],
        S = -delta I - E Ru^-1 E^T (2x2, negative definite). E Ru^-1 is rows
        [6, 9] of the symmetric Ru^-1 — a free static slice.

        Returns (kinv callable, yhat_inv, s_coup, bd_st)."""
        w_s = w_inv.reshape(T, N_INEQ_PER_STAGE, bt)
        eye12 = jnp.eye(NX, dtype=dtype)[:, :, None]

        ks = []
        for t in range(T):
            gtwg = jnp.sum(
                gu[:, :, None, :] * gu[:, None, :, :] * w_s[t][:, None, None, :],
                axis=0,
            )
            ks.append(gtwg + eye12 * (r_diag[:, None, :] + opts.beta))
        ru_inv_st = jacobi_scaled(gj_nopivot, jnp.concatenate(ks, axis=-1))

        # E Ru^-1 (2, 12, T*bt) and S^-1 (2, 2, T*bt) in closed form.
        erui_st = jnp.concatenate(
            [ru_inv_st[6][None], ru_inv_st[9][None]], axis=0
        )
        sa = -opts.delta - ru_inv_st[6, 6]
        sb = -ru_inv_st[6, 9]
        sc_ = -opts.delta - ru_inv_st[9, 9]
        det = sa * sc_ - sb * sb
        snu_inv_st = jnp.concatenate(
            [
                jnp.concatenate([(sc_ / det)[None], (-sb / det)[None]], axis=0)[None],
                jnp.concatenate([(-sb / det)[None], (sa / det)[None]], axis=0)[None],
            ],
            axis=0,
        )  # (2, 2, T*bt)

        # kuu = Ru^-1 + (E Ru^-1)^T S^-1 (E Ru^-1): rank-2 update.
        si_er = _mm(snu_inv_st, erui_st)  # (2, 12, T*bt)
        kuu_st = ru_inv_st + _mtm(erui_st, si_er)

        kinv = lambda r: _kinv2_apply(ru_inv_st, erui_st, snu_inv_st, r)
        return (kinv,) + _ric_tail(kuu_st)

    def _kinv2_apply(ru_inv_st, erui_st, snu_inv_st, r_un_st):
        """K^-1 @ [r_u; r_nu] via the rank-2 block formula; (14, L)->(14, L)."""
        r_u = r_un_st[:NU]
        r_nu = r_un_st[NU:]
        t1 = _mv(ru_inv_st, r_u)  # (12, L)
        e_t1 = jnp.concatenate([t1[6][None], t1[9][None]], axis=0)  # (2, L)
        eta = _mv(snu_inv_st, r_nu - e_t1)  # (2, L) = dnu
        # du = Ru^-1 (r_u - E^T eta) = t1 - (E Ru^-1)^T eta (Ru^-1 symmetric).
        du = t1 - jnp.sum(erui_st * eta[:, None, :], axis=0)
        return jnp.concatenate([du, eta], axis=0)

    def factor_ric(w_inv):
        """Returns (kinv callable, yhat_inv list of T (12,12,bt),
        s_coup (12,12,bt), bd_st (12,12,T*bt)) — all values, no scratch."""
        w_s = w_inv.reshape(T, N_INEQ_PER_STAGE, bt)
        eye12 = jnp.eye(NX, dtype=dtype)[:, :, None]
        z_nu2 = -opts.delta * jnp.broadcast_to(
            jnp.eye(N_MX_PER_STAGE, dtype=dtype)[:, :, None],
            (N_MX_PER_STAGE, N_MX_PER_STAGE, bt),
        )

        ks = []
        for t in range(T):
            gtwg = jnp.sum(
                gu[:, :, None, :] * gu[:, None, :, :] * w_s[t][:, None, None, :],
                axis=0,
            )
            ru_b = gtwg + eye12 * (r_diag[:, None, :] + opts.beta)
            row_u = jnp.concatenate([ru_b, jnp.swapaxes(e_sel, 0, 1)], axis=1)
            row_nu = jnp.concatenate([e_sel, z_nu2], axis=1)
            ks.append(jnp.concatenate([row_u, row_nu], axis=0))
        # K_t is symmetric quasi-definite: SPD [u] block (R + beta +
        # G^T W^-1 G), then a negative definite Schur (-delta I - E Ru^-1
        # E^T), so natural-order elimination is stable without pivot search
        # (SPD leading-block growth factor 1); opts.k_pivot restores the
        # searched form for diagnostics.
        k_gj = _gj_inverse if opts.k_pivot else gj_nopivot
        k_inv_st = jacobi_scaled(
            k_gj, jnp.concatenate(ks, axis=-1))  # (14,14,T*bt)

        kinv = lambda r: _mv(k_inv_st, r)
        # Y'_t = Y_t - Bd (K_t^-1)_uu Bd^T, batched across stages in lanes.
        return (kinv,) + _ric_tail(k_inv_st[:NU, :NU, :])

    def ric_solve(r1_hat, r4, kinv, yhat_inv, s_coup, bd_st):
        """Fold rhs onto the y-chain, two 12-wide sweeps, back-substitute."""
        rx = r1_hat[: NX * T].reshape(T, NX, bt)
        ru_r = r1_hat[NX * T:].reshape(T, NU, bt)
        ry = r4[: NX * T].reshape(T, NX, bt)
        rnu = r4[NX * T:].reshape(T, N_MX_PER_STAGE, bt)

        adq = ad * q_inv[None, :, :]
        ry_c = ry - q_inv[None] * rx
        shift = jnp.sum(adq[None] * rx[:, None, :, :], axis=2)  # Ad Q~^-1 c_t
        ry_c = jnp.concatenate([ry_c[:1], ry_c[1:] + shift[:-1]], axis=0)

        r_un = jnp.concatenate([ru_r, rnu], axis=1)  # (T, 14, bt)
        r_un_st = jnp.concatenate([r_un[t] for t in range(T)], axis=-1)
        kr_st = kinv(r_un_st)  # (14, T*bt)
        # r'_y = r_y - F K^-1 r_un = r_y + Bd (K^-1 r_un)_u
        ry2_st = jnp.concatenate(
            [ry_c[t] for t in range(T)], axis=-1
        ) + _mv(bd_st, kr_st[:NU])
        ry2 = split_lanes(ry2_st, T)

        s_coup_t = jnp.swapaxes(s_coup, 0, 1)
        g = []
        g_prev = None
        for t in range(T):
            if g_prev is None:
                g_t = ry2[t]
            else:
                g_t = ry2[t] - _mv(s_coup_t, _mv(yhat_inv[t - 1], g_prev))
            g.append(g_t)
            g_prev = g_t

        wy = [None] * T
        y_next = None
        for t in range(T - 1, -1, -1):
            rhs = g[t] if y_next is None else g[t] - _mv(s_coup, y_next)
            y_next = _mv(yhat_inv[t], rhs)
            wy[t] = y_next
        wy_arr = jnp.stack(wy)  # (T, 12, bt)
        wy_st = jnp.concatenate(wy, axis=-1)  # (12, T*bt)

        # un_t = K^-1 (r_un - F^T y_t) = K^-1 [r_u + Bd^T y_t ; r_nu]
        btwy_st = _mv(jnp.swapaxes(bd_st, 0, 1), wy_st)
        rhs_un_st = jnp.concatenate(
            [r_un_st[:NU] + btwy_st, r_un_st[NU:]], axis=0
        )
        un_st = kinv(rhs_un_st)  # (14, T*bt)
        un = split_lanes(un_st, T)

        xs = q_inv[None] * (rx - wy_arr)
        adTwy = jnp.sum(ad[None] * wy_arr[:, :, None, :], axis=1)
        xs = jnp.concatenate(
            [xs[:-1] + q_inv[None] * adTwy[1:], xs[-1:]], axis=0
        )

        du = jnp.stack([u[:NU] for u in un]).reshape(NU * T, bt)
        dnu = jnp.stack([u[NU:] for u in un]).reshape(N_MX_PER_STAGE * T, bt)
        dy = wy_arr.reshape(NX * T, bt)
        dx = xs.reshape(NX * T, bt)
        return (
            jnp.concatenate([dx, du], axis=0),
            jnp.concatenate([dy, dnu], axis=0),
        )

    # ------------------------------------------------------------------
    # Two-level AUGMENTED variant (opts.backend == "ric_aug"): the "ric"
    # split applied without the G^T W^-1 G condensation. Per stage the
    # 30-wide [u, z, nu] block keeps W (~1e8) and -delta (1e-8) on their
    # own pivoted diagonals (the f32-robustness property of tridiag_aug);
    # all T inverses run as ONE lane-stacked GJ, and the sequential part
    # is the same 12-wide y-chain as "ric". tridiag_aug accuracy class at
    # a fraction of its work.
    # ------------------------------------------------------------------

    NKA = NU + N_INEQ_PER_STAGE + N_MX_PER_STAGE  # 30
    _KZ0 = NU
    _KN0 = NU + N_INEQ_PER_STAGE

    def factor_ric_aug(w_diag):
        """Returns (k_inv_st (30,30,T*bt), yhat_inv list, s_coup, bd_st)."""
        w_s = w_diag.reshape(T, N_INEQ_PER_STAGE, bt)
        eye12 = jnp.eye(NX, dtype=dtype)[:, :, None]
        z_nu2 = -opts.delta * jnp.broadcast_to(
            jnp.eye(N_MX_PER_STAGE, dtype=dtype)[:, :, None],
            (N_MX_PER_STAGE, N_MX_PER_STAGE, bt),
        )
        zi = jax.lax.broadcasted_iota(jnp.int32, (N_INEQ_PER_STAGE, 1), 0)
        zj = jax.lax.broadcasted_iota(jnp.int32, (1, N_INEQ_PER_STAGE), 1)
        z_eye = (zi == zj).astype(dtype)[:, :, None]
        zf = lambda r, c: jnp.zeros((r, c, bt), dtype)
        gu_t = jnp.swapaxes(gu, 0, 1)  # (12, 16, B) = G_u^T
        ru_b = eye12 * (r_diag[:, None, :] + opts.beta)

        ks = []
        for t in range(T):
            ww = -z_eye * w_s[t][:, None, :]  # diag(-W_t)
            row_u = jnp.concatenate(
                [ru_b, gu_t, jnp.swapaxes(e_sel, 0, 1)], axis=1)
            row_z = jnp.concatenate(
                [gu, ww, zf(N_INEQ_PER_STAGE, N_MX_PER_STAGE)], axis=1)
            row_nu = jnp.concatenate(
                [e_sel, zf(N_MX_PER_STAGE, N_INEQ_PER_STAGE), z_nu2], axis=1)
            ks.append(jnp.concatenate([row_u, row_z, row_nu], axis=0))
        # The 30-wide block is symmetric quasi-definite (SPD R+beta leading
        # block, negative definite -W / -delta trailing blocks): natural-
        # order elimination is admissible, and the u-block Schur update
        # keeps the z pivots O(1) even where W_ii ~ 1e-8 (opts.aug_pivot
        # retains the searched form).
        aug_gj = _gj_inverse if opts.aug_pivot else gj_nopivot
        k_inv_st = jacobi_scaled(
            aug_gj, jnp.concatenate(ks, axis=-1))  # (30,30,T*bt)

        kuu_st = k_inv_st[:NU, :NU, :]
        bd_st = jnp.concatenate([bd] * T, axis=-1)
        bkb_st = _mm(_mm(bd_st, kuu_st), jnp.swapaxes(bd_st, 0, 1))
        bkb = split_lanes(bkb_st, T)

        adq = ad * q_inv[None, :, :]
        adqad = jnp.sum(adq[:, None, :, :] * ad[None, :, :, :], axis=2)
        s_coup = q_inv[:, None, :] * jnp.swapaxes(ad, 0, 1)
        s_coup_t = jnp.swapaxes(s_coup, 0, 1)

        yhat_inv = []
        m_prev = None
        for t in range(T):
            yy = -opts.delta * eye12 - eye12 * q_inv[:, None, :] - bkb[t]
            if t >= 1:
                yy = yy - adqad - _mm(_mm(s_coup_t, m_prev), s_coup)
            m_prev = gj_nopivot(yy)  # yy is negative definite
            yhat_inv.append(m_prev)
        return (lambda r: _mv(k_inv_st, r)), yhat_inv, s_coup, bd_st

    def ric_solve_aug(r1, r_z, r4, kinv, yhat_inv, s_coup, bd_st):
        """Returns (dxz, dz, dyv) — the augmented-interface solve."""
        rx = r1[: NX * T].reshape(T, NX, bt)
        ru_r = r1[NX * T:].reshape(T, NU, bt)
        ry = r4[: NX * T].reshape(T, NX, bt)
        rnu = r4[NX * T:].reshape(T, N_MX_PER_STAGE, bt)
        rz = r_z.reshape(T, N_INEQ_PER_STAGE, bt)

        adq = ad * q_inv[None, :, :]
        ry_c = ry - q_inv[None] * rx
        shift = jnp.sum(adq[None] * rx[:, None, :, :], axis=2)
        ry_c = jnp.concatenate([ry_c[:1], ry_c[1:] + shift[:-1]], axis=0)

        r_un = jnp.concatenate([ru_r, rz, rnu], axis=1)  # (T, 30, bt)
        r_un_st = jnp.concatenate([r_un[t] for t in range(T)], axis=-1)
        kr_st = kinv(r_un_st)
        ry2_st = jnp.concatenate(
            [ry_c[t] for t in range(T)], axis=-1
        ) + _mv(bd_st, kr_st[:NU])
        ry2 = split_lanes(ry2_st, T)

        s_coup_t = jnp.swapaxes(s_coup, 0, 1)
        g = []
        g_prev = None
        for t in range(T):
            if g_prev is None:
                g_t = ry2[t]
            else:
                g_t = ry2[t] - _mv(s_coup_t, _mv(yhat_inv[t - 1], g_prev))
            g.append(g_t)
            g_prev = g_t

        wy = [None] * T
        y_next = None
        for t in range(T - 1, -1, -1):
            rhs = g[t] if y_next is None else g[t] - _mv(s_coup, y_next)
            y_next = _mv(yhat_inv[t], rhs)
            wy[t] = y_next
        wy_arr = jnp.stack(wy)
        wy_st = jnp.concatenate(wy, axis=-1)

        btwy_st = _mv(jnp.swapaxes(bd_st, 0, 1), wy_st)
        rhs_un_st = jnp.concatenate(
            [r_un_st[:NU] + btwy_st, r_un_st[NU:]], axis=0
        )
        un_st = kinv(rhs_un_st)
        un = split_lanes(un_st, T)

        xs = q_inv[None] * (rx - wy_arr)
        adTwy = jnp.sum(ad[None] * wy_arr[:, :, None, :], axis=1)
        xs = jnp.concatenate(
            [xs[:-1] + q_inv[None] * adTwy[1:], xs[-1:]], axis=0
        )

        du = jnp.stack([u[:NU] for u in un]).reshape(NU * T, bt)
        dzv = jnp.stack([u[_KZ0:_KN0] for u in un]).reshape(
            N_INEQ_PER_STAGE * T, bt
        )
        dnu = jnp.stack([u[_KN0:] for u in un]).reshape(
            N_MX_PER_STAGE * T, bt
        )
        dy = wy_arr.reshape(NX * T, bt)
        dx = xs.reshape(NX * T, bt)
        return (
            jnp.concatenate([dx, du], axis=0),
            dzv,
            jnp.concatenate([dy, dnu], axis=0),
        )

    # ------------------------------------------------------------------
    # Augmented variant: z kept in the 42-wide stage block (f32-robust).
    # ------------------------------------------------------------------

    def factor_aug(w_diag):
        """Like `factor` but with the inequality duals in the block; the
        complementarity scaling -W sits on its own diagonal entries where
        partial pivoting handles the extreme magnitudes cleanly."""
        w_s = w_diag.reshape(T, N_INEQ_PER_STAGE, bt)
        eye12 = jnp.eye(NX, dtype=dtype)[:, :, None]
        zi = jax.lax.broadcasted_iota(jnp.int32, (N_INEQ_PER_STAGE, 1), 0)
        zj = jax.lax.broadcasted_iota(
            jnp.int32, (1, N_INEQ_PER_STAGE), 1
        )
        z_eye = (zi == zj).astype(dtype)[:, :, None]  # (16, 16, 1)

        def stage(t, m_prev):
            ru = eye12 * (r_diag[:, None, :] + opts.beta)
            adm = _mm(ad, m_prev)
            admadt = jnp.sum(adm[:, None, :, :] * ad[None, :, :, :], axis=2)
            yy = -opts.delta * eye12 - admadt - eye12 * q_inv[:, None, :]
            z_nu2 = -opts.delta * jnp.broadcast_to(
                jnp.eye(N_MX_PER_STAGE, dtype=dtype)[:, :, None],
                (N_MX_PER_STAGE, N_MX_PER_STAGE, bt),
            )
            ww = -z_eye * w_s[t][:, None, :]  # (16, 16, B) diag(-W_t)
            zf = lambda r, c: jnp.zeros((r, c, bt), dtype)
            gu_t = jnp.swapaxes(gu, 0, 1)  # (12, 16, B) = G_u^T
            # rows [u, z, nu, y] x cols [u(12), z(16), nu(2), y(12)]
            row_u = jnp.concatenate(
                [ru, gu_t, jnp.swapaxes(e_sel, 0, 1), -jnp.swapaxes(bd, 0, 1)],
                axis=1)
            row_z = jnp.concatenate(
                [gu, ww, zf(N_INEQ_PER_STAGE, N_MX_PER_STAGE),
                 zf(N_INEQ_PER_STAGE, NX)], axis=1)
            row_nu = jnp.concatenate(
                [e_sel, zf(N_MX_PER_STAGE, N_INEQ_PER_STAGE), z_nu2,
                 zf(N_MX_PER_STAGE, NX)], axis=1)
            row_y = jnp.concatenate(
                [-bd, zf(NX, N_INEQ_PER_STAGE), zf(NX, N_MX_PER_STAGE), yy],
                axis=1)
            s_mat = jnp.concatenate([row_u, row_z, row_nu, row_y], axis=0)

            s_inv = _gj_inverse(s_mat)  # (SA_C, SA_C, B)
            sinv_ref[t] = s_inv
            nyy = s_inv[_AY0:, _AY0:, :]
            return eye12 * q_inv[:, None, :] \
                + q_inv[:, None, :] * nyy * q_inv[None, :, :]

        m_prev = jnp.zeros((NX, NX, bt), dtype)
        for t in range(T):
            m_prev = stage(t, m_prev)

    def thomas_solve_aug(r1, r_z, r4):
        """Augmented two-sweep solve; returns (dxz, dz, dyv)."""
        rx = r1[: NX * T].reshape(T, NX, bt)
        ru = r1[NX * T:].reshape(T, NU, bt)
        ry = r4[: NX * T].reshape(T, NX, bt)
        rnu = r4[NX * T:].reshape(T, N_MX_PER_STAGE, bt)
        rz = r_z.reshape(T, N_INEQ_PER_STAGE, bt)
        ry_c = ry - q_inv[None] * rx
        r = jnp.concatenate([ru, rz, rnu, ry_c], axis=1)  # (T, SA_C, B)

        g_list = []
        sol_prev_x = jnp.zeros((NX, bt), dtype)
        for t in range(T):
            r_t = r[t]
            g_t = jnp.concatenate(
                [r_t[:_AY0], r_t[_AY0:] + _mv(ad, sol_prev_x)], axis=0
            )
            g_list.append(g_t)
            sol = _mv(sinv_ref[t], g_t)
            sol_prev_x = q_inv * (rx[t] - sol[_AY0:, :])

        w_list = [None] * T
        x_list = [None] * T
        w_y_next = jnp.zeros((NX, bt), dtype)
        for t in range(T - 1, -1, -1):
            adT_wy = jnp.sum(ad * w_y_next[:, None, :], axis=0)
            g_t = g_list[t]
            g_mod = jnp.concatenate(
                [g_t[:_AY0], g_t[_AY0:] - q_inv * adT_wy], axis=0
            )
            w_t = _mv(sinv_ref[t], g_mod)
            w_y = w_t[_AY0:, :]
            x_list[t] = q_inv * (rx[t] + adT_wy - w_y)
            w_list[t] = w_t
            w_y_next = w_y
        w = jnp.stack(w_list)
        xs = jnp.stack(x_list)

        du = w[:, :NU, :].reshape(NU * T, bt)
        dzv = w[:, _AZ0:_ANU0, :].reshape(N_INEQ_PER_STAGE * T, bt)
        dnu = w[:, _ANU0:_AY0, :].reshape(N_MX_PER_STAGE * T, bt)
        dy = w[:, _AY0:, :].reshape(NX * T, bt)
        dx = xs.reshape(NX * T, bt)
        return (
            jnp.concatenate([dx, du], axis=0),
            dzv,
            jnp.concatenate([dy, dnu], axis=0),
        )

    use_aug = opts.backend == "tridiag_aug"
    use_ric = opts.backend == "ric"
    use_ric2 = opts.backend == "ric2"
    use_ric_aug = opts.backend == "ric_aug"

    def iteration_base(refine_base, _, carry):
        # refine_base: the refinement depth THIS Newton step runs with
        # (static). `opts.refine_skip_iters` schedules the first steps at
        # 0 — see the fori_loop site below.
        x, s, z, y, _res = carry
        rx = hd * x + f + gT_mv(z) + aT_mv(y)
        re = a_mv(x) - b
        rs = g_mv(x) + s - d
        mu = jnp.sum(s * z, axis=0) / ni  # (B,)

        sigma_d = z / s + opts.delta
        if opts.sigma_cap > 0.0:
            sigma_d = jnp.minimum(sigma_d, opts.sigma_cap)
        w_inv = sigma_d / (1.0 + opts.delta * sigma_d)

        if use_ric or use_ric2:
            if use_ric:
                factors = (
                    factor_ric_split if opts.foot_split else factor_ric
                )(w_inv)
            else:
                # Same solve as "ric": the factor returns a different
                # kinv-apply callable (the rank-2 block formula).
                factors = factor_ric2(w_inv)
            solve_fn = ric_solve

            def reduced_solve(r1, r2, r3, r4, refine=refine_base):
                r1_hat = r1 + gT_mv(w_inv * (r3 - r2 / sigma_d))
                dx, dy = solve_fn(r1_hat, r4, *factors)
                for _ in range(refine):
                    m1 = (hd + opts.beta) * dx + gT_mv(w_inv * g_mv(dx)) \
                        + aT_mv(dy)
                    m2 = a_mv(dx) - opts.delta * dy
                    ex, ey = solve_fn(r1_hat - m1, r4 - m2, *factors)
                    dx, dy = dx + ex, dy + ey
                dz = w_inv * (g_mv(dx) + r2 / sigma_d - r3)
                ds = (r2 - dz) / sigma_d
                return dx, ds, dz, dy

        elif use_aug or use_ric_aug:
            w_diag = 1.0 / sigma_d + opts.delta  # W = Sigma^-1 + delta
            if use_ric_aug:
                factors_ra = (
                    factor_ric_aug_split if opts.foot_split
                    else factor_ric_aug
                )(w_diag)
                solve_aug_fn = lambda r1, r_z, r4: ric_solve_aug(
                    r1, r_z, r4, *factors_ra
                )
            else:
                factor_aug(w_diag)
                solve_aug_fn = thomas_solve_aug

            def df_resid(dx, dz, dy, r1, r_z, r4):
                """Compensated refinement residual, batch-in-lanes layout.

                Kernel port of `ops/df.residual_aug` (see PdipmOptions.
                refine_residual): every output component of
                  e1 = r1 - [(hd+beta) dx + G^T dz + A^T dy]
                  ez = r_z - [G dx - W dz]
                  e4 = r4 - [A dx - delta dy]
                accumulates as ONE compensated (value, error) pair on the
                VPU, so the cancellation r ~ K d is exact until the final
                fold. All EFT ops are plain elementwise f32 — Mosaic
                preserves them (pinned by tests against the pure-JAX df
                path).
                """
                from biped_pympc_tpu.ops.df import Acc, two_sum

                dx_x = dx[: NX * T].reshape(T, NX, bt)
                dx_u = dx[NX * T:].reshape(T, NU, bt)
                dz_s = dz.reshape(T, N_INEQ_PER_STAGE, bt)
                y_dyn = dy[: NX * T].reshape(T, NX, bt)
                y_mx = dy[NX * T:].reshape(T, N_MX_PER_STAGE, bt)
                y_next = jnp.concatenate(
                    [y_dyn[1:], jnp.zeros((1, NX, bt), dtype)], axis=0)

                hb, hb_err = two_sum(hd, jnp.asarray(opts.beta, dtype))
                qb = hb[: NX * T].reshape(T, NX, bt)
                qe = hb_err[: NX * T].reshape(T, NX, bt)
                rb = hb[NX * T:].reshape(T, NU, bt)
                re_ = hb_err[NX * T:].reshape(T, NU, bt)

                # e1 x rows: r1_x - (q+b) dx_x - y_dyn + sum_i ad[i,j] y_next[t,i]
                a1x = Acc(r1[: NX * T].reshape(T, NX, bt))
                a1x.add_prod(qb, dx_x, -1.0)
                a1x.add_prod(qe, dx_x, -1.0)
                a1x.add(-y_dyn)
                for i in range(NX):  # ad is per-env (12, 12, B)
                    a1x.add_prod(ad[i][None], y_next[:, i:i + 1, :])

                # e1 u rows: r1_u - (r+b) dx_u - sum_k gu[k,j] dz[t,k]
                #            + sum_i bd[i,j] y_dyn[t,i] - onehot mx y_mx
                a1u = Acc(r1[NX * T:].reshape(T, NU, bt))
                a1u.add_prod(rb, dx_u, -1.0)
                a1u.add_prod(re_, dx_u, -1.0)
                for k in range(N_INEQ_PER_STAGE):  # gu (16, 12, B)
                    a1u.add_prod(gu[k][None], dz_s[:, k:k + 1, :], -1.0)
                for i in range(NX):
                    a1u.add_prod(bd[i][None], y_dyn[:, i:i + 1, :])
                a1u.add(-(onehot6[None, :, None] * y_mx[:, 0:1, :]
                          + onehot9[None, :, None] * y_mx[:, 1:2, :]))

                # ez: r_z - sum_j gu[i,j] dx_u[t,j] + w dz
                az = Acc(r_z.reshape(T, N_INEQ_PER_STAGE, bt))
                for j in range(NU):
                    az.add_prod(gu[:, j][None], dx_u[:, j:j + 1, :], -1.0)
                az.add_prod(w_diag.reshape(T, N_INEQ_PER_STAGE, bt), dz_s)

                # e4 dyn: r4_dyn - dx_x + sum_j ad[i,j] prev[t,j]
                #         + sum_j bd[i,j] dx_u[t,j] + delta y_dyn
                prev = jnp.concatenate(
                    [jnp.zeros((1, NX, bt), dtype), dx_x[:-1]], axis=0)
                a4 = Acc(r4[: NX * T].reshape(T, NX, bt))
                a4.add(-dx_x)
                for j in range(NX):
                    a4.add_prod(ad[:, j][None], prev[:, j:j + 1, :])
                    a4.add_prod(bd[:, j][None], dx_u[:, j:j + 1, :])
                a4.add_prod(jnp.asarray(opts.delta, dtype), y_dyn)

                # e4 mx: r4_mx - [dx_u[:,6], dx_u[:,9]] + delta y_mx
                a4m = Acc(r4[NX * T:].reshape(T, N_MX_PER_STAGE, bt))
                a4m.add(-jnp.stack([dx_u[:, 6, :], dx_u[:, 9, :]], axis=1))
                a4m.add_prod(jnp.asarray(opts.delta, dtype), y_mx)

                e1 = jnp.concatenate([
                    a1x.value().reshape(NX * T, bt),
                    a1u.value().reshape(NU * T, bt)], axis=0)
                ez = az.value().reshape(ni, bt)
                e4 = jnp.concatenate([
                    a4.value().reshape(NX * T, bt),
                    a4m.value().reshape(N_MX_PER_STAGE * T, bt)], axis=0)
                return e1, ez, e4

            def reduced_solve(r1, r2, r3, r4, refine=refine_base):
                r_z = r3 - r2 / sigma_d
                dx, dz, dy = solve_aug_fn(r1, r_z, r4)
                for _ in range(refine):
                    if opts.refine_residual == "df":
                        e1, ezr, e4 = df_resid(dx, dz, dy, r1, r_z, r4)
                    else:
                        m1 = (hd + opts.beta) * dx + gT_mv(dz) + aT_mv(dy)
                        mz = g_mv(dx) - w_diag * dz
                        m4 = a_mv(dx) - opts.delta * dy
                        e1, ezr, e4 = r1 - m1, r_z - mz, r4 - m4
                    ex, ez, ey = solve_aug_fn(e1, ezr, e4)
                    dx, dz, dy = dx + ex, dz + ez, dy + ey
                ds = (r2 - dz) / sigma_d
                return dx, ds, dz, dy
        else:
            factor(w_inv)

            def reduced_solve(r1, r2, r3, r4, refine=refine_base):
                r1_hat = r1 + gT_mv(w_inv * (r3 - r2 / sigma_d))
                dx, dy = thomas_solve(r1_hat, r4)
                for _ in range(refine):
                    m1 = (hd + opts.beta) * dx + gT_mv(w_inv * g_mv(dx)) \
                        + aT_mv(dy)
                    m2 = a_mv(dx) - opts.delta * dy
                    ex, ey = thomas_solve(r1_hat - m1, r4 - m2)
                    dx, dy = dx + ex, dy + ey
                dz = w_inv * (g_mv(dx) + r2 / sigma_d - r3)
                ds = (r2 - dz) / sigma_d
                return dx, ds, dz, dy

        combined = opts.corrector_form == "combined"
        sum_refine = opts.corrector_form == "sum_refine"

        # Affine (predictor) direction; in the "combined"/"sum_refine"
        # forms per-solve refinement is skipped (see PdipmOptions).
        dx_a, ds_a, dz_a, dy_a = reduced_solve(
            -rx, -(s * z) / s, -rs, -re,
            refine=0 if (combined or sum_refine) else refine_base,
        )
        a_p = frac_to_boundary(s, ds_a)
        a_d = frac_to_boundary(z, dz_a)

        mu_aff = jnp.sum(
            (s + a_p[None] * ds_a) * (z + a_d[None] * dz_a), axis=0
        ) / ni
        sigma = (mu_aff / mu) ** 3

        rc = s * z + ds_a * dz_a - sigma[None] * mu[None]
        if combined:
            # One refined solve of the summed rhs (equal to refined affine
            # + refined corrector by linearity of the refinement map, one
            # fewer refined solve per iteration). The reference's corrector
            # rhs keeps s*z (`sparse_pdipm_solver.py:476-486`), so the sum
            # is -(s*z + rc)/s, not the textbook -rc/s.
            dx, ds, dz, dy = reduced_solve(-rx, -(s * z + rc) / s, -rs, -re)
        elif sum_refine:
            zero_nz = jnp.zeros_like(rx)
            zero_ni = jnp.zeros_like(s)
            zero_ne = jnp.zeros_like(re)
            dx_c, ds_c, dz_c, dy_c = reduced_solve(
                zero_nz, -rc / s, zero_ni, zero_ne, refine=0
            )
            dx = dx_a + dx_c
            ds = ds_a + ds_c
            dz = dz_a + dz_c
            dy = dy_a + dy_c
            # Refine the summed direction against the full 4-row KKT
            # residual; the correction rhs is small, so the mixed scales
            # that sink the "combined" form never enter a large solve.
            r1s = -rx
            r2s = -(s * z + rc) / s
            for _ in range(refine_base):
                m1 = hd * dx + opts.beta * dx + gT_mv(dz) + aT_mv(dy)
                m2 = sigma_d * ds + dz
                m3 = g_mv(dx) + ds - opts.delta * dz
                m4 = a_mv(dx) - opts.delta * dy
                ex, es, ez, ey = reduced_solve(
                    r1s - m1, r2s - m2, -rs - m3, -re - m4, refine=0
                )
                dx, ds, dz, dy = dx + ex, ds + es, dz + ez, dy + ey
        else:
            zero_nz = jnp.zeros_like(rx)
            zero_ni = jnp.zeros_like(s)
            zero_ne = jnp.zeros_like(re)
            dx_c, ds_c, dz_c, dy_c = reduced_solve(
                zero_nz, -rc / s, zero_ni, zero_ne,
                # "aff_ref": keep the load-bearing affine refinement, skip
                # the corrector's (its solve error enters the direction
                # linearly; see PdipmOptions.corrector_form).
                refine=0 if opts.corrector_form == "aff_ref"
                else refine_base,
            )
            dx = dx_a + dx_c
            ds = ds_a + ds_c
            dz = dz_a + dz_c
            dy = dy_a + dy_c
        a_p = frac_to_boundary(s, ds)
        a_d = frac_to_boundary(z, dz)

        x = x + a_p[None] * dx
        s = jnp.maximum(s + a_p[None] * ds, opts.sz_floor)
        z = jnp.maximum(z + a_d[None] * dz, opts.sz_floor)
        y = y + a_d[None] * dy

        res = jnp.stack(
            [
                jnp.sqrt(jnp.sum(rx * rx, axis=0)),
                jnp.sqrt(jnp.sum(rs * rs, axis=0)),
                jnp.sqrt(jnp.sum(re * re, axis=0)),
                jnp.sum(s * z, axis=0) / ni,
            ],
            axis=0,
        )  # (4, B)
        return x, s, z, y, res

    if warm:
        x0v = x0_ref[...]
        s0 = s0_ref[...]
        z0 = z0_ref[...]
        y0 = y0_ref[...]
    else:
        x0v = jnp.zeros((nz, bt), dtype)
        s0 = jnp.maximum(d, 1.0)
        z0 = jnp.ones((ni, bt), dtype)
        y0 = jnp.ones((ne, bt), dtype)
    res0 = jnp.zeros((4, bt), dtype)

    iteration = functools.partial(iteration_base, opts.refine_steps)
    carry = (x0v, s0, z0, y0, res0)
    skip = min(opts.refine_skip_iters, opts.iterations)
    if skip > 0 and opts.refine_steps > 0:
        # Scheduled refinement: the first `skip` Newton steps run
        # UNREFINED (early iterates are far from complementarity, so the
        # reduced-KKT scales are benign and f32 solves suffice); the
        # remaining steps keep the full refinement that repairs the
        # ill-conditioned late-iteration solves. Accuracy A/B in BENCH.md
        # round 3 "Scheduled refinement". Refinement is this kernel's own
        # f32 repair (the f64 reference never refines), so scheduling it
        # is a numerical-design knob, not a parity deviation.
        carry = jax.lax.fori_loop(
            0, skip, functools.partial(iteration_base, 0), carry
        )
    x, s, z, y, res = jax.lax.fori_loop(
        skip if (skip > 0 and opts.refine_steps > 0) else 0,
        opts.iterations, iteration, carry
    )
    x_out[...] = x
    s_out[...] = s
    z_out[...] = z
    y_out[...] = y
    res_out[...] = res


class _BatchedQP(NamedTuple):
    """Kernel-ready, batch-last QP arrays."""

    hd: jnp.ndarray  # (nz, B)
    f: jnp.ndarray  # (nz, B)
    ad: jnp.ndarray  # (12, 12, B)
    bd: jnp.ndarray  # (12, 12, B)
    b: jnp.ndarray  # (ne, B)
    gu: jnp.ndarray  # (16, 12, B)
    d: jnp.ndarray  # (ni, B)


def _to_batch_last(qp: StageQP) -> _BatchedQP:
    """StageQP with leading batch axis -> batch-last kernel arrays."""
    t3 = lambda a: jnp.moveaxis(a, 0, -1)
    hd = jax.vmap(qps.h_diag)(qp)
    b = jax.vmap(qps.b_vec)(qp)
    d = jax.vmap(qps.d_vec)(qp)
    return _BatchedQP(
        hd=t3(hd), f=t3(qp.f), ad=t3(qp.dyn.A), bd=t3(qp.dyn.B),
        b=t3(b), gu=t3(qp.g_u), d=t3(d),
    )


def _interpret_default() -> bool:
    """Mosaic TC kernels only exist on TPU backends; everywhere else
    (CPU test meshes, the driver's virtual-device multichip dryrun, a
    GPU-backed dev box) the kernels run under the Pallas interpreter
    automatically — same algorithm, platform-independent lowering — so
    every caller (sharded controller steps included) works unmodified
    off-TPU. "axon" is the tunneled-TPU platform of this runtime.

    This keys off the DEFAULT backend at trace time; when the solve is
    deliberately placed elsewhere, set `PdipmOptions.interpret`
    explicitly (see `_interpret`)."""
    return jax.default_backend() not in ("tpu", "axon")


def _interpret(opts: PdipmOptions) -> bool:
    """Resolved Pallas interpret flag: explicit option wins, else backend."""
    if opts.interpret is not None:
        return bool(opts.interpret)
    return _interpret_default()


def solve(qp: StageQP, opts: PdipmOptions = PdipmOptions(),
          tile: int = 128, state=None) -> PdipmResult:
    """Batched PDIPM via the fused Pallas kernel.

    qp: StageQP pytree with a LEADING batch axis on every leaf (as produced
    by vmapping `build_qp`). Batch must be a multiple of `tile` (pad the
    batch upstream if needed). Returns batch-first PdipmResult.

    state: optional batch-first `pdipm.PdipmState` to start the iteration
    from (warm start / chunked continuation); None uses the reference cold
    start x=0, s=max(d,1), z=1, y=1.
    """
    known = ("tridiag", "tridiag_aug", "ric", "ric2", "ric_aug")
    if opts.backend not in known:
        raise ValueError(
            f"unknown Pallas pdipm backend {opts.backend!r}; expected one "
            f"of {known} (note: 'bcr' was removed in round 4 — "
            "results/ab_round4.jsonl phase E)"
        )
    if opts.refine_residual == "df":
        if opts.backend not in ("tridiag_aug", "ric_aug"):
            raise ValueError(
                "refine_residual='df' is implemented for the aug kernels "
                f"only (got backend={opts.backend!r}); see "
                "PdipmOptions.refine_residual"
            )
        if opts.corrector_form == "sum_refine":
            # Same constraint as the pure-JAX path: sum_refine refines in
            # its own outer full-KKT loop with plain f32 residuals.
            raise ValueError(
                "refine_residual='df' is not implemented for "
                "corrector_form='sum_refine'"
            )
    batch = qp.f.shape[0]
    horizon = qp.d.shape[1]
    tile, pad = _tile_and_pad(batch, tile, _interpret(opts))
    if pad:
        qp_pad = jax.tree.map(functools.partial(_pad_batch, pad), qp)
        st_pad = None if state is None else jax.tree.map(
            functools.partial(_pad_batch, pad), state
        )
        res = solve(qp_pad, opts, tile, st_pad)
        return jax.tree.map(lambda a: a[:batch], res)

    data = _to_batch_last(qp)
    bl = lambda a: jnp.moveaxis(a, 0, -1)  # batch-first -> batch-last
    state_bl = None if state is None else (
        bl(state.x), bl(state.s), bl(state.z), bl(state.y)
    )
    x, s, z, y, res = _solve_bl(data, horizon, opts, tile, state_bl)
    t = lambda a: jnp.moveaxis(a, -1, 0)
    return PdipmResult(x=t(x), s=t(s), z=t(z), y=t(y), residuals=t(res))


def _tile_and_pad(batch: int, tile: int, interpret: bool):
    """Static helper: padding to a whole number of lane tiles.

    Small batches PAD UP to the full `tile` rather than shrinking it:
    sub-128-lane tiles mis-align the kernel's lane-concatenation offsets
    and Mosaic rejects them ("result/input offset mismatch on non-concat
    dimension", hit at batch 8 on v5e), and the VPU computes full
    128-lane vectors regardless, so padding costs no time. Under the
    interpreter (non-TPU backends) no lane-alignment constraint exists
    and padding IS real work, so the tile shrinks to the batch there;
    callers can still pass an explicit smaller `tile`."""
    if interpret:
        tile = max(1, min(tile, batch))
    return tile, (-batch) % tile


def _pad_batch(pad, a):
    return jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)


def _solve_bl(data: _BatchedQP, horizon: int, opts: PdipmOptions,
              tile: int, state_bl):
    """Core pallas_call on batch-LAST arrays; batch must divide by tile.

    state_bl: None (reference cold start) or a (x, s, z, y) tuple of
    batch-last arrays. Returns batch-last (x, s, z, y, residuals)."""
    batch = data.f.shape[-1]
    nz = 2 * NX * horizon
    ni = N_INEQ_PER_STAGE * horizon
    ne = (NX + N_MX_PER_STAGE) * horizon
    dtype = data.f.dtype
    grid = (batch // tile,)

    def spec(shape):
        # block over the last (batch) axis only
        block = shape[:-1] + (tile,)
        idx = lambda i: (0,) * (len(shape) - 1) + (i,)
        return pl.BlockSpec(block, idx, memory_space=pltpu.VMEM)

    warm = state_bl is not None
    kernel = functools.partial(_pdipm_kernel, horizon, opts, warm)
    out_shapes = [
        jax.ShapeDtypeStruct((nz, batch), dtype),
        jax.ShapeDtypeStruct((ni, batch), dtype),
        jax.ShapeDtypeStruct((ni, batch), dtype),
        jax.ShapeDtypeStruct((ne, batch), dtype),
        jax.ShapeDtypeStruct((4, batch), dtype),
    ]
    in_specs = [
        spec((nz, batch)), spec((nz, batch)),
        spec((NX, NX, batch)), spec((NX, NX, batch)),
        spec((ne, batch)), spec((16, NU, batch)), spec((ni, batch)),
    ]
    inputs = [data.hd, data.f, data.ad, data.bd, data.b, data.gu, data.d]
    if warm:
        in_specs += [
            spec((nz, batch)), spec((ni, batch)), spec((ni, batch)),
            spec((ne, batch)),
        ]
        inputs += list(state_bl)
    x, s, z, y, res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            spec((nz, batch)), spec((ni, batch)), spec((ni, batch)),
            spec((ne, batch)), spec((4, batch)),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            # "ric"/"ric_aug" keep their factors as values (no stage-inverse
            # scratch); the other backends store per-stage inverses here.
            pltpu.VMEM(
                (1, 8, 8, tile)
                if opts.backend in ("ric", "ric2", "ric_aug") else
                (horizon,
                 SA_C if opts.backend == "tridiag_aug" else SC,
                 SA_C if opts.backend == "tridiag_aug" else SC,
                 tile),
                dtype,
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # Batch tiles are fully independent. (Measured neutral — the
            # 20-iteration kernel is compute-bound, inputs are tiny — but
            # it is the semantically correct annotation.)
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(opts),
    )(*inputs)
    return x, s, z, y, res


class HybridStats(NamedTuple):
    """Per-solve hybrid observability counters (all int32 scalars).

    Makes the finiteness guarantee OPERATIONAL rather than calibrational
    (round-5 VERDICT item): the guarantee holds only while the budget
    covers the non-finite count, and `dropped_nonfinite > 0` is the
    runtime signal that it has lapsed on this solve.
    """

    flagged: jnp.ndarray  # envs over flag_tol OR non-finite (whole batch)
    nonfinite: jnp.ndarray  # envs with non-finite criterion/solution
    resolved: jnp.ndarray  # envs actually re-solved + merged (<= budget)
    dropped_nonfinite: jnp.ndarray  # non-finite envs NOT rescued (lapse!)


def solve_hybrid(
    qp: StageQP,
    opts: PdipmOptions = PdipmOptions(),
    budget: int = 0,
    flag_tol: float = 1.0,
    tile: int = 128,
    aug_opts: PdipmOptions | None = None,
    flag: str = "resid",
    with_stats: bool = False,
) -> PdipmResult:
    """Fast condensed solve everywhere + robust re-solve of flagged envs.

    The f32 condensed kernels ("ric"/"ric2") carry a GRF error tail on
    near-degenerate contact-switch QPs (the G^T W^-1 G condensation loses
    the small scales at assembly — BENCH.md "f32 accuracy") and NaN on
    ~0.65% of envs under full domain randomization (BENCH.md randomized
    sweep); the augmented kernel ("ric_aug") is robust but ~1.6x the cost.
    This runs the fast path on the whole batch, flags envs whose final KKT
    residual criterion max(||rx||, ||rs||, ||re||, mu) exceeds `flag_tol`
    OR is non-finite OR whose solution is non-finite, and re-solves AT
    MOST `budget` flagged envs (the worst by criterion) with the augmented
    kernel from the reference cold start. Costs one fast full-batch solve
    + one budget-sized robust solve (measured 33.7 vs 29.8 ms at batch
    4096, ~1.13x, vs 47.9 ms for augmented-everywhere).

    What this buys — MEASURED, BENCH.md "hybrid flag": a **finiteness
    guarantee** (100% finite at batch 32768 under domain randomization,
    where the bare fast path NaNs on 0.6-0.7% of envs — non-finite
    criteria/solutions rank +inf and are re-solved unconditionally) and
    repair of the worst-criterion divergent envs. What it does NOT buy:
    the augmented kernel's accuracy class — the residual criterion does
    not separate the fast path's f32 condensation error tail (12.9% of
    randomized envs differ >1 N from the augmented anchor; Spearman
    criterion-vs-error <= 0.64), so sub-Newton tails cannot be certified
    at speed-mode cost. For robust accuracy use backend="ric_aug".

    budget <= 0 selects the auto size max(64, batch // 32): ~3.1% of the
    batch, ~5x the measured 0.65-0.73% randomized-domain non-finite rate
    of the condensed speed mode. NOTE (sharding): under `shard_map` this
    function sees only its device's SHARD, so the auto budget is per
    shard — with D devices the effective global re-solve budget is
    D * max(64, (batch/D) // 32), i.e. the 64 floor scales with device
    count (e.g. 8x64=512 vs 128 single-device at b4096). That skews cost,
    not correctness; pass an explicit per-shard budget to pin the global
    total. A fixed positive budget is honored —
    NOTE the finiteness guarantee holds only while budget >= the number
    of non-finite envs (ranked +inf, they claim budget slots first); a
    fixed budget below the workload's non-finite count silently returns
    the excess NaN envs unmerged. Keep the auto size unless measured.
    `flag` selects the flag criterion:
      * "resid" (round-3 behavior): the solver's own final residual
        criterion max over `PdipmResult.residuals` — 2-norms, one Newton
        step STALE, and blind to the f32 condensation error (measured
        Spearman vs true error 0.51-0.64, BENCH.md "hybrid flag").
      * "kkt": the TRUE KKT residual of the returned iterate under the
        exact operator (`pdipm.kkt_error`, one vmapped operator apply —
        no factorization); measures directly what condensation lost.
        Round-4 calibration data in BENCH.md.

    with_stats: return (PdipmResult, HybridStats) instead — per-solve
    flagged/non-finite/re-solved counts plus `dropped_nonfinite`, the
    budget-exhaustion signal (non-finite envs left unmerged because the
    budget was smaller than the non-finite count). Wired through
    `MpcOutput.hybrid_counts` and the wrapper's `hybrid_stats` property;
    psum-reduced across shards by `parallel.mesh.shard_map_step`.
    """
    batch = qp.f.shape[0]
    if budget is None or budget <= 0:
        budget = max(64, batch // 32)
    res = solve(qp, opts, tile)
    if flag == "kkt":
        crit = jnp.max(jax.vmap(pdipm_kkt_error)(qp, res), axis=1)  # (B,)
    else:
        crit = jnp.max(res.residuals, axis=1)  # (B,)
    # Non-finite envs must ALWAYS be flagged. Two distinct holes, both
    # closed by ranking them as +inf: (a) a NaN criterion fails every
    # comparison, so a plain `vals > flag_tol` gate would silently KEEP
    # the broken fast-path solution (runtime-confirmed by the round-2
    # review); (b) the stored residuals are evaluated at the START of the
    # final Newton step, so a last-step blow-up can leave a finite
    # criterion around a non-finite solution — check EVERY solution leaf
    # (x and the duals s/z/y: a finite x around NaN duals would otherwise
    # return NaN dual outputs unmerged — ADVICE r3).
    sol_ok = (
        jnp.all(jnp.isfinite(res.x), axis=1)
        & jnp.all(jnp.isfinite(res.s), axis=1)
        & jnp.all(jnp.isfinite(res.z), axis=1)
        & jnp.all(jnp.isfinite(res.y), axis=1)
    )  # (B,)
    crit = jnp.where(jnp.isfinite(crit) & sol_ok, crit, jnp.inf)
    k = min(budget, batch)
    vals, idx = jax.lax.top_k(crit, k)
    qp_bad = jax.tree.map(lambda a: a[idx], qp)
    aug = aug_opts if aug_opts is not None else opts._replace(
        backend="ric_aug", aug_pivot=True
    )
    res_aug = solve(qp_bad, aug, tile)
    # Gate: above tolerance, or non-finite (+inf after the ranking map,
    # never NaN here). The isinf term makes broken envs unconditionally
    # rescued even at flag_tol=inf ("tolerance off" still repairs NaNs).
    need = (vals > flag_tol) | jnp.isinf(vals)  # (k,)

    def merge(a, b):
        sel = need.reshape((k,) + (1,) * (b.ndim - 1))
        return a.at[idx].set(jnp.where(sel, b, a[idx]))

    merged = jax.tree.map(merge, res, res_aug)
    if not with_stats:
        return merged
    nonfinite = jnp.sum(jnp.isinf(crit)).astype(jnp.int32)
    stats = HybridStats(
        flagged=jnp.sum((crit > flag_tol) | jnp.isinf(crit)).astype(jnp.int32),
        nonfinite=nonfinite,
        resolved=jnp.sum(need).astype(jnp.int32),
        # Non-finite envs rank +inf so they claim top-k slots first; any
        # excess over the budget is returned unmerged — the guarantee lapse.
        dropped_nonfinite=nonfinite
        - jnp.sum(jnp.isinf(vals)).astype(jnp.int32),
    )
    return merged, stats


def solve_adaptive(qp: StageQP, opts: PdipmOptions = PdipmOptions(),
                   tol: float = 1e-2, tile: int = 128) -> PdipmResult:
    """Adaptive-iteration PDIPM: chunked kernel launches with early stop.

    Runs the fused kernel `opts.iterations_per_launch` Newton steps at a
    time inside a `lax.while_loop`, stopping when EVERY env's residual
    criterion max(||rx||, ||rs||, ||re||, mu) drops below `tol`, or at
    EXACTLY the fixed `opts.iterations` cap (a non-divisible remainder
    runs as one final shorter launch). This mirrors the reference's own
    architecture — a host loop over launches of a fused 5-iteration kernel
    (`mpc_controller_cusadi.py:144-169`) — with a data-dependent stop, so
    typical batches finish in fewer launches than the cap. NOT strict
    fixed-iteration reference parity (opt-in via `MPCConf.adaptive_tol`).

    The residual criterion is computed at the START of each Newton step,
    so the check is one iteration stale (conservative). Batch semantics:
    ONE stop decision for the whole (per-shard) batch — under jit the
    batch is a single program, so the slowest env gates everyone.
    """
    batch = qp.f.shape[0]
    horizon = qp.d.shape[1]
    tile, pad = _tile_and_pad(batch, tile, _interpret(opts))
    if pad:
        qp_pad = jax.tree.map(functools.partial(_pad_batch, pad), qp)
        res = solve_adaptive(qp_pad, opts, tol, tile)
        return jax.tree.map(lambda a: a[:batch], res)

    chunk = min(opts.iterations_per_launch, opts.iterations)
    n_full, rem = divmod(opts.iterations, chunk)
    chunk_opts = opts._replace(iterations=chunk)

    # Stay batch-LAST across launches: transpose the QP once, carry the
    # state as kernel-layout arrays, transpose the result once at the end.
    data = _to_batch_last(qp)
    state0 = (
        0.0 * data.f,                                   # x = 0
        jnp.maximum(data.d, 1.0),                       # s = max(d, 1)
        0.0 * data.d + 1.0,                             # z = 1
        0.0 * data.b + 1.0,                             # y = 1
    )

    def cond(carry):
        k, st, res = carry
        return jnp.logical_and(k < n_full, jnp.max(res) > tol)

    def body(carry):
        k, st, _ = carry
        x, s, z, y, res = _solve_bl(data, horizon, chunk_opts, tile, st)
        return k + 1, (x, s, z, y), res

    big = jnp.full((4, batch), jnp.inf, qp.f.dtype)
    _, st, res = jax.lax.while_loop(cond, body, (0, state0, big))
    if rem:
        # Exact cap: one final rem-iteration launch, skipped if converged.
        def run_rem(args):
            st, _ = args
            x, s, z, y, res = _solve_bl(
                data, horizon, opts._replace(iterations=rem), tile, st
            )
            return (x, s, z, y), res

        st, res = jax.lax.cond(
            jnp.max(res) > tol, run_rem, lambda args: args, (st, res)
        )
    t = lambda a: jnp.moveaxis(a, -1, 0)
    return PdipmResult(x=t(st[0]), s=t(st[1]), z=t(st[2]), y=t(st[3]),
                       residuals=t(res))
