"""ctypes binding to the native C++ CPU baseline (`native/srbd_mpc_cpu.cpp`).

The reference ships C++ CPU benchmark drivers loaded via `casadi::external`
(`evaluate_serial_cpu.cpp` / `evaluate_parallel_cpu.cpp`); here the native
library is self-contained (assembly + PDIPM in C++) and is loaded via ctypes,
serving both as the CPU speed baseline and as an independent correctness
oracle. The library is built on demand with `make -C native` (g++/OpenMP).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libsrbd_mpc_cpu.so"
_lib = None


def _ensure_built() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.srbd_mpc_solve_batch.restype = None
    lib.srbd_mpc_solve_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # batch T it rt
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # dt mu mass
        ctypes.c_double, ctypes.c_double, ctypes.c_double,  # lt lh f_max
        dp, dp,  # Q R
        dp, dp, dp, dp, dp, dp, dp, dp, dp, dp,  # per-env arrays
        ctypes.c_int, dp,  # n_threads, x_out
    ]
    _lib = lib
    return lib


def solve_batch(
    x0: np.ndarray,  # (B, 12)
    x_ref: np.ndarray,  # (B, T, 12)
    contact: np.ndarray,  # (B, T, 2)
    rot: np.ndarray,  # (B, 3, 3)
    i_world: np.ndarray,  # (B, 3, 3)
    body_pos: np.ndarray,  # (B, 3)
    foot_pos: np.ndarray,  # (B, 2, 3)
    q_weights: np.ndarray,  # (12,)
    r_weights: np.ndarray,  # (12,)
    dt_mpc: float,
    mu: float,
    mass: float,
    residual_lin: np.ndarray | None = None,  # (B, 3)
    residual_ang: np.ndarray | None = None,  # (B, 3)
    iterations: int = 20,
    euler_rate_mode: str = "rt_omega",
    n_threads: int = 0,
    lt: float = 0.07,
    lh: float = 0.04,
    f_max: float = 500.0,
) -> np.ndarray:
    """Solve a batch of SRBD-MPC QPs on CPU; returns (B, 24*T) primal x.

    n_threads: 0 serial, -1 all cores (OpenMP), k > 0 exactly k threads.
    lt / lh / f_max: contact geometry and force cap (defaults = the
    reference's hardcoded HECTOR values, `srbd_constraints.py:31,161-162`).
    """
    lib = _ensure_built()
    B, T = x_ref.shape[0], x_ref.shape[1]
    f64 = lambda a: np.ascontiguousarray(a, dtype=np.float64)
    if residual_lin is None:
        residual_lin = np.zeros((B, 3))
    if residual_ang is None:
        residual_ang = np.zeros((B, 3))

    x_out = np.zeros((B, 24 * T), dtype=np.float64)
    arrs = [
        f64(q_weights), f64(r_weights), f64(x0), f64(x_ref), f64(contact),
        f64(rot), f64(i_world), f64(body_pos),
        f64(foot_pos[:, 0, :]), f64(foot_pos[:, 1, :]),
        f64(residual_lin), f64(residual_ang),
    ]
    dp = ctypes.POINTER(ctypes.c_double)
    ptrs = [a.ctypes.data_as(dp) for a in arrs]
    lib.srbd_mpc_solve_batch(
        B, T, iterations, 1 if euler_rate_mode == "rt_omega" else 0,
        float(dt_mpc), float(mu), float(mass),
        float(lt), float(lh), float(f_max),
        *ptrs, int(n_threads), x_out.ctypes.data_as(dp),
    )
    return x_out
