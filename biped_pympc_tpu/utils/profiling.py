"""Profiling / tracing helpers.

The reference's observability is wall-clock prints gated by
`MPCConf.print_solve_time` plus cudaEvent kernel timings (SURVEY.md §5);
the TPU-native equivalents here are:

  * `device_timer`: honest device-side timing for async runtimes —
    chained `lax.scan` execution with host-transfer sync. Per-dispatch
    host timing on remote-execution platforms can undercount device time
    by orders of magnitude (see bench.py).
  * `trace`: a thin wrapper over `jax.profiler.trace` producing a
    TensorBoard-loadable trace of the XLA/Pallas execution.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


def device_timer(step_fn: Callable, state, chain_len: int = 10, reps: int = 3):
    """Median seconds per call of `step_fn(state) -> state-like`.

    step_fn must return an updated state (or any pytree with the same
    structure as its input) so calls can be chained — chaining forces the
    device to actually execute every step sequentially.

    The sync point is a SINGLE SCALAR reduced inside the jit (every output
    leaf feeds it, so nothing is dead-code-eliminated). Transferring the
    full output pytree instead would time one host round-trip PER LEAF —
    on a tunneled runtime that is ~tens of ms each and can exceed the
    device compute being measured by an order of magnitude.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(st):
        def body(s, _):
            return step_fn(s), ()
        out, _ = jax.lax.scan(body, st, None, length=chain_len)
        leaves = [x for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(x) for x in leaves)

    np.asarray(chain(state))  # compile + sync

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(state))
        times.append((time.perf_counter() - t0) / chain_len)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/biped_pympc_tpu_trace"):
    """Profile a block: `with trace(): ctrl.run_mpc()` then inspect the
    trace in TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
