"""Cold-compile breakdown of the full bench.py program (round-2 verdict
weak #4: "tell the whole compile story").

bench.py's first-ever run cost ~300 s of compile in round 2 while the
kernel alone compiles in 13-23 s — this measures where the rest goes, by
compiling each layer of the program separately IN ONE PROCESS with the
persistent cache DISABLED (true colds; run it twice and the second run
shows what the in-process jit cache reuses):

  kernel       jit(pdipm_pallas.solve) at b4096   (Mosaic + XLA wrap)
  assemble     jit(core.assemble_mpc)             (vmapped QP assembly)
  run_mpc      jit(core.run_mpc)                  (assembly+kernel+post)
  chain20      jit(scan of 20 run_mpc steps)      (the bench.py program)

Each row reports lower_s (tracing) and compile_s (XLA+Mosaic) separately.
Appends to results/ab_compile.jsonl.
"""
# Runnable from anywhere: put the repo root (one level up) on sys.path
# so `import biped_pympc_tpu` and `import bench_common` both resolve.
import os as _os
import sys as _sys
_sys.path[:0] = [_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                 _os.path.dirname(_os.path.abspath(__file__))]


import time

import numpy as np

from bench_common import make_emitter


def timed_compile(emit, name, fn, *args):
    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    emit({"stage": name, "lower_s": round(t1 - t0, 1),
          "compile_s": round(t2 - t1, 1)})
    return compiled


def main():
    import jax
    import jax.numpy as jnp

    from biped_pympc_tpu import ControllerConf, MPCConf
    from biped_pympc_tpu.control.controller import BipedControllerCore
    from biped_pympc_tpu.ops import pdipm_pallas

    # NOTE: deliberately NOT enabling the persistent compilation cache.
    emit = make_emitter("ab_compile")
    batch = 4096
    core = BipedControllerCore(
        ControllerConf(), MPCConf(verbose=False, solver="pallas_ric_aug"),
        gait_id=2)
    state = core.init_state(batch)
    rng = np.random.default_rng(0)
    num_dof = core.num_dof
    obs = np.zeros((batch, 13 + 6 * num_dof), dtype=np.float32)
    obs[:, 2] = 0.55
    obs[:, 3] = 1.0
    q0 = np.array([0.0, 0.0, 0.45, -0.9, 0.45], dtype=np.float32)
    obs[:, 13: 13 + num_dof] = q0
    obs[:, 13 + num_dof: 13 + 2 * num_dof] = q0
    state = core.set_command(
        state,
        jnp.asarray(rng.uniform(-0.3, 0.3, (batch, 3)).astype(np.float32)),
        jnp.full((batch,), 0.55, dtype=jnp.float32))
    state = core.ingest_state(state, jnp.asarray(obs))

    # Layer 1: the fused kernel alone.
    _, _, qp = core.assemble_mpc(state)
    timed_compile(
        emit, "kernel",
        jax.jit(lambda q: pdipm_pallas.solve(q, core.opts)), qp)

    # Layer 2: the vmapped QP assembly alone.
    timed_compile(emit, "assemble", jax.jit(core.assemble_mpc), state)

    # Layer 3: one full MPC step.
    timed_compile(emit, "run_mpc", jax.jit(
        lambda s: core.run_mpc(s)), state)

    # Layer 4: the bench.py chained-scan program.
    def chain(st):
        def body(s, _):
            s2, out = core.run_mpc(s)
            return s2, out.grf_world[:, 2].sum()
        _, outs = jax.lax.scan(body, st, None, length=20)
        return outs

    timed_compile(emit, "chain20", jax.jit(chain), state)


if __name__ == "__main__":
    main()
