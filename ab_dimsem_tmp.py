import json, time
import numpy as np
from bench_common import make_qp_batch
import jax, jax.numpy as jnp
from biped_pympc_tpu.ops import pdipm, pdipm_pallas
from biped_pympc_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

def make_chained(solve_fn, chain):
    @jax.jit
    def chained(q):
        def body(carry, _):
            qq = q._replace(f=q.f + 1e-12 * carry)
            res = solve_fn(qq)
            return res.x, ()
        out, _ = jax.lax.scan(body, jnp.zeros_like(q.f), None, length=chain)
        return out[:, 0].sum()
    return chained

chain, reps = 10, 8
opts = pdipm.PdipmOptions(backend="ric", refine_steps=1)
for batch in (256, 4096):
    qp = make_qp_batch(batch)
    fn = make_chained(lambda q: pdipm_pallas.solve(q, opts), chain)
    np.asarray(fn(qp))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(fn(qp))
        ts.append((time.perf_counter()-t0)/chain)
    print(json.dumps({"batch": batch, "ms": round(1e3*float(np.median(ts)), 2)}), flush=True)
