import json, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "examples")
from tpu_rollout import init_carry, make_rollout
from biped_pympc_tpu.control.controller import BipedControllerCore
from biped_pympc_tpu import ControllerConf, MPCConf
from biped_pympc_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

batch = 256
core = BipedControllerCore(ControllerConf(), MPCConf(solver="pallas_ric"), gait_id=2)
rollout, cycles = make_rollout(core, 1.0)
rollout = jax.jit(rollout)

def run_case(name, vx_rng, vy_rng, wz_rng, rand_phase):
    rng = np.random.default_rng(0)
    carry = init_carry(core, batch, 0.3, 0.55)
    state, x, foot_w = carry
    twist = np.zeros((batch, 3), np.float32)
    twist[:, 0] = rng.uniform(*vx_rng, batch)
    twist[:, 1] = rng.uniform(*vy_rng, batch)
    twist[:, 2] = rng.uniform(*wz_rng, batch)
    state = core.set_command(state, jnp.asarray(twist), jnp.full((batch,), 0.55, jnp.float32))
    if rand_phase:
        state = state._replace(gait_phase=jnp.asarray(rng.uniform(0,1,batch).astype(np.float32)))
    carry = (state, x, foot_w)
    for sec in range(12):
        carry, _ = rollout(carry)
    x = np.asarray(carry[1])
    fin = np.isfinite(x).all(axis=1)
    h = x[:, 5]
    upright = fin & (np.abs(np.where(fin, h, 0) - 0.55) < 0.15)
    # correlate failure with command magnitude
    bad = ~upright
    out = {"case": name, "upright_frac": round(float(upright.mean()),4), "nan": int((~fin).sum())}
    if bad.any() and not bad.all():
        out["bad_vx_mean"] = round(float(np.abs(twist[bad,0]).mean()),3)
        out["ok_vx_mean"] = round(float(np.abs(twist[~bad,0]).mean()),3)
        out["bad_wz_mean"] = round(float(np.abs(twist[bad,2]).mean()),3)
        out["ok_wz_mean"] = round(float(np.abs(twist[~bad,2]).mean()),3)
        out["bad_vy_mean"] = round(float(np.abs(twist[bad,1]).mean()),3)
        out["ok_vy_mean"] = round(float(np.abs(twist[~bad,1]).mean()),3)
    print(json.dumps(out), flush=True)

run_case("vx_only",  (-0.3, 0.5), (0,0), (0,0), False)
run_case("vx_phase", (-0.3, 0.5), (0,0), (0,0), True)
run_case("vy_only",  (0.3, 0.3), (-0.15,0.15), (0,0), False)
run_case("wz_only",  (0.3, 0.3), (0,0), (-0.3,0.3), False)
run_case("all",      (-0.3, 0.5), (-0.15,0.15), (-0.3,0.3), True)
