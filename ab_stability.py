"""Long-horizon closed-loop stability on real TPU: 256 envs x 30 s sim.

The f32 pallas_ric kernel drives the full walking loop (100 Hz MPC, 1 kHz
control + SRBD plant) for 30,000 ticks in 30 x 1 s dispatches; reports the
fraction of envs upright (height within 0.15 m of command, |rp| < 0.5 rad)
and tracking stats at the end.
"""
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
carry = init_carry(core, batch, 0.3, 0.55)
for sec in range(30):
    carry, traj = rollout(carry)
    if sec in (0, 4, 9, 19, 29):
        x = np.asarray(carry[1])  # (B, 12): [rpy, pos, w, v]
        h = x[:, 5]; rp = np.abs(x[:, 0:2]).max(axis=1)
        vx = x[:, 9]
        upright = (np.abs(h - 0.55) < 0.15) & (rp < 0.5) & np.isfinite(x).all(axis=1)
        print(json.dumps({"sim_s": sec+1,
            "upright_frac": round(float(upright.mean()), 4),
            "height_p50": round(float(np.median(h)), 4),
            "height_p5": round(float(np.percentile(h, 5)), 4),
            "vx_p50": round(float(np.median(vx)), 3),
            "nan_envs": int((~np.isfinite(x).all(axis=1)).sum())}), flush=True)
