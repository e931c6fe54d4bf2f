"""Quantify the full-solver DeviceSQP fused-vs-XLA difference on chip.

History: round 3 measured 80/4096 problems differing (1137 lanes, max
delta 16) -- XLA compiled the f32 condensation differently around the
Pallas custom call and int8 quantization ties landed on adjacent
roundings.  Round 4 (HEAD, lipq default): **0/4096 problems, 0/262144
lanes, single-outer bit-identical True** -- every quantization rounding
now lives inside the lipq Pallas kernel, so the inner choice cannot
move ties (see DeviceSQP.fused/lipq docstrings, EXP_R4.json).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import wait_device_ready
from pint_tpu.mpc import DeviceSQP
from pint_tpu.models.dynamics import unpack_controls

T0 = time.time()
note = lambda m: print(f"[diff {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
batch = 4096
kw = dict(horizon=32, sqp_iters=4, pgd_iters=30,
          Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
          qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
d0 = DeviceSQP(**kw, fused=False)
d1 = DeviceSQP(**kw, fused=True, fused_block=256)
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, batch), rng.uniform(-0.2, 0.2, batch),
     rng.uniform(0, 1, batch)], axis=-1).astype(np.float32))
u0 = d0.init_words(batch)
wa = np.asarray(unpack_controls(d0._solve_jit(u0, x0)))
wb = np.asarray(unpack_controls(d1._solve_jit(u0, x0)))
wa2 = np.asarray(unpack_controls(d0._solve_jit(u0, x0)))
wb2 = np.asarray(unpack_controls(d1._solve_jit(u0, x0)))
la = ((wa + 128) % 256 - 128)
lb = ((wb + 128) % 256 - 128)
diff = la != lb
note(f"xla path deterministic: {np.array_equal(wa, wa2)}")
note(f"fused path deterministic: {np.array_equal(wb, wb2)}")
note(f"problems differing: {diff.any(axis=1).sum()}/{batch}; "
     f"lanes differing: {diff.sum()}/{diff.size}; "
     f"max lane delta: {np.abs(la-lb).max()}")
# first SQP outer only: identical condensation inputs (zero warm start)
d0a = DeviceSQP(**{**kw, "sqp_iters": 1}, fused=False)
d1a = DeviceSQP(**{**kw, "sqp_iters": 1}, fused=True, fused_block=256)
w1 = np.asarray(d0a._solve_jit(u0, x0))
w2 = np.asarray(d1a._solve_jit(u0, x0))
note(f"single-outer bit-identical: {np.array_equal(w1, w2)}")
