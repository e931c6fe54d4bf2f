"""Multi-seed fused-vs-XLA full-solve determinism soak.

The single-batch artifacts (EXP_R5.json, exp_fused_pgd_diff) show 0/N
at one x0 draw per geometry.  This soak re-draws the initial-state
batch across seeds and accumulates the diff count, at both the
headline T=32 and the round-5-opened T=64 geometry -- raising the
evidence from one batch to tens of thousands of problems per
geometry.  Writes EXP_SOAK.json.

Run from the repo root: python - < exp_determinism_soak.py
"""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

from pint_tpu.utils.timing import wait_device_ready
from pint_tpu.mpc import DeviceSQP
from pint_tpu.models.dynamics import unpack_controls

T0 = time.time()
note = lambda m: print(f"[soak {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
KW = dict(sqp_iters=4, pgd_iters=30,
          Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
          qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
OUT = {}

for T, B, seeds in [(32, 4096, 6), (64, 2048, 4)]:
    d_f = DeviceSQP(horizon=T, **KW)            # auto: lipq + fused
    d_x = DeviceSQP(horizon=T, **KW, fused=False)
    u0 = d_f.init_words(B)
    probs = lanes = total = 0
    for seed in range(seeds):
        rng = np.random.default_rng(1000 + seed)
        x0 = jnp.asarray(np.stack(
            [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
             rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
        wf = np.asarray(unpack_controls(d_f._solve_jit(u0, x0)))
        wx = np.asarray(unpack_controls(d_x._solve_jit(u0, x0)))
        diff = ((wf + 128) % 256) != ((wx + 128) % 256)
        probs += int(diff.any(axis=1).sum())
        lanes += int(diff.sum())
        total += B
        note(f"T={T} seed {seed}: cumulative {probs}/{total} problems")
    OUT[f"T{T}_problems_diff"] = probs
    OUT[f"T{T}_problems_total"] = total
    OUT[f"T{T}_lanes_diff"] = lanes
    with open("EXP_SOAK.json", "w") as f:
        json.dump(OUT, f, indent=1)

print(json.dumps(OUT))
