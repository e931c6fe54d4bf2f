"""Horizon-scaling sweep for the round-4 default DeviceSQP path
(fused inner + lipq kernel) -- refreshes BASELINE.md's round-2 XLA-path
table (T=16 193K / T=32 124K / T=64 47.4K / T=128 12.5K solves/s).
Batch scales down with T^2 memory as in the original sweep.
Writes EXP_HORIZON.json."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import time_chained, fetch_overhead, wait_device_ready
from pint_tpu.mpc import DeviceSQP

T0 = time.time()
note = lambda m: print(f"[hor {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
rng = np.random.default_rng(0)

CONFIGS = [(16, 8192), (32, 4096), (50, 4096), (64, 2048), (128, 512)]
for T, B in CONFIGS:
    dev = DeviceSQP(
        horizon=T, sqp_iters=4, pgd_iters=30,
        Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
        qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]),
    )
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
    u0 = dev.init_words(B)
    inner = max(4, 131072 // B)
    sec = time_chained(
        lambda w, x: dev._solve_jit(w, x), u0, x0,
        inner=min(inner, 64), reps=5, overhead=OVERHEAD)
    OUT[f"T{T}_B{B}_solves_per_s"] = B / sec
    OUT[f"T{T}_B{B}_step_solves_per_s"] = B * T / sec
    note(f"T={T} B={B}: {B/sec:,.0f} solves/s "
         f"({B*T/sec/1e6:.2f}M step-solves/s)")

with open("EXP_HORIZON.json", "w") as f:
    json.dump(OUT, f, indent=2)
note("wrote EXP_HORIZON.json")
print(json.dumps(OUT))
