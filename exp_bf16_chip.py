"""Full-solver rate for the opt-in reduce='bf16' speed mode vs the f32
default (T=32 and T=50, B=4096, fused+lipq on).  Writes EXP_BF16.json."""
import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import time_chained, fetch_overhead, wait_device_ready
from pint_tpu.mpc import DeviceSQP
from pint_tpu.mpc.ltv import QuantizedSQP

T0 = time.time()
note = lambda m: print(f"[bf16 {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
B = 4096
rng = np.random.default_rng(0)

for T in (32, 50):
    kw = dict(horizon=T, sqp_iters=4, pgd_iters=30,
              Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
              qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
    base = DeviceSQP(**kw)
    x0 = np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32)
    x0j = jnp.asarray(x0)
    u0 = base.init_words(B)
    for name in ("einsum", "bf16"):
        d = dataclasses.replace(base, reduce=name)
        sec = time_chained(
            lambda w, x, dd=d: dd._solve_jit(w, x), u0, x0j,
            inner=32 if T == 32 else 16, reps=5, overhead=OVERHEAD)
        OUT[f"T{T}_{name}_per_s"] = B / sec
        note(f"T{T} {name}: {B/sec:,.0f} solves/s")
    # quality on chip: final true cost vs the f64 host path
    host = QuantizedSQP(**kw)
    sub = x0[:64].astype(np.float64)
    w_b = dataclasses.replace(base, reduce="bf16").solve_words(
        base.init_words(64), sub.astype(np.float32))
    _, hc = host.solve(sub)
    cb = host.true_cost(sub, host.lanes(w_b))
    rel = float(np.max(np.abs(cb - hc[:, -1]) /
                       np.maximum(np.abs(hc[:, -1]), 1e-4)))
    OUT[f"T{T}_bf16_cost_rel_dev"] = rel
    note(f"T{T} bf16 cost rel dev vs host: {rel:.4f}")

with open("EXP_BF16.json", "w") as f:
    json.dump(OUT, f, indent=2)
note("wrote EXP_BF16.json")
print(json.dumps(OUT))
