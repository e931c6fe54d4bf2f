"""Horizon sweep for the CONSTRAINED device solver at the round-5 engine.

The unconstrained table lives in EXP_HORIZON.json; this is the
DeviceConstrainedSQP analog (corridor-bounded unicycle, 4 SQP x 3 ALM x
30 PGD), exercising the geometry-gated kernel selection across the
round-5-opened range.  Measured (2026-08-21, EXP_CON_HORIZON.json):
the fused ALM + lipq/pen kernels auto-select and run natively at EVERY
row including T=64 (Tm=128 -- first native run at that geometry) and
T=128 (Tm=256, alm slab 51 MB under the raised limit), each
deterministic: 385.5K / 156.2K / 70.7K / 51.1K / 12.6K constrained
solves/s at T=16/32/50/64/128.

Run from the repo root: python - < exp_con_horizon_chip.py
"""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

from pint_tpu.utils.timing import (
    fetch_overhead, time_chained, wait_device_ready,
)
from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP

T0 = time.time()
note = lambda m: print(f"[ch {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
rng = np.random.default_rng(0)

for T, B in [(16, 8192), (32, 4096), (50, 4096), (64, 2048), (128, 512)]:
    devc = DeviceConstrainedSQP(
        DeviceSQP(horizon=T, sqp_iters=4, pgd_iters=30,
                  x_ref=np.array([1.0, 0.0, 0.0])),
        F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=3,
    )
    OUT[f"T{T}_gates"] = {
        "fused": bool(devc._use_fused()), "lipq": bool(devc._use_lipq())
    }
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(-np.pi, np.pi, B)], axis=-1).astype(np.float32))
    u0 = devc.init_words(B)
    lam0 = devc.init_lam(B)
    # determinism probe at each geometry
    w1, l1 = devc._solve_jit(u0, x0, lam0)
    w2, l2 = devc._solve_jit(u0, x0, lam0)
    det = bool(jnp.array_equal(w1, w2) and jnp.array_equal(l1, l2))
    OUT[f"T{T}_deterministic"] = det
    inner = max(4, min(32, 65536 // B))
    sec = time_chained(
        lambda st, x: devc._solve_jit(st[0], x, st[1]),
        (u0, lam0), x0, inner=inner, reps=5, overhead=OVERHEAD)
    OUT[f"T{T}_B{B}_solves_per_s"] = B / sec
    note(f"T={T} B={B}: {B/sec:,.0f} constrained solves/s "
         f"(gates {OUT[f'T{T}_gates']}, deterministic={det})")
    with open("EXP_CON_HORIZON.json", "w") as f:
        json.dump(OUT, f, indent=1)

print(json.dumps(OUT))
