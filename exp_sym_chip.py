"""End-to-end measurement of reduce="sym" vs the einsum default.

The round-5 profiler trace (EXP_REDUCE_TRACE.json) OBSERVED what the
round-4 bound argument inferred: ~1.45 ms of the 3.3 ms condensation is
`copy.*`/`reshape` ops -- bf16 hi/lo operand splits + tile relayouts
XLA materializes per DISTINCT operand of the 3-pass f32 MXU dot, plus
the f32 Ht result relayout.  reduce="sym" contracts one L-weighted
stack against ITSELF (Ht = W^T W, Q = L L^T), halving the operand
splits.  Per the repo's measurement discipline (CLAUDE.md: decide perf
questions from END-TO-END solver rates), this times FULL DeviceSQP
solves, plus an isolated-stage cross-check and a trace of the sym
variant naming what remains.  Writes EXP_SYM.json.

Run from the repo root: python - < exp_sym_chip.py
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import (
    fetch_overhead, time_chained, wait_device_ready,
)
from pint_tpu.mpc import DeviceSQP

T0 = time.time()
note = lambda m: print(f"[sym {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
rng = np.random.default_rng(0)
KW = dict(sqp_iters=4, pgd_iters=30,
          Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
          qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))

for T, B in [(32, 4096), (50, 4096), (64, 2048)]:
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
    inner = max(4, min(64, 131072 // B))
    for mode in ("einsum", "sym"):
        d = DeviceSQP(horizon=T, **KW, reduce=mode)
        u0 = d.init_words(B)
        sec = time_chained(lambda w, x: d._solve_jit(w, x), u0, x0,
                           inner=inner, reps=5, overhead=OVERHEAD)
        OUT[f"T{T}_{mode}_solves_per_s"] = B / sec
        note(f"T={T} {mode}: {B/sec:,.0f} solves/s")
    OUT[f"T{T}_sym_vs_einsum"] = (
        OUT[f"T{T}_sym_solves_per_s"] / OUT[f"T{T}_einsum_solves_per_s"]
    )
    with open("EXP_SYM.json", "w") as f:
        json.dump(OUT, f, indent=1)

print(json.dumps(OUT))
