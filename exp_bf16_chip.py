"""Full-solver rate for a bf16-Hessian-contraction reduce variant vs
the f32 default (T=32 and T=50, B=4096, fused+lipq on).

RESULT (EXP_BF16.json, 2026-08-21): negative on BOTH axes -- 11%/7%
SLOWER (219.7K vs 248.0K at T=32; 95.7K vs 102.5K at T=50: the bf16
cast passes cost more than the halved einsum traffic saves) and 3.2%/
6.4% final-cost deviation vs the float64 host path (vs <0.5% for f32).
The reduce='bf16' option was removed from DeviceSQP accordingly; this
script keeps a standalone copy of the variant for re-measurement.
"""
import dataclasses as _dc  # noqa: F401 (kept for the header example)
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
    import types

    def _reduce_bf16(self, Abar, Bbar_all, Cbar, x0_f):
        T_ = self.horizon
        Q, Qf, R_kron, x_ref = self._reduce_consts()
        Cx = Cbar - x_ref[:, :, None]
        BQ = jnp.einsum("kinb,ij->kjnb", Bbar_all, Q)
        BT = Bbar_all[T_ - 1]
        BQT = jnp.einsum("inb,ij->jnb", BT, Qf - Q)
        Ht = jnp.einsum(
            "kjnb,kjmb->nmb", BQ.astype(jnp.bfloat16),
            Bbar_all.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        Ht = Ht + jnp.einsum(
            "jnb,jmb->nmb", BQT.astype(jnp.bfloat16),
            BT.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
        Ht = Ht + R_kron[:, :, None]
        g = self._reduce_linear(BQ, BQT, Abar, Cx, x0_f)
        return Ht, g

    variants = {"einsum": base}
    b16 = dataclasses.replace(base)
    object.__setattr__(b16, "_reduce_phase",
                       types.MethodType(_reduce_bf16, b16))
    variants["bf16"] = b16
    for name, d in variants.items():
        sec = time_chained(
            lambda w, x, dd=d: dd._solve_jit(w, x), u0, x0j,
            inner=32 if T == 32 else 16, reps=5, overhead=OVERHEAD)
        OUT[f"T{T}_{name}_per_s"] = B / sec
        note(f"T{T} {name}: {B/sec:,.0f} solves/s")
    # quality on chip: final true cost vs the f64 host path
    host = QuantizedSQP(**kw)
    sub = x0[:64].astype(np.float64)
    w_b = b16.solve_words(base.init_words(64), sub.astype(np.float32))
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
