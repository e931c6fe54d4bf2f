"""Full-solver rates for reduce='btrans' (explicit batch-leading GEMM)
vs the default einsum reduce, plus the constrained solver (T=32 and
T=50, B=4096).  End-to-end only: isolated-stage timings are unreliable
(XLA collapses mean-consumed einsums -- see exp_condense_chip.py notes).
Writes EXP_BTRANS.json."""
import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import time_chained, fetch_overhead, wait_device_ready
from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP

T0 = time.time()
note = lambda m: print(f"[btr {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
B = 4096
rng = np.random.default_rng(0)


def mk(T, **kw):
    return DeviceSQP(
        horizon=T, sqp_iters=4, pgd_iters=30,
        Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
        qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]), **kw,
    )


for T in (32, 50):
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
    base = mk(T)
    u0 = base.init_words(B)
    # agreement first (roundoff-level on chip)
    lanes = jnp.asarray(rng.integers(-100, 100, (B, base.n_dec),
                                     dtype=np.int32))
    A, Bl, c = jax.jit(base._linearize_phase)(x0, lanes)
    Ab, Bb, Cb = jax.jit(base._propagate_scan)(A, Bl, c)
    He, _ = jax.jit(base._reduce_phase)(Ab, Bb, Cb, x0)
    Hb, _ = jax.jit(base._reduce_btrans)(Ab, Bb, Cb, x0)
    OUT[f"T{T}_btrans_rel"] = float(
        jnp.max(jnp.abs(Hb - He)) / jnp.max(jnp.abs(He)))
    note(f"T{T} btrans rel dev {OUT[f'T{T}_btrans_rel']:.2e}")
    for name in ("einsum", "btrans"):
        d = dataclasses.replace(base, reduce=name)
        sec = time_chained(
            lambda w, x, dd=d: dd._solve_jit(w, x), u0, x0,
            inner=32 if T == 32 else 16, reps=5, overhead=OVERHEAD)
        OUT[f"T{T}_solver_{name}_per_s"] = B / sec
        note(f"T{T} solver {name}: {B/sec:,.0f} solves/s")

# constrained at T=32 with the winning reduce (measured for both)
x0c = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
     rng.uniform(-np.pi, np.pi, B)], axis=-1).astype(np.float32))
for name in ("einsum", "btrans"):
    cs = DeviceConstrainedSQP(
        mk(32, reduce=name),
        F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=3,
    )
    sec = time_chained(
        lambda st, x, c=cs: c._solve_jit(st[0], x, st[1]),
        (cs.init_words(B), cs.init_lam(B)), x0c,
        inner=16, reps=5, overhead=OVERHEAD)
    OUT[f"con_T32_{name}_per_s"] = B / sec
    note(f"con T32 {name}: {B/sec:,.0f} solves/s")

with open("EXP_BTRANS.json", "w") as f:
    json.dump(OUT, f, indent=2)
note("wrote EXP_BTRANS.json")
print(json.dumps(OUT))
