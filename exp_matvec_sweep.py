"""Locate the kernel-vs-XLA crossover for the tp-column matvec.

Round 4 measured two points at Tm=64 (EXP_MATVEC.json): K=32 columns/
rank (tp=2) kernel wins 28.0 vs 37.5 us, K=16 (tp=4) kernel loses 11.6
vs 10.5 us.  The round-5 auto-gate (`fused_alm.matvec_wins`) needs the
crossover located, not bracketed: this sweep times both paths at
K in {8, 16, 24, 32, 48, 64} columns against Tm in {64, 96}, 30 chained
calls per sample (the per-outer launch count).  Writes
EXP_MATVEC_SWEEP.json; `fused_alm._MATVEC_MIN_COLS` cites it.

Run from the repo root: python - < exp_matvec_sweep.py
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
from pint_tpu.mpc.fused_alm import pgd_matvec_cols

T0 = time.time()
note = lambda m: print(f"[mvs {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {"B": 4096}
B = 4096
rng = np.random.default_rng(0)

for Tm in (64, 96):
    for K in (8, 16, 24, 32, 48, 64):
        if K > Tm:
            continue
        hqt_r = jnp.asarray(
            rng.integers(-127, 128, (K, Tm, B), dtype=np.int8))
        Hq_cols = jnp.asarray(
            np.moveaxis(np.asarray(hqt_r), -1, 0).transpose(0, 2, 1))
        lanes0 = jnp.asarray(
            rng.integers(-127, 128, (B, K), dtype=np.int32))

        def kern_step(lanes):
            p = pgd_matvec_cols(lanes, hqt_r, block=256)
            return (lanes + p[:, :K]) & 127

        def xla_step(lanes):
            p = jax.lax.dot_general(
                lanes.astype(jnp.int8), Hq_cols,
                dimension_numbers=(((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )
            return (lanes + p[:, :K]) & 127

        row = {}
        for name, fn in (("kernel", kern_step), ("xla", xla_step)):
            sec = time_chained(fn, lanes0, inner=30 * 8, reps=5,
                               overhead=OVERHEAD)
            row[name + "_us"] = sec * 1e6
        row["kernel_wins"] = row["kernel_us"] < row["xla_us"]
        a = np.asarray(pgd_matvec_cols(lanes0, hqt_r, block=256))
        b = np.asarray(jax.lax.dot_general(
            lanes0.astype(jnp.int8), Hq_cols,
            dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32))
        row["bitexact"] = bool((a == b).all())
        OUT[f"Tm{Tm}_K{K}"] = row
        note(f"Tm={Tm} K={K}: kernel {row['kernel_us']:.2f} us, "
             f"xla {row['xla_us']:.2f} us, wins={row['kernel_wins']}, "
             f"exact={row['bitexact']}")
        with open("EXP_MATVEC_SWEEP.json", "w") as f:
            json.dump(OUT, f, indent=1)

print(json.dumps(OUT))
