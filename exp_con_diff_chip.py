"""Constrained fused-vs-XLA full-solve identity at the large geometries.

The unconstrained diffs live in EXP_R5.json / EXP_SOAK.json; this is
the DeviceConstrainedSQP analog at the round-5-opened horizons: with
the lipq/pen kernels carrying every quantization rounding, the fused
ALM inner and the XLA `_alm_batched` inner must produce identical
packed word planes AND integer multiplier planes through full solves.

Measured (2026-08-21, EXP_CON_DIFF.json): T=64 (Tm=128) 0/1024 word
planes, 0/1024 multiplier planes differ; T=128 (Tm=256) 0/256 and
0/256 -- the D3 determinism row (docs/DESIGN.md section 11) holds for
the constrained tier across the whole shipped horizon range.

Run from the repo root: python - < exp_con_diff_chip.py
"""
import json
import sys
import time

import numpy as np
import jax.numpy as jnp

from pint_tpu.utils.timing import wait_device_ready
from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP

T0 = time.time()
note = lambda m: print(f"[cd {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
rng = np.random.default_rng(0)
OUT = {}
for T, B in [(64, 1024), (128, 256)]:
    mk = lambda **kw: DeviceConstrainedSQP(
        DeviceSQP(horizon=T, sqp_iters=4, pgd_iters=30,
                  x_ref=np.array([1.0, 0.0, 0.0])),
        F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0,
        alm_outer=3, **kw)
    cf = mk()                      # auto: fused + lipq/pen kernels
    cx = mk(fused=False)           # XLA ALM inner, lipq stays auto-on
    assert cf._use_fused() and cf._use_lipq() and cx._use_lipq()
    x0 = jnp.asarray(np.stack(
        [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
         rng.uniform(-np.pi, np.pi, B)], -1).astype(np.float32))
    u0 = cf.init_words(B)
    lam0 = cf.init_lam(B)
    wf, lf = cf._solve_jit(u0, x0, lam0)
    wx, lx = cx._solve_jit(u0, x0, lam0)
    wdiff = int((np.asarray(wf) != np.asarray(wx)).any(axis=1).sum())
    ldiff = int((np.asarray(lf) != np.asarray(lx)).any(axis=1).sum())
    OUT[f"T{T}_batch"] = B
    OUT[f"T{T}_word_problems_diff"] = wdiff
    OUT[f"T{T}_lam_problems_diff"] = ldiff
    note(f"T={T}: {wdiff}/{B} word planes, {ldiff}/{B} multiplier "
         "planes differ")
    with open("EXP_CON_DIFF.json", "w") as f:
        json.dump(OUT, f, indent=1)
print(json.dumps(OUT))
