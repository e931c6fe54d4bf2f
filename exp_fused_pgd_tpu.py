"""On-chip check + timing for the fused per-problem PGD (DeviceSQP)."""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import fetch_overhead, time_chained, wait_device_ready
from pint_tpu.mpc import DeviceSQP
from pint_tpu.mpc.ltv import _pgd_batched_h
from pint_tpu.mpc.fused_alm import pgd_fused_words

T0 = time.time()


def note(m):
    print(f"[pgd {time.time()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)


assert wait_device_ready(log=note), "device not ready"
overhead = fetch_overhead()
batch = 4096
kw = dict(horizon=32, sqp_iters=4, pgd_iters=30,
          Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
          qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
d0 = DeviceSQP(**kw, fused=False)
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, batch), rng.uniform(-0.2, 0.2, batch),
     rng.uniform(0, 1, batch)], axis=-1).astype(np.float32))
u0 = d0.init_words(batch)
lanes0 = jnp.asarray(
    rng.integers(-100, 100, (batch, d0.n_dec), dtype=np.int32))
Hq, g_pre, hs_num, hs_den = jax.jit(d0._condense_dev)(x0, lanes0)
out = {"batch": batch}

w_ref = jax.jit(lambda w: _pgd_batched_h(
    w, g_pre, Hq, hs_num, hs_den, iters=30, g_shift=d0.g_shift))(u0)
sec = time_chained(
    lambda w: _pgd_batched_h(w, g_pre, Hq, hs_num, hs_den,
                             iters=30, g_shift=d0.g_shift),
    u0, inner=64, reps=3, overhead=overhead)
out["pgd_xla_s_per_outer"] = sec
note(f"XLA pgd: {sec*1e3:.2f} ms/outer")

for blk in (256, 512):
    try:
        f = jax.jit(lambda w, _b=blk: pgd_fused_words(
            w, g_pre, Hq, hs_num, hs_den, iters=30,
            g_shift=d0.g_shift, block=_b))
        ok = bool(jnp.all(w_ref == f(u0)))
        out[f"bit_identical_b{blk}"] = ok
        note(f"block={blk}: bit-identical={ok}")
        if not ok:
            continue
        sec = time_chained(lambda w, _f=f: _f(w), u0,
                           inner=64, reps=3, overhead=overhead)
        out[f"pgd_fused_s_per_outer_b{blk}"] = sec
        note(f"block={blk}: {sec*1e3:.2f} ms/outer")
    except Exception as e:
        out[f"block_{blk}_error"] = repr(e)[:200]
        note(f"block={blk}: FAILED {repr(e)[:120]}")

# full DeviceSQP solver, fused vs XLA
d1 = DeviceSQP(**kw, fused=True, fused_block=256)
wa = jax.jit(lambda u, x: d0._solve_jit(u, x))(u0, x0)
wb = d1._solve_jit(u0, x0)
ok = bool(jnp.all(wa == wb))
out["solver_bit_identical"] = ok
note(f"full DeviceSQP bit-identical={ok}")
sec = time_chained(lambda w, x: d1._solve_jit(w, x), u0, x0,
                   inner=32, reps=3, overhead=overhead)
out["fused_full_s_per_batch"] = sec
out["fused_solves_per_s"] = batch / sec
note(f"fused DeviceSQP: {sec*1e3:.2f} ms/batch = {batch/sec:.0f} solves/s "
     f"(XLA path: 33.0 ms, 125K)")
print(json.dumps(out))
