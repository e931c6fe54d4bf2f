"""Stretch item (VERDICT round-3 #8): can the fused inner survive tp>1?

A tp-sharded inner needs an int32 psum of partial gradients EVERY
iteration.  VMEM does not persist across pallas_call invocations, so
the only kernel shape compatible with a per-iteration collective is a
1-iteration kernel relaunched ``iters`` times -- which re-loads the
per-problem int8 Hessian from HBM on every launch, i.e. exactly the
re-streaming the fused kernel exists to avoid.

This script measures that directly on one chip (no collective, pure
launch/re-load cost):
  * XLA inner (30 iterations, the tp column path's per-rank work),
  * fused kernel, 30 iterations in one launch (the dp-major shape),
  * fused kernel, 1 iteration x 30 launches (the tp-compatible shape).

If variant 3 is not materially faster than the XLA inner, the tp-fused
idea is structurally void and the negative result stands with numbers.
Writes EXP_TP_FUSED.json.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import time_chained, fetch_overhead, wait_device_ready
from pint_tpu.mpc import DeviceSQP
from pint_tpu.mpc.fused_alm import pgd_fused_words
from pint_tpu.mpc.ltv import _pgd_batched_h

T0 = time.time()
note = lambda m: print(f"[tpf {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
OUT = {}
B = 4096
rng = np.random.default_rng(0)

dev = DeviceSQP(
    horizon=32, sqp_iters=4, pgd_iters=30,
    Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
    qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]),
)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
     rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
lanes = jnp.asarray(rng.integers(-100, 100, (B, dev.n_dec), dtype=np.int32))
Hq, g_pre, hs_num, hs_den = jax.jit(dev._condense_dev)(x0, lanes)
u0 = dev.init_words(B)
it = dev.pgd_iters


def t(tag, fn, inner=64):
    sec = time_chained(fn, u0, inner=inner, reps=5, overhead=OVERHEAD)
    OUT[tag + "_ms"] = sec * 1e3
    note(f"{tag}: {sec*1e3:.3f} ms/outer")


t("xla_inner", lambda w: _pgd_batched_h(
    w, g_pre, Hq, hs_num, hs_den, iters=it, g_shift=dev.g_shift))
t("fused_one_launch", lambda w: pgd_fused_words(
    w, g_pre, Hq, hs_num, hs_den, iters=it, g_shift=dev.g_shift,
    block=dev.fused_block))


def per_iter_launches(w):
    # the tp-compatible shape: one kernel launch per iteration (a psum
    # would sit between launches); operands re-load every launch
    for _ in range(it):
        w = pgd_fused_words(
            w, g_pre, Hq, hs_num, hs_den, iters=1, g_shift=dev.g_shift,
            block=dev.fused_block)
    return w


t("fused_per_iter_launches", per_iter_launches, inner=16)

# bit-check: 30x1 iterations == 1x30 iterations (pure integer loop, but
# the carry/error-feedback state resets per call -- measure the words
# divergence to document the numeric cost too)
w_a = jax.jit(lambda w: pgd_fused_words(
    w, g_pre, Hq, hs_num, hs_den, iters=it, g_shift=dev.g_shift,
    block=dev.fused_block))(u0)
w_b = jax.jit(per_iter_launches)(u0)
OUT["per_iter_carry_reset_words_differ"] = int(
    (np.asarray(w_a) != np.asarray(w_b)).any(axis=1).sum())

with open("EXP_TP_FUSED.json", "w") as f:
    json.dump(OUT, f, indent=2)
note("wrote EXP_TP_FUSED.json")
print(json.dumps(OUT))
