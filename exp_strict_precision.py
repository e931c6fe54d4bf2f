"""Hypothesis test: is the fused-vs-XLA full-solve divergence caused by
per-module FMA/excess-precision choices in the f32 condensation?

Compiles both DeviceSQP inner variants with
``xla_allow_excess_precision=False`` (per-program compiler option) and
re-runs the exp_fused_pgd_diff.py comparison.  If the divergence
vanishes, the variance source is confirmed as excess-precision/FMA
contraction differing between the two modules.

RESULT (EXP_R4.json, 2026-08-20): negative -- still 80/4096 problems /
1137 lanes, exactly the unflagged counts.  The axon AOT compiler
snapshots its own XLA_FLAGS (including --xla_allow_excess_precision=
true) at plugin load, so per-program compiler options of this kind do
not reach the backend.  The crack was instead closed by the ``lipq``
kernel (mpc/condense_fused.py): with the quantization roundings inside
one Pallas kernel, full fused-vs-XLA solves measure 0/4096 differing.
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import wait_device_ready
from pint_tpu.mpc import DeviceSQP
from pint_tpu.models.dynamics import unpack_controls

T0 = time.time()
note = lambda m: print(f"[xp {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)
batch = 4096
kw = dict(horizon=32, sqp_iters=4, pgd_iters=30,
          Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
          qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
opts = {"xla_allow_excess_precision": False}
d0 = DeviceSQP(**kw, fused=False)
d1 = DeviceSQP(**kw, fused=True, fused_block=256)
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, batch), rng.uniform(-0.2, 0.2, batch),
     rng.uniform(0, 1, batch)], axis=-1).astype(np.float32))
u0 = d0.init_words(batch)


def solve_fn(d):
    from pint_tpu.mpc.ltv import _pgd_batched_h

    def solve(u_words, x0_f):
        use_fused = (d.fused if d.fused is not None
                     else jax.default_backend() in ("tpu", "axon"))
        if use_fused:
            from pint_tpu.mpc.fused_alm import pgd_fused_words
            pgd = functools.partial(pgd_fused_words, block=d.fused_block)
        else:
            pgd = _pgd_batched_h

        def outer(_, words):
            lanes = unpack_controls(words)[:, : d.n_dec]
            Hq, g_pre, hs_num, hs_den = d._condense_dev(x0_f, lanes)
            return pgd(words, g_pre, Hq, hs_num, hs_den,
                       iters=d.pgd_iters, g_shift=d.g_shift)
        return jax.lax.fori_loop(0, d.sqp_iters, outer, u_words)
    return solve


fa = jax.jit(solve_fn(d0), compiler_options=opts)
fb = jax.jit(solve_fn(d1), compiler_options=opts)
note("compiling xla variant (strict precision)...")
wa = np.asarray(unpack_controls(fa(u0, x0)))
note("compiling fused variant (strict precision)...")
wb = np.asarray(unpack_controls(fb(u0, x0)))
la = ((wa + 128) % 256 - 128)
lb = ((wb + 128) % 256 - 128)
diff = la != lb
note(f"STRICT: problems differing: {diff.any(axis=1).sum()}/{batch}; "
     f"lanes: {diff.sum()}/{diff.size}; max delta: {np.abs(la-lb).max()}")
