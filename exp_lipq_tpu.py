"""On-chip validation of the lipq/pen condensation kernels.

Checks (native Mosaic, real chip):
1. lipq_fused compiles and its quantization is elementwise-exact given
   its own scales (same contract as the CPU interpret test).
2. DeviceSQP lipq=True: fused vs XLA inner bit-identical (the operands
   come from one kernel inside each program).
3. DeviceConstrainedSQP lipq=True: fused vs XLA inner bit-identical.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import wait_device_ready
from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP
from pint_tpu.mpc.condense_fused import lipq_fused, pen_fused

T0 = time.time()
note = lambda m: print(f"[lipq {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
assert wait_device_ready(total_budget_s=3000.0, log=note)

kw = dict(horizon=32, sqp_iters=2, pgd_iters=10,
          Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
          qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
B = 512
rng = np.random.default_rng(0)
x0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
     rng.uniform(0, 1, B)], axis=-1).astype(np.float32))

# 1) kernel-level contract on real operands
d = DeviceSQP(**kw)
lanes = jnp.asarray(rng.integers(-100, 100, (B, d.n_dec), dtype=np.int32))
Ht, g = jax.jit(d._condense_ht)(x0, lanes)
note("condensed; compiling lipq kernel (Mosaic)...")
hqt, lip, hmax = jax.jit(
    lambda H: lipq_fused(H, power_iters=d.power_iters, block=128)
)(Ht)
hqt_h, lip_h, hmax_h = (np.asarray(hqt), np.asarray(lip), np.asarray(hmax))
exp_hmax = np.asarray(jnp.max(jnp.abs(Ht), axis=(0, 1)))
ok_hmax = np.array_equal(hmax_h, exp_hmax)
expect = np.asarray(jnp.clip(
    jnp.round(Ht * (127.0 / hmax)[None, None, :]),
    -127, 127).astype(jnp.int8))
ok_hqt = np.array_equal(hqt_h, expect)
lip_xla = np.asarray(jax.jit(d._lipschitz_phase)(Ht))
ok_lip = np.allclose(lip_h, lip_xla, rtol=1e-3)
note(f"kernel: hmax exact={ok_hmax} hqt exact={ok_hqt} "
     f"lip close={ok_lip} (max rel dev "
     f"{np.max(np.abs(lip_h/lip_xla-1)):.2e})")

# 2) DeviceSQP lipq: fused vs XLA inner
d_f = DeviceSQP(**kw, lipq=True, fused=True)
d_x = DeviceSQP(**kw, lipq=True, fused=False)
u0 = d_f.init_words(B)
note("compiling lipq+fused solver...")
wf = np.asarray(d_f.solve_words(u0, x0))
note("compiling lipq+xla solver...")
wx = np.asarray(d_x.solve_words(u0, x0))
ok_sqp = np.array_equal(wf, wx)
nd = int((wf != wx).any(axis=1).sum())
note(f"DeviceSQP lipq fused==xla: {ok_sqp} (problems differing {nd}/{B})")

# 3) constrained
ckw = dict(F=[[0.0, 1.0, 0.0]], lo=-0.05, hi=0.05, rho=80.0, alm_outer=2)
c_f = DeviceConstrainedSQP(DeviceSQP(**kw), **ckw, lipq=True, fused=True)
c_x = DeviceConstrainedSQP(DeviceSQP(**kw), **ckw, lipq=True, fused=False)
note("compiling constrained lipq+fused...")
cwf, clf = c_f.solve_words(c_f.init_words(B), x0)
note("compiling constrained lipq+xla...")
cwx, clx = c_x.solve_words(c_x.init_words(B), x0)
ok_con = (np.array_equal(np.asarray(cwf), np.asarray(cwx))
          and np.array_equal(np.asarray(clf), np.asarray(clx)))
ndc = int((np.asarray(cwf) != np.asarray(cwx)).any(axis=1).sum())
note(f"Constrained lipq fused==xla: {ok_con} "
     f"(problems differing {ndc}/{B})")
print("LIPQ_ONCHIP", dict(hmax=ok_hmax, hqt=ok_hqt, lip=ok_lip,
                          sqp=ok_sqp, con=ok_con))
