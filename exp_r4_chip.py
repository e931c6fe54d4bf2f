"""Round-4 combined on-chip experiment driver.

One chip window covers, in order (each stage isolated by try/except):
1. lipq/pen kernel validation (exactness contracts + fused-vs-XLA-inner
   bit-identity under lipq, natively compiled),
2. lipq perf: DeviceSQP / DeviceConstrainedSQP solves/s with and
   without the lipq kernels (both with the fused inner) at the headline
   config,
3. strict-precision hypothesis test for the fused-vs-XLA divergence
   (xla_allow_excess_precision=False per-program compiler option).

Writes EXP_R4.json with every number.
"""
import functools
import json
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

from pint_tpu.utils.timing import time_chained, fetch_overhead, wait_device_ready
from pint_tpu.mpc import DeviceConstrainedSQP, DeviceSQP
from pint_tpu.mpc.condense_fused import lipq_fused
from pint_tpu.models.dynamics import unpack_controls

T0 = time.time()
note = lambda m: print(f"[r4 {time.time()-T0:6.1f}s] {m}",
                       file=sys.stderr, flush=True)
OUT = {}


def stage(name):
    def deco(fn):
        def run():
            note(f"--- stage {name} ---")
            try:
                fn()
            except Exception as e:
                note(f"stage {name} FAILED: {e!r}")
                OUT[name + "_error"] = repr(e)
                traceback.print_exc(file=sys.stderr)
        return run
    return deco


assert wait_device_ready(total_budget_s=3000.0, log=note)
OVERHEAD = fetch_overhead()
note(f"fetch overhead {OVERHEAD*1e3:.1f} ms")

KW = dict(horizon=32, sqp_iters=4, pgd_iters=30,
          Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
          qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]))
CKW = dict(F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0, alm_outer=3)
B = 4096
rng = np.random.default_rng(0)
X0 = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
     rng.uniform(0, 1, B)], axis=-1).astype(np.float32))
X0C = jnp.asarray(np.stack(
    [rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
     rng.uniform(-np.pi, np.pi, B)], axis=-1).astype(np.float32))


@stage("validate")
def s1():
    d = DeviceSQP(**KW)
    lanes = jnp.asarray(
        rng.integers(-100, 100, (B, d.n_dec), dtype=np.int32))
    Ht, _ = jax.jit(d._condense_ht)(X0, lanes)
    note("compiling lipq kernel (Mosaic)...")
    hqt, lip, hmax = jax.jit(
        lambda H: lipq_fused(H, power_iters=d.power_iters, block=128)
    )(Ht)
    ok_hmax = np.array_equal(
        np.asarray(hmax), np.asarray(jnp.max(jnp.abs(Ht), axis=(0, 1))))
    expect = np.asarray(jnp.clip(
        jnp.round(Ht * (127.0 / hmax)[None, None, :]),
        -127, 127).astype(jnp.int8))
    ok_hqt = np.array_equal(np.asarray(hqt), expect)
    lip_xla = np.asarray(jax.jit(d._lipschitz_phase)(Ht))
    rel = float(np.max(np.abs(np.asarray(lip) / lip_xla - 1)))
    OUT["lipq_hmax_exact"] = ok_hmax
    OUT["lipq_hqt_exact"] = ok_hqt
    OUT["lipq_lip_rel_dev"] = rel
    note(f"kernel: hmax={ok_hmax} hqt={ok_hqt} lip rel dev {rel:.2e}")

    d_f = DeviceSQP(**KW, lipq=True, fused=True)
    d_x = DeviceSQP(**KW, lipq=True, fused=False)
    u0 = d_f.init_words(B)
    note("compiling lipq+fused / lipq+xla solvers...")
    wf = np.asarray(d_f.solve_words(u0, X0))
    wx = np.asarray(d_x.solve_words(u0, X0))
    nd = int((wf != wx).any(axis=1).sum())
    OUT["lipq_sqp_fused_eq_xla_problems_diff"] = nd
    note(f"DeviceSQP lipq fused==xla: {nd == 0} ({nd}/{B} differ)")

    c_f = DeviceConstrainedSQP(DeviceSQP(**KW), **CKW,
                               lipq=True, fused=True)
    c_x = DeviceConstrainedSQP(DeviceSQP(**KW), **CKW,
                               lipq=True, fused=False)
    note("compiling constrained lipq variants...")
    cwf, clf = c_f.solve_words(c_f.init_words(B), X0C)
    cwx, clx = c_x.solve_words(c_x.init_words(B), X0C)
    ndc = int((np.asarray(cwf) != np.asarray(cwx)).any(axis=1).sum())
    ndl = int((np.asarray(clf) != np.asarray(clx)).any(axis=1).sum())
    OUT["lipq_con_fused_eq_xla_problems_diff"] = ndc
    OUT["lipq_con_lam_problems_diff"] = ndl
    note(f"Constrained lipq fused==xla: {ndc == 0} ({ndc}/{B}; lam {ndl})")


def _rate(tag, solver_fn, state, *consts, inner):
    sec = time_chained(solver_fn, state, *consts, inner=inner, reps=5,
                       overhead=OVERHEAD)
    OUT[tag] = B / sec
    note(f"{tag}: {B/sec:,.0f} solves/s")
    return B / sec


@stage("perf")
def s2():
    d0 = DeviceSQP(**KW, fused=True, lipq=False)
    d1 = DeviceSQP(**KW, fused=True, lipq=True)
    u0 = d0.init_words(B)
    _rate("sqp_fused", lambda w, x: d0._solve_jit(w, x), u0, X0, inner=32)
    _rate("sqp_fused_lipq", lambda w, x: d1._solve_jit(w, x), u0, X0,
          inner=32)

    c0 = DeviceConstrainedSQP(DeviceSQP(**KW), **CKW,
                              fused=True, lipq=False)
    c1 = DeviceConstrainedSQP(DeviceSQP(**KW), **CKW,
                              fused=True, lipq=True)
    cu0 = c0.init_words(B)
    cl0 = c0.init_lam(B)
    _rate("con_fused", lambda st, x: c0._solve_jit(st[0], x, st[1]),
          (cu0, cl0), X0C, inner=16)
    _rate("con_fused_lipq", lambda st, x: c1._solve_jit(st[0], x, st[1]),
          (cu0, cl0), X0C, inner=16)


@stage("strict")
def s3():
    opts = {"xla_allow_excess_precision": False}

    def solve_fn(d):
        from pint_tpu.mpc.ltv import _pgd_batched_h

        def solve(u_words, x0_f):
            use_fused = (d.fused if d.fused is not None
                         else jax.default_backend() in ("tpu", "axon"))
            if use_fused:
                from pint_tpu.mpc.fused_alm import pgd_fused_words
                pgd = functools.partial(pgd_fused_words,
                                        block=d.fused_block)
            else:
                pgd = _pgd_batched_h

            def outer(_, words):
                lanes = unpack_controls(words)[:, : d.n_dec]
                Hq, g_pre, hs_num, hs_den = d._condense_dev(x0_f, lanes)
                return pgd(words, g_pre, Hq, hs_num, hs_den,
                           iters=d.pgd_iters, g_shift=d.g_shift)
            return jax.lax.fori_loop(0, d.sqp_iters, outer, u_words)
        return solve

    d0 = DeviceSQP(**KW, fused=False)
    d1 = DeviceSQP(**KW, fused=True, fused_block=256)
    u0 = d0.init_words(B)
    fa = jax.jit(solve_fn(d0), compiler_options=opts)
    fb = jax.jit(solve_fn(d1), compiler_options=opts)
    note("compiling strict-precision variants...")
    wa = np.asarray(unpack_controls(fa(u0, X0)))
    wb = np.asarray(unpack_controls(fb(u0, X0)))
    la = ((wa + 128) % 256 - 128)
    lb = ((wb + 128) % 256 - 128)
    diff = la != lb
    OUT["strict_problems_diff"] = int(diff.any(axis=1).sum())
    OUT["strict_lanes_diff"] = int(diff.sum())
    note(f"STRICT: {OUT['strict_problems_diff']}/{B} problems, "
         f"{OUT['strict_lanes_diff']} lanes, "
         f"max delta {int(np.abs(la - lb).max())}")

    # also: does lipq change the picture WITHOUT strict options?  (the
    # kernels remove the lip/quantize reductions from XLA-land, leaving
    # only the condensation einsums as variance sources)
    dl0 = DeviceSQP(**KW, fused=False, lipq=True)
    dl1 = DeviceSQP(**KW, fused=True, lipq=True)
    w0 = np.asarray(unpack_controls(dl0._solve_jit(u0, X0)))
    w1 = np.asarray(unpack_controls(dl1._solve_jit(u0, X0)))
    dd = ((w0 + 128) % 256 - 128) != ((w1 + 128) % 256 - 128)
    OUT["lipq_fullsolve_problems_diff"] = int(dd.any(axis=1).sum())
    note(f"lipq full-solve fused vs xla: "
         f"{OUT['lipq_fullsolve_problems_diff']}/{B} problems differ")


s1()
s2()
s3()
with open("EXP_R4.json", "w") as f:
    json.dump(OUT, f, indent=2)
note("wrote EXP_R4.json")
print(json.dumps(OUT))
