"""On-device self-check: every op family bit-exact on the real TPU.

The unit suite runs on CPU (identical integer semantics); this script
re-verifies on actual TPU hardware: jnp formulas vs the host oracle, the
Pallas elementwise kernels vs the jnp formulas, the fused MPC kernel vs the
word-space solver, and a rollout against the float64 reference.

Usage: python tpu_selfcheck.py   (takes minutes: remote kernel compiles)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Pallas/matmul compiles through the axon tunnel take minutes; reuse
# bench.py's persistent cache so repeat selfchecks are seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main() -> None:
    from pint_tpu import PackedLayout
    from pint_tpu.ops import pallas as P
    from pint_tpu.ops import word as W
    from pint_tpu.utils import Oracle

    failures = []

    def check(name, ok):
        print(("PASS " if ok else "FAIL ") + name, flush=True)
        if not ok:
            failures.append(name)

    # 1. jnp formulas vs oracle, on TPU
    for widths in [(8, 8, 8, 8), (1, 2, 3, 4, 5, 6, 11), (5, 6, 5)]:
        lay = PackedLayout(*widths)
        oracle = Oracle(lay)
        rng = np.random.default_rng(0)
        aw = rng.integers(0, 1 << lay.word_bits, 4096, dtype=np.uint64)
        bw = rng.integers(0, 1 << lay.word_bits, 4096, dtype=np.uint64)
        aw &= np.uint64(lay.used_mask)
        bw &= np.uint64(lay.used_mask)
        a = jnp.asarray(aw.astype(lay.word_dtype))
        b = jnp.asarray(bw.astype(lay.word_dtype))
        for op in (
            "add_wrap", "add_unsigned_saturate", "add_signed_saturate",
            "sub_wrap", "sub_unsigned_saturate", "sub_signed_saturate",
            "min_unsigned", "max_signed",
        ):
            got = np.asarray(getattr(W, op)(lay, a, b)).astype(np.uint64)
            exp = getattr(oracle, op)(aw, bw) & np.uint64(lay.word_ones)
            check(f"jnp {op} {widths}", bool((got == exp).all()))
        for op in ("shift_left", "shift_right_unsigned"):
            got = np.asarray(
                getattr(W, op)(lay, a, jnp.uint32(3))
            ).astype(np.uint64)
            exp = getattr(oracle, op)(aw, 3) & np.uint64(lay.word_ones)
            check(f"jnp {op} {widths}", bool((got == exp).all()))

    # 2. Pallas elementwise kernels vs jnp formulas (native compile)
    lay = PackedLayout(8, 8, 8, 8)
    rng = np.random.default_rng(1)
    aw = jnp.asarray(rng.integers(0, 2**32, 4096, dtype=np.uint32))
    bw = jnp.asarray(rng.integers(0, 2**32, 4096, dtype=np.uint32))
    for op in ("add_unsigned_saturate", "add_signed_saturate", "min_signed"):
        got = P.binop(lay, op, interpret=False)(aw, bw)
        exp = getattr(W, op)(lay, aw, bw)
        check(f"pallas {op}", bool(jnp.all(got == exp)))
    for op in ("shift_left", "shift_right_unsigned"):
        for amount in (0, 3, 9):
            got = P.shift(lay, op, interpret=False)(aw, amount)
            exp = getattr(W, op)(lay, aw, amount)
            check(f"pallas {op}({amount})", bool(jnp.all(got == exp)))
    # narrow word dtypes (widened to u32 in-kernel; Mosaic has no i8 ALU)
    for widths in [(3, 3), (5, 6, 5)]:
        lay_n = PackedLayout(*widths)
        rngn = np.random.default_rng(7)
        wn = rngn.integers(0, 1 << lay_n.word_bits, 4096, dtype=np.uint64)
        an = jnp.asarray((wn & np.uint64(lay_n.used_mask)).astype(lay_n.word_dtype))
        bn = jnp.asarray(
            ((wn >> np.uint64(1)) & np.uint64(lay_n.used_mask)).astype(
                lay_n.word_dtype
            )
        )
        got = P.binop(lay_n, "add_unsigned_saturate", interpret=False)(an, bn)
        exp = W.add_unsigned_saturate(lay_n, an, bn)
        check(f"pallas u{lay_n.word_bits} addsat", bool(jnp.all(got == exp)))

    # 3. fused MPC kernel vs word-space solver
    from pint_tpu.mpc import (
        FixedPointPGD, FusedPGD, condense_double_integrator, quantize,
    )

    qqp = quantize(condense_double_integrator(T=50))
    x0 = np.stack(
        [np.linspace(-3, 3, 256), np.linspace(-1, 1, 256)], axis=-1
    )
    g = jnp.asarray(qqp.g_lane_fixed(x0))
    u0 = FixedPointPGD(qqp).init_words(256)
    w_ref = jax.jit(FixedPointPGD(qqp, iters=40).solve_words)(u0, g)
    w_fused = FusedPGD(qqp, iters=40, interpret=False).solve_words(u0, g)
    check("fused == word-space solver", bool(jnp.all(w_ref == w_fused)))
    # packed_io is interpret-only pending a Mosaic lane-shuffle fix (see
    # FusedPGD.packed_io docstring); not checked here.

    # 4. quantized rollout vs float64 reference
    from pint_tpu.models import DoubleIntegrator, pack_controls

    model = DoubleIntegrator()
    lanes = np.asarray(
        np.random.default_rng(2).integers(-128, 128, (64, 48)), np.int32
    )
    states = model.rollout_packed(
        jnp.zeros((64, 2), jnp.int32), pack_controls(jnp.asarray(lanes))
    )
    got = model.to_float(np.asarray(states))
    expected = model.reference_rollout(
        np.zeros((64, 2)), lanes.astype(np.float64) * model.u_scale
    )
    T = 48
    tol = (T + 2 + T * T * model.dt) * 2.0**-model.frac_bits
    check(
        "rollout vs float64 reference",
        bool(np.abs(got - expected).max() <= tol),
    )

    # 5. u64 split (2xu32) Pallas kernels -- native Mosaic compile, via the
    # x64-free pair-word entry (the TPU production path: no jax_enable_x64).
    # The per-lane oracle runs in numpy, so exactness is still end-to-end.
    for widths in [(8,) * 8, (20, 20, 24)]:
        lay64 = PackedLayout(*widths)
        oracle64 = Oracle(lay64)
        rng64 = np.random.default_rng(11)
        aw = rng64.integers(0, 2**64 - 1, 4096, dtype=np.uint64, endpoint=True)
        bw = rng64.integers(0, 2**64 - 1, 4096, dtype=np.uint64, endpoint=True)
        aw &= np.uint64(lay64.used_mask)
        bw &= np.uint64(lay64.used_mask)
        # planar pair words: [0]=low half, [1]=high half
        ap = jnp.asarray(
            np.stack([aw & 0xFFFFFFFF, aw >> np.uint64(32)], 0).astype(
                np.uint32
            )
        )
        bp = jnp.asarray(
            np.stack([bw & 0xFFFFFFFF, bw >> np.uint64(32)], 0).astype(
                np.uint32
            )
        )

        def _merge(pair):
            p = np.asarray(pair).astype(np.uint64)
            return p[0] | (p[1] << np.uint64(32))

        for op in ("add_unsigned_saturate", "sub_signed_saturate", "max_signed"):
            got = _merge(P.binop_pair(lay64, op, interpret=False)(ap, bp))
            exp = getattr(oracle64, op)(aw, bw) & np.uint64(lay64.word_ones)
            check(f"pallas u64-pair {op} {widths}", bool((got == exp).all()))
        for amount in (0, 7, 33, 64):
            got = _merge(
                P.shift_pair(lay64, "shift_left", interpret=False)(ap, amount)
            )
            exp = oracle64.shift_left(aw, amount) & np.uint64(lay64.word_ones)
            check(
                f"pallas u64-pair shift_left({amount}) {widths}",
                bool((got == exp).all()),
            )

    # 6. device-resident SQP: full nonlinear loop natively compiled, final
    # costs within 1% of the f64 host path
    from pint_tpu.mpc import DeviceSQP, QuantizedSQP

    kw = dict(
        horizon=32, sqp_iters=4, pgd_iters=30,
        Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
        qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]),
    )
    host6 = QuantizedSQP(**kw)
    dev6 = DeviceSQP(**kw)
    x06 = np.array([[0.0, 0.0, 0.0], [-0.1, 0.05, 0.1]])
    _, hcost = host6.solve(x06)
    w6, _ = dev6.solve(x06)
    dcost = host6.true_cost(x06, host6.lanes(w6))
    rel = float(np.abs(dcost - hcost[:, -1]).max() / hcost[:, -1].max())
    check(f"device SQP vs host path (rel {rel:.4f})", rel < 0.01)

    # 7. fused VMEM-resident per-problem inner kernels (mpc/fused_alm.py)
    # vs the XLA inners, natively compiled, identical operands -> must be
    # bit-identical (the contract tests/test_fused_alm.py asserts on CPU)
    from pint_tpu.mpc import DeviceConstrainedSQP
    from pint_tpu.mpc.fused_alm import alm_fused_words, pgd_fused_words
    from pint_tpu.mpc.ltv import _pgd_batched_h
    from pint_tpu.mpc.sqp_constrained import _Y_SHIFT, _alm_batched

    B7 = 256
    rng7 = np.random.default_rng(7)
    x07 = jnp.asarray(np.stack(
        [rng7.uniform(-0.2, 0.2, B7), rng7.uniform(-0.2, 0.2, B7),
         rng7.uniform(-np.pi, np.pi, B7)], axis=-1).astype(np.float32))
    d7 = DeviceSQP(horizon=8, sqp_iters=2, pgd_iters=6,
                   x_ref=np.array([1.0, 0.0, 0.0]), fused=False)
    lanes7 = jnp.asarray(
        rng7.integers(-100, 100, (B7, d7.n_dec), dtype=np.int32))
    Hq7, g7, hn7, hd7 = jax.jit(d7._condense_dev)(x07, lanes7)
    u07 = d7.init_words(B7)
    w_x = jax.jit(lambda w: _pgd_batched_h(
        w, g7, Hq7, hn7, hd7, iters=6, g_shift=d7.g_shift))(u07)
    w_f = jax.jit(lambda w: pgd_fused_words(
        w, g7, Hq7, hn7, hd7, iters=6, g_shift=d7.g_shift,
        block=128, interpret=False))(u07)
    check("fused PGD kernel == XLA inner", bool(jnp.all(w_x == w_f)))

    dc7 = DeviceConstrainedSQP(
        d7, F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0,
        alm_outer=2, fused=False)
    ops7, _ = jax.jit(dc7._condense_constrained_dev)(x07, lanes7)
    lam07 = dc7.init_lam(B7)
    order7 = ("g_pre", "Hq", "hs_num", "hs_den", "Sq", "cs_num",
              "cs_den", "c_off", "lo_pre", "hi_pre", "eh_num", "eh_den",
              "el_num", "el_den")
    kw7 = dict(outer=2, inners=6, g_shift=d7.g_shift, y_shift=_Y_SHIFT)
    wa7, la7 = jax.jit(lambda w, l: _alm_batched(
        w, *[ops7[k] for k in order7], l, **kw7))(u07, lam07)
    wb7, lb7 = jax.jit(lambda w, l: alm_fused_words(
        w, *[ops7[k] for k in order7], l, block=128, interpret=False,
        **kw7))(u07, lam07)
    check("fused ALM kernel == XLA inner",
          bool(jnp.all(wa7 == wb7)) and bool(jnp.all(la7 == lb7)))

    # shared-operand (LTI) fused ALM vs the XLA ConstrainedPGD loop
    from pint_tpu.mpc import (condense_double_integrator, constrain_states,
                              quantize_constrained)
    from pint_tpu.mpc.constrained import ConstrainedPGD

    T8, dt8 = 12, 1.0 / 32.0
    qp8 = condense_double_integrator(T=T8, dt=dt8, q_pos=4.0)
    A8 = np.array([[1.0, dt8], [0.0, 1.0]])
    B8 = np.array([[0.5 * dt8 * dt8], [dt8]])
    sc8 = constrain_states(
        qp8, np.broadcast_to(A8, (T8, 2, 2)),
        np.broadcast_to(B8, (T8, 2, 1)), None,
        F=[[0.0, 1.0]], lo=-0.25, hi=0.25)
    qc8 = quantize_constrained(sc8, rho=50.0)
    s8x = ConstrainedPGD(qc8, outer=3, inners=8, fused=False)
    s8f = ConstrainedPGD(qc8, outer=3, inners=8, fused=True,
                         block_rows=128)
    x08 = np.stack([np.linspace(-1.0, 1.0, 64),
                    np.linspace(-0.2, 0.2, 64)], axis=-1)
    g8 = jnp.asarray(s8x._q.g_lane_fixed(x08))
    co8 = jnp.asarray(qc8.c_off_pre(x08))
    u08 = s8x.init_words(64)
    wx8, lx8 = jax.jit(s8x.solve_words)(u08, g8, co8)
    wf8, lf8 = jax.jit(s8f.solve_words)(u08, g8, co8)
    check("fused shared-ALM kernel == XLA loop",
          bool(jnp.all(wx8 == wf8)) and bool(jnp.all(lx8 == lf8)))

    # 8. lipq/pen condensation kernels (mpc/condense_fused.py), natively
    # compiled: quantization must be elementwise-exact given the
    # kernel's own scales, and with lipq the FULL fused-vs-XLA solves
    # must be bit-identical (the round-4 determinism contract,
    # EXP_R4.json)
    from pint_tpu.mpc.condense_fused import lipq_fused

    Ht9, _ = jax.jit(d7._condense_ht)(x07, lanes7)
    hqt9, lip9, hmax9 = jax.jit(lambda H: lipq_fused(
        H, power_iters=d7.power_iters, block=128, interpret=False))(Ht9)
    exp9 = jnp.clip(
        jnp.round(Ht9 * (127.0 / hmax9)[None, None, :]),
        -127, 127).astype(jnp.int8)
    check("lipq kernel int8 quantization exact",
          bool(jnp.all(hqt9 == exp9)))
    d9f = DeviceSQP(horizon=8, sqp_iters=2, pgd_iters=6,
                    x_ref=np.array([1.0, 0.0, 0.0]),
                    lipq=True, fused=True)
    d9x = DeviceSQP(horizon=8, sqp_iters=2, pgd_iters=6,
                    x_ref=np.array([1.0, 0.0, 0.0]),
                    lipq=True, fused=False)
    w9f = d9f.solve_words(u07, x07)
    w9x = d9x.solve_words(u07, x07)
    check("lipq full solve: fused == XLA inner",
          bool(jnp.all(w9f == w9x)))
    dc9f = DeviceConstrainedSQP(
        d7, F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0,
        alm_outer=2, lipq=True, fused=True)
    dc9x = DeviceConstrainedSQP(
        d7, F=[[0.0, 1.0, 0.0]], lo=-0.03, hi=0.03, rho=100.0,
        alm_outer=2, lipq=True, fused=False)
    cw9f, cl9f = dc9f.solve_words(u07, x07)
    cw9x, cl9x = dc9x.solve_words(u07, x07)
    check("constrained lipq full solve: fused == XLA inner",
          bool(jnp.all(cw9f == cw9x)) and bool(jnp.all(cl9f == cl9x)))

    # per-iteration matvec kernel (the tp column path's fused form) vs
    # the int32 einsum, natively compiled: wrap-exact, must be bitwise
    from pint_tpu.mpc.fused_alm import pgd_matvec_cols

    K10 = 8
    hqt10 = hqt9[:K10]                                 # (K, Tm, B)
    lanes10 = jnp.asarray(rng7.integers(
        -127, 128, (B7, K10), dtype=np.int32))
    got10 = jax.jit(lambda l, h: pgd_matvec_cols(
        l, h, block=128, interpret=False))(lanes10, hqt10)
    exp10 = jnp.einsum(
        "bk,kjb->bj", lanes10, hqt10.astype(jnp.int32))
    check("tp matvec kernel == int32 einsum",
          bool(jnp.all(got10 == exp10)))

    # third model family natively: the PlanarQuadrotor (n=6, m=2)
    # through DeviceSQP on chip -- determinism + fused-vs-XLA full-solve
    # identity at the biggest state/multi-input geometry in the zoo
    from pint_tpu.models.quadrotor import PlanarQuadrotor

    qkw = dict(model=PlanarQuadrotor(), horizon=8, sqp_iters=2,
               pgd_iters=6, Q=np.diag([4.0, 4.0, 1.0, 0.2, 0.2, 0.1]),
               R=np.diag([0.05, 0.05]), x_ref=np.zeros(6))
    rng11 = np.random.default_rng(11)
    x11 = jnp.asarray(
        rng11.normal(size=(B7, 6)).astype(np.float32) * 0.2)
    d11f = DeviceSQP(**qkw, lipq=True, fused=True)
    d11x = DeviceSQP(**qkw, lipq=True, fused=False)
    u11 = d11f.init_words(B7)
    w11a = d11f.solve_words(u11, x11)
    w11b = d11f.solve_words(u11, x11)
    w11x = d11x.solve_words(u11, x11)
    check("quadrotor device solve deterministic",
          bool(jnp.all(w11a == w11b)))
    check("quadrotor full solve: fused == XLA inner",
          bool(jnp.all(w11a == w11x)))

    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES'}")
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
