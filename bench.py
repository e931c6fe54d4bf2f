"""Per-chip roofline bench for the packed SWAR ops + MPC solves/s.

TPU-native replacement for the reference Google-Benchmark suite
(tests/pint_bench.cpp): where the reference streams 100M random uint32 pairs
through each op and reports items/s against scalar/SSE2/NEON baselines
(pint_bench.cpp:24-37, 59-95), this bench streams word tensors through the
jitted ops and reports *lane* throughput against the chip's speed of light.

Speed-of-light model: the packed elementwise ops are HBM-bound (a handful of
VPU int32 ops per word vs 12 bytes of traffic).  The calibration kernel --
raw uint32 add, the analog of the reference's ``Baseline`` fixture
(pint_bench.cpp:77-83) -- measures achievable words/s for the same traffic
pattern; speed-of-light lane rate is ``lanes_per_word x raw_words_per_s``.
``vs_baseline`` of the headline metric is measured lane rate / SOL lane rate
(target >= 0.9 per BASELINE.json).

Timing methodology: the backend is asynchronous and host round-trips cost
~30ms (see pint_tpu/utils/timing.py), so every sample chains many
executions through a data dependency inside one `fori_loop` program and
syncs once via a scalar host fetch.

Outputs ONE JSON line on stdout (driver contract); the full metric table is
written to BENCH_full.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pint_tpu import PackedLayout
from pint_tpu.ops import word as W
from pint_tpu.utils.timing import fetch_overhead, time_chained

N_WORDS = 1 << 24  # 16Mi words, 64 MiB per operand
INNER = 1024       # chained executions per sample: total >=300ms so the
                   # ~30ms sync round-trip (with +-10ms jitter) stays <10%


def _rand_words(layout: PackedLayout, n: int, seed: int):
    rng = np.random.default_rng(seed)
    w = rng.integers(0, 1 << layout.word_bits, size=n, dtype=np.uint64)
    return jnp.asarray((w & np.uint64(layout.used_mask)).astype(layout.word_dtype))


def bench_raw_add(n: int, overhead: float) -> float:
    """Calibration: raw uint32 elementwise add, words/s."""
    a = jnp.arange(n, dtype=jnp.uint32)
    b = a | jnp.uint32(1)
    sec = time_chained(
        lambda x, y: x + y, a, b, inner=INNER, overhead=overhead
    )
    return n / sec


def bench_packed_op(layout, opname, n, overhead):
    """(words/s, lane ops/s) of a jitted packed op."""
    a = _rand_words(layout, n, 0)
    b = _rand_words(layout, n, 1)
    formula = getattr(W, opname)
    sec = time_chained(
        lambda x, y: formula(layout, x, y), a, b, inner=INNER,
        overhead=overhead,
    )
    wps = n / sec
    return wps, wps * layout.num_lanes


def bench_pack_unpack(layout, n, overhead):
    """words/s for an unpack->pack roundtrip."""
    v = _rand_words(layout, n, 2)
    sec = time_chained(
        lambda x: W.pack(layout, W.unpack(layout, x)),
        v,
        inner=INNER,
        overhead=overhead,
    )
    return n / sec


def bench_mpc(overhead, batch=8192, horizon=50, iters=40):
    """Quantized MPC solves/s, single chip (BASELINE.json headline #2).

    Returns (word-space solves/s, fused-Pallas solves/s); the fused kernel
    keeps the 40-iteration loop VMEM-resident and is verified bit-identical
    before timing.
    """
    from pint_tpu.mpc import (
        FixedPointPGD,
        FusedPGD,
        condense_double_integrator,
        quantize,
    )

    qp = condense_double_integrator(T=horizon)
    qqp = quantize(qp)
    solver = FixedPointPGD(qqp, iters=iters)
    rng = np.random.default_rng(0)
    x0 = np.stack(
        [rng.uniform(-3, 3, batch), rng.uniform(-1, 1, batch)], axis=-1
    )
    g = jnp.asarray(qqp.g_lane_fixed(x0))
    u0 = solver.init_words(batch)
    sec_word = time_chained(
        solver.solve_words, u0, g, inner=256, reps=3, overhead=overhead
    )

    fused = FusedPGD(qqp, iters=iters, block_rows=2048, interpret=False)
    w1 = jax.jit(solver.solve_words)(u0, g)
    w2 = fused.solve_words(u0, g)
    assert bool(jnp.all(w1 == w2)), "fused solver diverged from reference"
    sec_fused = time_chained(
        fused.solve_words, u0, g, inner=256, reps=3, overhead=overhead
    )

    # equal-accuracy accelerated config: Nesterov momentum reaches the
    # 40-iter PGD cost in ~20 iterations (tests/test_accelerated.py)
    accel = FusedPGD(
        qqp, iters=20, momentum=True, block_rows=2048, interpret=False
    )
    from pint_tpu.mpc.accelerated import AcceleratedPGD

    w3 = accel.solve_words(u0, g)
    w3_ref = jax.jit(AcceleratedPGD(qqp, iters=20).solve_words)(u0, g)
    assert bool(jnp.all(w3 == w3_ref)), "fused momentum diverged"
    sec_accel = time_chained(
        accel.solve_words, u0, g, inner=256, reps=3, overhead=overhead
    )
    return batch / sec_word, batch / sec_fused, batch / sec_accel


def bench_device_sqp(overhead, batch=4096):
    """On-device nonlinear SQP solves/s: the full linearize/condense/
    quantize/PGD loop as one XLA program (mpc.device_sqp.DeviceSQP),
    unicycle goal-reaching, T=32, 4 SQP x 30 PGD iterations."""
    from pint_tpu.mpc import DeviceSQP

    dev = DeviceSQP(
        horizon=32, sqp_iters=4, pgd_iters=30,
        Q=np.diag([1.0, 1.0, 0.005]), R=np.diag([0.005, 0.005]),
        qf_scale=60.0, x_ref=np.array([0.2, 0.1, 0.0]),
    )
    rng = np.random.default_rng(0)
    x0 = np.stack(
        [
            rng.uniform(-0.2, 0.2, batch),
            rng.uniform(-0.2, 0.2, batch),
            rng.uniform(0, 1, batch),
        ],
        axis=-1,
    ).astype(np.float32)
    x0j = jnp.asarray(x0)
    u0 = dev.init_words(batch)
    sec = time_chained(
        lambda w, x: dev._solve_jit(w, x), u0, x0j,
        inner=32, reps=3, overhead=overhead,
    )
    return batch / sec


def bench_constrained(overhead, batch=4096, horizon=50):
    """State-constrained ALM solves/s: velocity-limited double integrator,
    12 outer multiplier updates x 60 error-feedback PGD inners as one
    integer XLA program (mpc.constrained.ConstrainedPGD)."""
    from pint_tpu.mpc import (
        ConstrainedPGD,
        condense_double_integrator,
        constrain_states,
        quantize_constrained,
    )

    dt = 1.0 / 32.0
    qp = condense_double_integrator(T=horizon, dt=dt, q_pos=4.0)
    A = np.array([[1.0, dt], [0.0, 1.0]])
    Bm = np.array([[0.5 * dt * dt], [dt]])
    sc = constrain_states(
        qp,
        np.broadcast_to(A, (horizon, 2, 2)),
        np.broadcast_to(Bm, (horizon, 2, 1)),
        None,
        F=[[0.0, 1.0]],
        lo=-0.25,
        hi=0.25,
    )
    solver = ConstrainedPGD(quantize_constrained(sc, rho=50.0), outer=12, inners=60)
    rng = np.random.default_rng(0)
    x0 = np.stack(
        [rng.uniform(-1.5, 1.5, batch), rng.uniform(-0.2, 0.2, batch)],
        axis=-1,
    )
    g = jnp.asarray(solver._q.g_lane_fixed(x0))
    co = jnp.asarray(solver.qcqp.c_off_pre(x0))
    fn = jax.jit(lambda w: solver.solve_words(w, g, co)[0])
    sec = time_chained(fn, solver.init_words(batch), inner=16, reps=3,
                       overhead=overhead)
    return batch / sec


def bench_vpu_ops(overhead, n: int = 1 << 20, ops_per_pass: int = 64) -> float:
    """Sustained VPU int32 whole-word ops/s: a long fused chain of
    shift/xor/add on a small (VMEM-resident-per-tile) array, so HBM traffic
    per op is negligible.  Feeds roofline_report's vpu_ops_per_s."""
    x0 = jnp.arange(n, dtype=jnp.uint32)
    c1 = jnp.uint32(0x9E3779B9)

    def step(x):
        for _ in range(ops_per_pass // 4):
            x = x ^ (x << jnp.uint32(1))
            x = x + c1
            x = x ^ (x >> jnp.uint32(3))
            x = x | jnp.uint32(1)
        return x

    sec = time_chained(step, x0, inner=INNER, overhead=overhead)
    return n * ops_per_pass / sec


def bench_width_sweep(overhead) -> dict:
    """Saturating-add lane throughput over a lane-width sweep
    (BASELINE.json config: "pack/unpack + saturating-add throughput sweep
    over lane widths")."""
    out = {}
    sweep = [
        PackedLayout(*([w] * (32 // w))) for w in (1, 2, 4, 8, 16)
    ] + [
        PackedLayout(1, 2, 3, 4, 5, 6, 11),
        PackedLayout(1, 3, 5, 11),          # pint_bench AddSatU1 config
        PackedLayout(11, 11, 10),
    ]
    for lay in sweep:
        wps, lps = bench_packed_op(
            lay, "add_unsigned_saturate", N_WORDS, overhead
        )
        out[f"addsat_u_{'x'.join(map(str, lay.widths))}"] = {
            "Gwords_per_s": wps / 1e9,
            "Glanes_per_s": lps / 1e9,
        }
    return out


def bench_u64_family(overhead, n: int = N_WORDS // 2) -> dict:
    """u64 word throughput, three ways (the reference's uint64 8x8 config,
    pint_bench.cpp:468-485):

    * ``xla_emulated``: uint64 arrays through the word.py formulas (XLA
      expands each 64-bit op into 32-bit pairs internally; needs x64),
    * ``xla_split``: the SplitWord half-pair evaluation of the same
      formulas, jitted as plain XLA on u32 arrays (no x64 anywhere),
    * ``pallas_split``: the split kernel via the pair-word entry.

    Returns G lane-ops/s for add_unsigned_saturate on <8 x 8x8>.
    x64 is flipped on only inside the emulated measurement and restored.
    """
    from pint_tpu.ops import pallas as P
    from pint_tpu.ops import split64 as S

    lay = PackedLayout(*([8] * 8))
    rng = np.random.default_rng(7)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    hi = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    ap = jnp.asarray(np.stack([lo, hi], axis=0))      # planar (2, n)
    bp = jnp.asarray(np.stack([hi ^ lo, lo | np.uint32(1)], axis=0))
    out = {}
    view = S.SplitView(lay)

    def xla_split(x, y):
        r = W.add_unsigned_saturate(
            view,
            S.SplitWord(x[0], x[1]),
            S.SplitWord(y[0], y[1]),
        )
        return jnp.stack([r.lo, r.hi], axis=0)

    sec = time_chained(xla_split, ap, bp, inner=INNER, overhead=overhead)
    out["addsat_u8x8_u64_xla_split_Glanes_per_s"] = n * 8 / sec / 1e9

    pallas_fn = P.binop_pair(lay, "add_unsigned_saturate", interpret=False)
    sec = time_chained(pallas_fn, ap, bp, inner=INNER, overhead=overhead)
    out["addsat_u8x8_u64_pallas_split_Glanes_per_s"] = n * 8 / sec / 1e9

    try:
        jax.config.update("jax_enable_x64", True)
        a64 = jnp.asarray(
            lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
        )
        b64 = jnp.asarray(
            (hi ^ lo).astype(np.uint64)
            | ((lo | np.uint32(1)).astype(np.uint64) << np.uint64(32))
        )
        sec = time_chained(
            lambda x, y: W.add_unsigned_saturate(lay, x, y),
            a64, b64, inner=INNER, overhead=overhead,
        )
        out["addsat_u8x8_u64_xla_emulated_Glanes_per_s"] = n * 8 / sec / 1e9
    finally:
        jax.config.update("jax_enable_x64", False)
    return out


def bench_unpacked_comparator(overhead, n_items: int):
    """The reference-bench-style comparator: per-field processing without
    SWAR (the TPU analog of the 'bitfield union + clamp' baselines,
    pint_bench.cpp:117-151, 274-369).

    The 7 heterogeneous fields <1,2,3,4,5,6,11> are held as an (N, 8) int8
    tensor (one byte per field, padded to 8 -- the narrowest native dtype
    that fits each field); saturating add is the naive widen-add-clip-
    narrow.  Returns lane-ops/s.  SWAR packs the same 7 fields in 4 bytes,
    so at equal HBM bandwidth the packed path moves 2x fewer bytes.
    """
    widths = (1, 2, 3, 4, 5, 6, 11, 8)  # 8th char column pads to a lane tile
    maxv = np.array([(1 << w) - 1 for w in widths[:7]] + [127], np.int16)
    rng = np.random.default_rng(3)
    a = jnp.asarray(
        rng.integers(0, 128, size=(n_items, 8), dtype=np.int8)
    )
    b = jnp.asarray(
        rng.integers(0, 128, size=(n_items, 8), dtype=np.int8)
    )
    cap = jnp.asarray(maxv)

    def step(x, y):
        wide = x.astype(jnp.int16) + y.astype(jnp.int16)
        return jnp.minimum(wide, cap).astype(jnp.int8)

    sec = time_chained(step, a, b, inner=INNER, overhead=overhead)
    return n_items * 7 / sec


def bench_rollouts(overhead, batch=8192, horizon=52):
    """Quantized double-integrator rollouts/s from packed int8 controls
    (BASELINE.json config: 8192 rollouts, H=50; padded to 52 for 4-lane
    words)."""
    from pint_tpu.models import DoubleIntegrator, pack_controls

    model = DoubleIntegrator()
    rng = np.random.default_rng(0)
    lanes = jnp.asarray(
        rng.integers(-128, 128, (batch, horizon), dtype=np.int32)
    )
    words = pack_controls(lanes)

    def step(state0, w):
        states = model.rollout_packed(state0, w)
        # depend on the whole trajectory so it cannot be elided
        return states[..., -1, :] + (jnp.sum(states, axis=-2) & 1)

    # the rollout step is ~25 us; inner=2048 keeps total compute well above
    # the ~33ms sync jitter (inner=256 produced nonsense rates)
    sec = time_chained(
        step,
        jnp.zeros((batch, 2), jnp.int32),
        words,
        inner=2048,
        reps=3,
        overhead=overhead,
    )
    return batch / sec


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: remote compiles through the tunnel cost
    minutes per program, and the bench programs are identical across runs."""
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main() -> None:
    import sys

    _enable_compile_cache()
    results = {}
    overhead = fetch_overhead()
    results["sync_overhead_ms"] = overhead * 1e3

    if "--sweep" in sys.argv:
        results["width_sweep"] = bench_width_sweep(overhead)
        results["vpu_int32_Tops_per_s"] = bench_vpu_ops(overhead) / 1e12
        try:
            results["u64_family"] = bench_u64_family(overhead)
        except Exception as e:
            results["u64_family_error"] = repr(e)

        # unicycle rollouts (fixed-point trig path)
        from pint_tpu.models import Unicycle, pack_controls

        uni = Unicycle()
        rng = np.random.default_rng(1)
        batch, horizon = 8192, 50
        ctrl = jnp.asarray(
            rng.integers(-128, 128, (batch, 2 * horizon), dtype=np.int32)
        )
        words = pack_controls(ctrl)

        def uni_step(state0, w):
            states = uni.rollout_packed(state0, w)
            return states[..., -1, :] + (jnp.sum(states, axis=-2) & 1)

        # the ~35ms sync overhead dwarfs a short chain; 1024 iterations of
        # the ~30us rollout keep the timed region ~30x the overhead
        sec = time_chained(
            uni_step,
            jnp.zeros((batch, 3), jnp.int32),
            words,
            inner=1024,
            reps=3,
            overhead=overhead,
        )
        results["unicycle_rollouts_per_s_b8192_h50"] = batch / sec
        with open("BENCH_sweep.json", "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps({"metric": "width_sweep", "value": 1, "unit": "done",
                          "vs_baseline": 1}))
        return

    # headline: the reference's flagship saturating config <8,8,8,8>
    # (pint_bench.cpp:456-467, compared there against SSE2 _mm_adds_epu8).
    # The raw-add calibration brackets the packed measurement (before and
    # after) so clock/thermal drift cancels out of the ratio.
    lay8888 = PackedLayout(8, 8, 8, 8)
    raw_wps_1 = bench_raw_add(N_WORDS, overhead)
    wps, lps = bench_packed_op(
        lay8888, "add_unsigned_saturate", N_WORDS, overhead
    )
    raw_wps_2 = bench_raw_add(N_WORDS, overhead)
    raw_wps = 0.5 * (raw_wps_1 + raw_wps_2)
    results["baseline_raw_u32_add_Gwords_per_s"] = raw_wps / 1e9
    results["addsat_u8x4_Gwords_per_s"] = wps / 1e9
    results["addsat_u8x4_Glanes_per_s"] = lps / 1e9
    sol_lanes = raw_wps * lay8888.num_lanes
    vs_sol = lps / sol_lanes
    results["addsat_u8x4_vs_speed_of_light"] = vs_sol

    # reference's heterogeneous 7-lane config: AddWrap/SubWrap/AddSatU2/
    # AddSatS2 families (pint_bench.cpp:85-151, 224-270, 274-369, 586-632)
    lay_het = PackedLayout(1, 2, 3, 4, 5, 6, 11)
    for op in (
        "add_wrap",
        "sub_wrap",
        "add_unsigned_saturate",
        "add_signed_saturate",
    ):
        _, lps_h = bench_packed_op(lay_het, op, N_WORDS, overhead)
        results[f"{op}_het7_Glanes_per_s"] = lps_h / 1e9
    _, lps_s = bench_packed_op(lay8888, "add_signed_saturate", N_WORDS, overhead)
    results["addsat_s8x4_Glanes_per_s"] = lps_s / 1e9

    results["pack_unpack_roundtrip_u8x4_Gwords_per_s"] = (
        bench_pack_unpack(lay8888, N_WORDS // 2, overhead) / 1e9
    )

    # per-field no-SWAR comparator for the hetero config (the reference's
    # bitfield-union baseline, pint_bench.cpp:274-369): same logical lanes,
    # one int8 byte per field
    try:
        unpacked_lps = bench_unpacked_comparator(overhead, N_WORDS)
        results["addsat_u_het7_unpacked_int8_Glanes_per_s"] = unpacked_lps / 1e9
        results["addsat_u_het7_swar_speedup_vs_unpacked"] = (
            results["add_unsigned_saturate_het7_Glanes_per_s"]
            / (unpacked_lps / 1e9)
        )
    except Exception as e:
        results["unpacked_comparator_error"] = repr(e)

    try:
        results["rollouts_per_s_b8192_h52"] = bench_rollouts(overhead)
    except Exception as e:
        results["rollout_error"] = repr(e)

    try:
        results["mpc_device_sqp_solves_per_s_b4096_T32_i4x30"] = (
            bench_device_sqp(overhead)
        )
    except Exception as e:
        results["device_sqp_error"] = repr(e)

    try:
        word_rate, fused_rate, accel_rate = bench_mpc(overhead)
        results["mpc_solves_per_s_b8192_h50_i40"] = word_rate
        results["mpc_fused_solves_per_s_b8192_h50_i40"] = fused_rate
        results["mpc_fused_momentum_solves_per_s_b8192_h50_i20"] = accel_rate
    except Exception as e:  # keep the headline metric robust
        results["mpc_error"] = repr(e)

    results["device"] = str(jax.devices()[0])
    with open("BENCH_full.json", "w") as f:
        json.dump(results, f, indent=2)
    print(
        json.dumps(
            {
                "metric": "addsat_u8x4_lane_throughput",
                "value": round(results["addsat_u8x4_Glanes_per_s"], 3),
                "unit": "Glanes/s",
                "vs_baseline": round(vs_sol, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
