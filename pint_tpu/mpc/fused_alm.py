"""Fused Pallas ALM inner: the whole constrained integer loop in VMEM.

Phase attribution (BASELINE.md, bench.py --sqp) shows the integer ALM
inner is 75.6% of a DeviceConstrainedSQP outer, and that it is bound by
re-streaming the per-problem int8 operands from HBM every iteration
(Hq 16.8 MB + Sq twice ~= 50 MB x 90 iterations per outer at the
headline config) -- NOT by matmul dispatch count (the row-concatenated
[Hq; Sq] forward fusion measured +2%, exp_constrained_phases.py).

This kernel removes that traffic: grid over batch blocks, each block's
per-problem operands (Hq, two transposed Sq copies, planes, rationals)
are loaded into VMEM ONCE and all ``alm_outer x inners`` iterations run
resident.  Layout is batch-last (docs/DESIGN.md section 8: the two large
dims -- contraction index and batch -- stay trailing, so (8,128)/(32,128)
tiles are filled by real data), and the per-problem matvecs are unrolled
broadcast-FMA loops over the small static horizon/row dims; Mosaic has
no batched dot_general and tiny per-problem MXU matmuls lose 5-34x
(DESIGN section 8, ROADMAP allpairs note).

Exactness: integer adds are associative and int32 wrap/shift semantics
match XLA's, so every accumulator equals :func:`pint_tpu.mpc.
sqp_constrained._alm_batched`'s int8-dot accumulator bit for bit; the
packed-word saturating update collapses to a lane-space clip exactly as
in :class:`pint_tpu.mpc.fused.FusedPGD` (max_signed(add_signed_saturate
(u, d), -127) == clip(u + d, -127, 127) for in-range lanes).  Words
pack/unpack once per call on the XLA side (Mosaic miscompiles the
16-lane interleave shuffles -- see FusedPGD.packed_io).  Bit-identity to
``_alm_batched`` is asserted in tests/test_fused_alm.py and on device.

Packed-word machinery exercised per call: pack/unpack (pint.hpp:390-407,
799-822); the in-kernel update is the exact lane-space image of
add_signed_saturate (pint.hpp:857-866) + max_signed (pint.hpp:987-1004).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pint_tpu.models.dynamics import pack_controls, unpack_controls
from pint_tpu.mpc.constrained import _LAM_CAP, _Y_BITS

Array = jax.Array

__all__ = ["alm_fused_words", "alm_fused_words_pre", "alm_viable",
           "alm_shared_fused_words", "matvec_viable", "matvec_wins",
           "on_tpu_backend", "pgd_fused_words", "pgd_fused_words_pre",
           "pgd_matvec_cols", "pgd_viable", "resolve_tp_fused"]

from pint_tpu.ops.pallas import on_tpu_backend  # noqa: E402 (re-export)

_VMEM_BUDGET = 14 * 2**20
"""Working-set size (double-buffered) under Mosaic's DEFAULT scoped-VMEM
limit.  Kernels within this budget compile with no compiler params --
the exact round-4 configuration, byte for byte."""

_VMEM_CEIL = 100 * 2**20
"""Working-set ceiling with an explicitly raised ``vmem_limit_bytes``.
The ~16 MB scoped budget is Mosaic's DEFAULT limit, not hardware: TPU
v5e has 128 MB of physical VMEM per core, and a probe kernel holding
112 MB of live VMEM blocks compiles and runs on this chip
(exp_vmem_ceiling.py).  Working sets between ``_VMEM_BUDGET`` and this
ceiling pass ``CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)``."""

_VMEM_LIMIT_BYTES = 110 * 2**20


def _vmem_kwargs(ws_bytes: int, interpret: bool) -> dict:
    """pallas_call kwargs for a working set of ``ws_bytes``: empty under
    the default scoped budget (identical compilation to round 4), a
    raised ``vmem_limit_bytes`` above it (large-horizon kernels)."""
    if interpret or ws_bytes <= _VMEM_BUDGET:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        )
    }


def _native_block(block: int, interpret: bool) -> int:
    """Round a requested batch block up to the Pallas TPU trailing-dim
    granule (128) on native paths: a sub-128 (or non-multiple) block
    would otherwise surface as an opaque Mosaic
    trailing-dim-divisibility error.  Interpret mode takes any size
    (tests and the CPU dryrun deliberately run tiny blocks)."""
    if interpret or block % 128 == 0:
        return block
    return -(-block // 128) * 128


def pgd_viable(Tp: int) -> bool:
    """True when the fused PGD kernel fits physical VMEM (raised-limit
    ceiling, see ``_VMEM_CEIL``) at the minimum native block (128 batch
    columns) for this horizon: Tp <= 632, i.e. every horizon up to
    T=316 at m=2."""
    return 2 * 128 * (Tp * Tp + 16 * Tp) <= _VMEM_CEIL


def alm_viable(Tp: int, Cp: int) -> bool:
    """True when the fused ALM kernel fits physical VMEM at the minimum
    native block."""
    return 2 * 128 * (Tp * Tp + 2 * Tp * Cp + 8 * (Tp + Cp)) <= _VMEM_CEIL


def matvec_viable(K: int, rows: int) -> bool:
    """True when the per-iteration column matvec kernel
    (:func:`pgd_matvec_cols`, K-column slab against ``rows`` output
    rows) fits physical VMEM at the minimum native block -- the tp>1
    paths' footprint, a factor ``tp`` smaller than the one-launch
    kernels'."""
    return 2 * 128 * (K * rows + 8 * (K + rows)) <= _VMEM_CEIL


_MATVEC_MIN_COLS = 16
"""Measured kernel-vs-XLA crossover for the per-iteration column matvec.

The round-5 sweep (EXP_MATVEC_SWEEP.json: K in {8..64} x Tm in
{64, 96}, 30-call chains, median of 5, bit-exact at every point) shows
the kernel winning at EVERY K >= 16 on both horizons (e.g. Tm=96 K=16:
2.8 vs 40.9 us; Tm=64 K=32: 4.3 vs 42.5 us) and only washing/losing at
K=8 (Tm=96: 12.7 vs 12.4 us), so auto-selection takes the kernel at
K >= 16 columns/rank.  Round 4's two-point EXP_MATVEC.json had the
tp=4 (K=16, Tm=64) point LOSING 11.55 vs 10.46 us -- not reproduced by
the sweep (19.3 vs 29.3 us on the same geometry); the discrepancy is
pooled-chip session variance, and the stake is perf-only: both paths
are bit-identical (D5, docs/DESIGN.md section 11), so a wrong call can
never change results.  Auto-selection uses :func:`matvec_wins`; an
explicit ``fused=True`` still forces the kernel (gated only by
viability)."""


def matvec_wins(K: int, rows: int) -> bool:
    """True when the per-iteration Pallas matvec is expected to BEAT the
    XLA batched dot at this column-slab geometry: VMEM-viable and at
    least ``_MATVEC_MIN_COLS`` columns per rank (the measured
    crossover).  The tp>1 sharded paths' auto-selection gate."""
    return matvec_viable(K, rows) and K >= _MATVEC_MIN_COLS


def resolve_tp_fused(flag, K: int, rows: int, use_lipq: bool) -> bool:
    """Resolved ``fused`` flag for the tp>1 column paths (DeviceSQP /
    DeviceConstrainedSQP ``sharded_solve_words``): an explicit flag is
    honored wherever the kernel is VMEM-viable; auto (``None``) selects
    the kernel only where it measures FASTER than the XLA dot
    (:func:`matvec_wins`) on a TPU backend AND the lipq kernel carries
    the quantization (``use_lipq`` -- the same determinism rule as the
    tp==1 ``_use_fused``: without in-kernel quantization, a program
    with per-iteration custom calls can compile the f32 condensation
    differently from the custom-call-free single-device program and
    flip int8 ties, cracking sharded == single-device).  The kernel and
    XLA matvecs themselves are bit-identical (int32 accumulation is
    wrap-exact) -- tested in
    tests/test_condense_fused.py::test_tp_matvec_crossover_gate."""
    if flag is not None:
        return flag and matvec_viable(K, rows)
    return on_tpu_backend() and use_lipq and matvec_wins(K, rows)


def _out_struct(shape, dtype, *operands):
    """ShapeDtypeStruct whose varying-mesh-axes (vma) tag is the union of
    the operands': inside ``shard_map`` (the dp-sharded production path)
    ``pallas_call`` outputs must declare how they vary across mesh axes,
    and outside it the union is the empty set, matching the default."""
    vma = frozenset()
    for o in operands:
        vma |= getattr(jax.typeof(o), "vma", frozenset()) or frozenset()
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _shared_kernel_factory(Tp, Cp, outer, inners, g_shift, y_shift,
                           hs_num, hs_den, cs_num, cs_den,
                           eh_num, eh_den, el_num, el_den):
    """Shared-operand (LTI) ALM kernel: one Hessian/constraint matrix for
    every problem, so the matvecs are real 2D MXU dots (the FusedPGD
    pattern) and all rationals are compile-time scalars."""
    half = np.int32(1 << (g_shift - 1))
    y_half = np.int32((1 << y_shift) >> 1) if y_shift else np.int32(0)
    y_cap = np.int32((1 << _Y_BITS) - 1)
    lam_cap = np.int32(_LAM_CAP)
    hs_num, hs_den = np.int32(hs_num), np.int32(hs_den)
    cs_num, cs_den = np.int32(cs_num), np.int32(cs_den)
    eh_num, eh_den = np.int32(eh_num), np.int32(eh_den)
    el_num, el_den = np.int32(el_num), np.int32(el_den)

    def kernel(lanes_ref, g_ref, coff_ref, lam_ref, hq_ref, sq_ref,
               lo_ref, hi_ref, out_lanes, out_lam):
        g = g_ref[:]                                   # (br, Tp) i32
        coff = coff_ref[:]                             # (br, Cp) i32
        hq = hq_ref[:]                                 # (Tp, Tp) i8
        sq = sq_ref[:]                                 # (Cp, Tp) i8
        lo, hi = lo_ref[:], hi_ref[:]                  # (1, Cp) i32

        def c_pre_of(lanes):
            acc = jax.lax.dot_general(
                lanes.astype(jnp.int8), sq,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                          # (br, Cp)
            return (acc * cs_num) >> cs_den

        def inner(_, st):
            lanes, carry, ey, lam = st
            acc = jax.lax.dot_general(
                lanes.astype(jnp.int8), hq,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            pre = (acc * hs_num) >> hs_den
            t = c_pre_of(lanes) + coff + lam
            y = t - jnp.clip(t, lo, hi) + ey
            y14 = jnp.clip((y + y_half) >> np.int32(y_shift), -y_cap, y_cap)
            ey = y - (y14 << np.int32(y_shift))
            y_hi = y14 >> np.int32(7)
            y_lo = y14 - (y_hi << np.int32(7))
            acc_h = jax.lax.dot_general(
                y_hi.astype(jnp.int8), sq,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc_l = jax.lax.dot_general(
                y_lo.astype(jnp.int8), sq,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            extra = ((acc_h * eh_num) >> eh_den) + (
                (acc_l * el_num) >> el_den)
            step = -(pre + g + extra) + carry
            delta = jnp.clip((step + half) >> np.int32(g_shift), -128, 127)
            carry = step - (delta << np.int32(g_shift))
            lanes = jnp.clip(lanes + delta, -127, 127)
            return lanes, carry, ey, lam

        def outer_body(_, st):
            lanes, carry, ey, lam = st
            lanes, carry, ey, lam = jax.lax.fori_loop(
                0, inners, inner, (lanes, carry, ey, lam)
            )
            t = c_pre_of(lanes) + coff + lam
            lam = jnp.clip(t - jnp.clip(t, lo, hi), -lam_cap, lam_cap)
            return lanes, carry, ey, lam

        st = (lanes_ref[:], jnp.zeros_like(g), jnp.zeros_like(coff),
              lam_ref[:])
        lanes, _, _, lam = jax.lax.fori_loop(0, outer, outer_body, st)
        out_lanes[:] = lanes
        out_lam[:] = lam

    return kernel


def alm_shared_fused_words(
    u_words: Array,   # (B, Tp/4) uint32
    g_pre: Array,     # (B, Tp) int32
    c_off: Array,     # (B, Cp) int32
    lam0: Array,      # (B, Cp) int32
    *,
    Hq: np.ndarray,   # (Tp, Tp) int8, shared
    Sq: np.ndarray,   # (Cp, Tp) int8, shared
    lo_pre: np.ndarray,
    hi_pre: np.ndarray,
    hs_num: int, hs_den: int,
    cs_num: int, cs_den: int,
    eh_num: int, eh_den: int,
    el_num: int, el_den: int,
    outer: int,
    inners: int,
    g_shift: int,
    y_shift: int,
    block_rows: int = 1024,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """VMEM-resident ALM loop for the shared-operand (LTI) tier: the fused
    sibling of :meth:`pint_tpu.mpc.constrained.ConstrainedPGD.solve_words`
    (bit-identical words and multipliers, tests/test_fused_alm.py).  The
    shared int8 matrices are a few KB so the whole loop runs from VMEM;
    the XLA form round-trips the iterate and y-planes through HBM every
    one of its ``outer x inners`` iterations."""
    if interpret is None:
        interpret = not on_tpu_backend()
    B, Tp = g_pre.shape
    Cp = c_off.shape[1]
    # clamp the block to the 128-row-padded batch: a B=64 call must not
    # run the whole outer x inners loop on 1024 zero-padded rows
    br = min(block_rows, -(-B // 128) * 128)
    rows = -(-B // br) * br
    pad = rows - B

    lanes = unpack_controls(u_words)                   # (B, Tp) int32

    def pd(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    kern = _shared_kernel_factory(
        Tp, Cp, outer, inners, g_shift, y_shift,
        hs_num, hs_den, cs_num, cs_den, eh_num, eh_den, el_num, el_den)

    def bspec(cols):
        return pl.BlockSpec(
            (br, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    with jax.enable_x64(False):
        out_lanes, out_lam = pl.pallas_call(
            kern,
            out_shape=(
                _out_struct((rows, Tp), jnp.int32, lanes, g_pre, lam0),
                _out_struct((rows, Cp), jnp.int32, lanes, g_pre, lam0),
            ),
            grid=(rows // br,),
            in_specs=[
                bspec(Tp), bspec(Tp), bspec(Cp), bspec(Cp),
                shared((Tp, Tp)), shared((Cp, Tp)),
                shared((1, Cp)), shared((1, Cp)),
            ],
            out_specs=(bspec(Tp), bspec(Cp)),
            interpret=interpret,
        )(
            pd(lanes), pd(g_pre), pd(c_off), pd(lam0),
            jnp.asarray(Hq), jnp.asarray(Sq),
            jnp.asarray(lo_pre, jnp.int32).reshape(1, -1),
            jnp.asarray(hi_pre, jnp.int32).reshape(1, -1),
        )
    return pack_controls(out_lanes[:B]), out_lam[:B]


def _kernel_factory(Tp, Cp, outer, inners, g_shift, y_shift):
    half = np.int32(1 << (g_shift - 1))
    y_half = np.int32((1 << y_shift) >> 1) if y_shift else np.int32(0)
    y_cap = np.int32((1 << _Y_BITS) - 1)
    lam_cap = np.int32(_LAM_CAP)

    def kernel(lanes_ref, g_ref, hqt_ref, sqj_ref, sqc_ref, coff_ref,
               lo_ref, hi_ref, lam_ref, sc_ref, out_lanes, out_lam):
        g = g_ref[:]                                   # (Tp, Bb) i32
        coff = coff_ref[:]                             # (Cp, Bb) i32
        lo, hi = lo_ref[:], hi_ref[:]
        hs_num, hs_den = sc_ref[0:1], sc_ref[1:2]      # (1, Bb) i32
        cs_num, cs_den = sc_ref[2:3], sc_ref[3:4]
        eh_num, eh_den = sc_ref[4:5], sc_ref[5:6]
        el_num, el_den = sc_ref[6:7], sc_ref[7:8]

        def c_pre_of(lanes):
            # c_acc[c,b] = sum_j Sq[b,c,j] lanes[j,b] via sqj (j,c,b)
            acc = jnp.zeros_like(coff)
            for j in range(Tp):
                acc = acc + sqj_ref[j].astype(jnp.int32) * lanes[j:j + 1]
            return (acc * cs_num) >> cs_den

        def inner(_, st):
            lanes, carry, ey, lam = st
            acc = jnp.zeros_like(g)
            for k in range(Tp):
                # pre_acc[j,b] += HqT[k,j,b] * lanes[k,b]
                acc = acc + hqt_ref[k].astype(jnp.int32) * lanes[k:k + 1]
            pre = (acc * hs_num) >> hs_den
            t = c_pre_of(lanes) + coff + lam
            y = t - jnp.clip(t, lo, hi) + ey
            y14 = jnp.clip((y + y_half) >> np.int32(y_shift), -y_cap, y_cap)
            ey = y - (y14 << np.int32(y_shift))
            y_hi = y14 >> np.int32(7)
            y_lo = y14 - (y_hi << np.int32(7))
            eh = jnp.zeros_like(g)
            el = jnp.zeros_like(g)
            for c in range(Cp):
                row = sqc_ref[c].astype(jnp.int32)     # (Tp, Bb)
                eh = eh + row * y_hi[c:c + 1]
                el = el + row * y_lo[c:c + 1]
            extra = ((eh * eh_num) >> eh_den) + ((el * el_num) >> el_den)
            step = -(pre + g + extra) + carry
            delta = jnp.clip((step + half) >> np.int32(g_shift), -128, 127)
            carry = step - (delta << np.int32(g_shift))
            lanes = jnp.clip(lanes + delta, -127, 127)
            return lanes, carry, ey, lam

        def outer_body(_, st):
            lanes, carry, ey, lam = st
            lanes, carry, ey, lam = jax.lax.fori_loop(
                0, inners, inner, (lanes, carry, ey, lam)
            )
            t = c_pre_of(lanes) + coff + lam
            lam = jnp.clip(t - jnp.clip(t, lo, hi), -lam_cap, lam_cap)
            return lanes, carry, ey, lam

        lanes0 = lanes_ref[:]
        st = (lanes0, jnp.zeros_like(g), jnp.zeros_like(coff), lam_ref[:])
        lanes, _, _, lam = jax.lax.fori_loop(0, outer, outer_body, st)
        out_lanes[:] = lanes
        out_lam[:] = lam

    return kernel


def _pgd_kernel_factory(Tp, iters, g_shift):
    half = np.int32(1 << (g_shift - 1))

    def kernel(lanes_ref, g_ref, hqt_ref, sc_ref, out_lanes):
        g = g_ref[:]                                   # (Tp, Bb) i32
        hs_num, hs_den = sc_ref[0:1], sc_ref[1:2]      # (1, Bb) i32

        def body(_, st):
            lanes, carry = st
            acc = jnp.zeros_like(g)
            for k in range(Tp):
                acc = acc + hqt_ref[k].astype(jnp.int32) * lanes[k:k + 1]
            pre = (acc * hs_num) >> hs_den
            step = -(pre + g) + carry
            delta = jnp.clip((step + half) >> np.int32(g_shift), -128, 127)
            carry = step - (delta << np.int32(g_shift))
            lanes = jnp.clip(lanes + delta, -127, 127)
            return lanes, carry

        lanes, _ = jax.lax.fori_loop(
            0, iters, body, (lanes_ref[:], jnp.zeros_like(g))
        )
        out_lanes[:] = lanes

    return kernel


def _matvec_kernel_factory(K: int, Tm: int):
    def kernel(lanes_ref, hqt_ref, out_ref):
        # out[j, b] = sum_k hqt[k, j, b] * lanes[k, b], k over this
        # rank's column block
        acc = hqt_ref[0].astype(jnp.int32) * lanes_ref[0:1]
        for k in range(1, K):
            acc = acc + hqt_ref[k].astype(jnp.int32) * lanes_ref[k : k + 1]
        out_ref[:] = acc

    return kernel


def pgd_matvec_cols(
    lanes_r: Array,   # (B, K) int32: this rank's iterate columns
    hqt_r: Array,     # (K, Tm, B) int8: this rank's k-slice of hqt
    *,
    block: int = 256,
    interpret: Optional[bool] = None,
) -> Array:
    """One Pallas matvec for the tp column path: this rank's columns'
    contribution to the FULL int32 gradient, ``partial[b, j] = sum_{k in
    cols_r} H[j, k] u[k]`` (``hqt[k, j] = Hq[j, k]``).  Launched once
    per inner iteration with an exact int32 psum between launches --
    the tp-compatible fused shape (SCALING.md round-4 note: relaunching
    a kernel per iteration still beats the XLA inner 3.9x on chip,
    EXP_TP_FUSED.json).  Wrap-exact int32 accumulation, so the column
    solver stays bit-identical to the XLA ``_pgd_batched_h_cols``."""
    if interpret is None:
        interpret = not on_tpu_backend()
    B, K = lanes_r.shape
    Tm = hqt_r.shape[1]
    block = _native_block(block, interpret)
    block = min(block, -(-B // 128) * 128)
    while block > 128 and 2 * block * (K * Tm + 8 * (K + Tm)) > _VMEM_BUDGET:
        block -= 128
    rows = -(-B // block) * block
    pad = rows - B
    lanes_t = jnp.moveaxis(lanes_r, 0, -1)             # (K, B)
    if pad:
        lanes_t = jnp.pad(lanes_t, ((0, 0), (0, pad)))
        hqt_r = jnp.pad(hqt_r, ((0, 0), (0, 0), (0, pad)))

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (block,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    kern = _matvec_kernel_factory(K, Tm)
    ws = 2 * block * (K * Tm + 8 * (K + Tm))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=_out_struct((Tm, rows), jnp.int32, lanes_r, hqt_r),
            grid=(rows // block,),
            in_specs=[spec(K), spec(K, Tm)],
            out_specs=spec(Tm),
            interpret=interpret,
            **_vmem_kwargs(ws, interpret),
        )(lanes_t, hqt_r)
    return jnp.moveaxis(out, -1, 0)[:B]                # (B, Tm)


def _pgd_fused_core(
    lanes: Array,     # (B, Tp) int32
    g_pre: Array,     # (B, Tp) int32
    hqt: Array,       # (Tp, Tp, B) int8, kernel orientation
    hs_num: Array,    # (B,) int32
    hs_den: Array,
    *,
    iters: int,
    g_shift: int,
    block: int,
    interpret: Optional[bool],
) -> Array:
    """Shared body of :func:`pgd_fused_words` / :func:`pgd_fused_words_pre`:
    batch-last padding + the pallas_call.  Returns packed words (B, Tp/4)."""
    if interpret is None:
        interpret = not on_tpu_backend()
    B, Tp = g_pre.shape
    # batch is the trailing (128-lane) dim: clamp the block so small
    # batches don't iterate over mostly zero-padded lanes
    block = _native_block(block, interpret)
    block = min(block, -(-B // 128) * 128)
    # VMEM guard: int8 Hessian slab + int32 planes, double-buffered;
    # native blocks floor at 128 (trailing-dim divisibility) -- horizons
    # too large even then are gated by pgd_viable upstream
    while block > 128 and 2 * block * (Tp * Tp + 16 * Tp) > _VMEM_BUDGET:
        block -= 128
    rows = -(-B // block) * block
    pad = rows - B

    def bl(x):
        xt = jnp.moveaxis(x, 0, -1)
        if pad:
            xt = jnp.pad(xt, [(0, 0)] * (xt.ndim - 1) + [(0, pad)])
        return xt

    sc = jnp.stack([hs_num, hs_den], 0)                # (2, B)
    sc_t = jnp.pad(sc, ((0, 0), (0, pad))) if pad else sc
    if pad:
        hqt = jnp.pad(hqt, ((0, 0), (0, 0), (0, pad)))
    args = (bl(lanes), bl(g_pre), hqt, sc_t)

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (block,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    kern = _pgd_kernel_factory(Tp, iters, g_shift)
    ws = 2 * block * (Tp * Tp + 16 * Tp)
    with jax.enable_x64(False):
        out_lanes = pl.pallas_call(
            kern,
            out_shape=_out_struct(
                (Tp, rows), jnp.int32, lanes, g_pre, hqt, hs_num, hs_den
            ),
            grid=(rows // block,),
            in_specs=[spec(Tp), spec(Tp), spec(Tp, Tp), spec(2)],
            out_specs=spec(Tp),
            interpret=interpret,
            **_vmem_kwargs(ws, interpret),
        )(*args)
    return pack_controls(jnp.moveaxis(out_lanes, -1, 0)[:B])


def pgd_fused_words(
    u_words: Array,   # (B, Tp/4) uint32
    g_pre: Array,     # (B, Tp) int32
    Hq: Array,        # (B, Tp, Tp) int8 per-problem Hessian
    hs_num: Array,    # (B,) int32
    hs_den: Array,
    *,
    iters: int,
    g_shift: int,
    block: int = 256,
    interpret: Optional[bool] = None,
) -> Array:
    """Drop-in fused replacement for :func:`pint_tpu.mpc.ltv.
    _pgd_batched_h` (same operands and returns, bit-identical words): the
    box-only subset of :func:`alm_fused_words` for DeviceSQP's PGD inner,
    which re-streams the per-problem int8 Hessian from HBM every
    iteration in the XLA form (BASELINE.md phase attribution: within 2.4x
    of its streaming floor, bound by the whole-iteration chain)."""
    lanes = unpack_controls(u_words)                   # (B, Tp) int32
    hqt = jnp.moveaxis(jnp.transpose(Hq, (0, 2, 1)), 0, -1)  # (k, j, B)
    return _pgd_fused_core(
        lanes, g_pre, hqt, hs_num, hs_den,
        iters=iters, g_shift=g_shift, block=block, interpret=interpret,
    )


def pgd_fused_words_pre(
    u_words: Array,   # (B, Tp/4) uint32
    g_pre: Array,     # (B, Tp) int32
    hqt: Array,       # (Tp, Tp, B) int8, already in kernel orientation
    hs_num: Array,    # (B,) int32
    hs_den: Array,
    *,
    iters: int,
    g_shift: int,
    block: int = 256,
    interpret: Optional[bool] = None,
) -> Array:
    """:func:`pgd_fused_words` with the Hessian already batch-last in the
    kernel orientation ``hqt[k, j, b] = Hq[b, j, k]`` -- the layout
    :func:`pint_tpu.mpc.condense_fused.lipq_fused` emits -- skipping the
    two 16 MB int8 transposes of the batch-first route."""
    lanes = unpack_controls(u_words)                   # (B, Tp) int32
    return _pgd_fused_core(
        lanes, g_pre, hqt, hs_num, hs_den,
        iters=iters, g_shift=g_shift, block=block, interpret=interpret,
    )


def _alm_fused_core(
    lanes: Array,     # (B, Tp) int32
    g_pre: Array,     # (B, Tp) int32
    hqt: Array,       # (Tp, Tp, B) int8, kernel orientation
    sqj: Array,       # (Tp, Cp, B) int8
    sqc: Array,       # (Cp, Tp, B) int8
    c_off: Array,     # (B, Cp) int32
    lo_pre: Array,
    hi_pre: Array,
    lam0: Array,      # (B, Cp) int32
    sc: Array,        # (8, B) int32 packed rationals
    *,
    outer: int,
    inners: int,
    g_shift: int,
    y_shift: int,
    block: int,
    interpret: Optional[bool],
) -> Tuple[Array, Array]:
    """Shared body of :func:`alm_fused_words` / :func:`alm_fused_words_pre`:
    batch-last padding + the pallas_call.  Returns (words, lam)."""
    if interpret is None:
        interpret = not on_tpu_backend()
    B, Tp = g_pre.shape
    Cp = c_off.shape[1]
    # batch is the trailing (128-lane) dim: clamp the block so small
    # batches don't iterate over mostly zero-padded lanes
    block = _native_block(block, interpret)
    block = min(block, -(-B // 128) * 128)
    # VMEM guard: int8 Hessian + two constraint planes + int32 state;
    # floor 128, larger geometries gated by alm_viable upstream
    while block > 128 and 2 * block * (
        Tp * Tp + 2 * Tp * Cp + 8 * (Tp + Cp)
    ) > _VMEM_BUDGET:
        block -= 128
    rows = -(-B // block) * block
    pad = rows - B

    def bl(x):                                         # batch-last + pad
        xt = jnp.moveaxis(x, 0, -1)
        if pad:
            xt = jnp.pad(xt, [(0, 0)] * (xt.ndim - 1) + [(0, pad)])
        return xt

    def pl_last(x):                                    # already batch-last
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    sc_t = jnp.pad(sc, ((0, 0), (0, pad))) if pad else sc
    args = (bl(lanes), bl(g_pre), pl_last(hqt), pl_last(sqj),
            pl_last(sqc), bl(c_off), bl(lo_pre), bl(hi_pre), bl(lam0),
            sc_t)

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (block,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    kern = _kernel_factory(Tp, Cp, outer, inners, g_shift, y_shift)
    ws = 2 * block * (Tp * Tp + 2 * Tp * Cp + 8 * (Tp + Cp))
    with jax.enable_x64(False):
        out_lanes, out_lam = pl.pallas_call(
            kern,
            out_shape=(
                _out_struct((Tp, rows), jnp.int32, lanes, g_pre, lam0),
                _out_struct((Cp, rows), jnp.int32, lanes, g_pre, lam0),
            ),
            grid=(rows // block,),
            in_specs=[
                spec(Tp), spec(Tp), spec(Tp, Tp), spec(Tp, Cp),
                spec(Cp, Tp), spec(Cp), spec(Cp), spec(Cp), spec(Cp),
                spec(8),
            ],
            out_specs=(spec(Tp), spec(Cp)),
            interpret=interpret,
            **_vmem_kwargs(ws, interpret),
        )(*args)
    words = pack_controls(jnp.moveaxis(out_lanes, -1, 0)[:B])
    return words, jnp.moveaxis(out_lam, -1, 0)[:B]


def alm_fused_words(
    u_words: Array,   # (B, Tp/4) uint32
    g_pre: Array,     # (B, Tp) int32
    Hq: Array,        # (B, Tp, Tp) int8
    hs_num: Array,    # (B,) int32
    hs_den: Array,
    Sq: Array,        # (B, Cp, Tp) int8
    cs_num: Array,
    cs_den: Array,
    c_off: Array,     # (B, Cp) int32
    lo_pre: Array,
    hi_pre: Array,
    eh_num: Array,
    eh_den: Array,
    el_num: Array,
    el_den: Array,
    lam0: Array,      # (B, Cp) int32
    *,
    outer: int,
    inners: int,
    g_shift: int,
    y_shift: int,
    block: int = 256,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """Drop-in fused replacement for ``_alm_batched`` (same operands,
    same returns, bit-identical words and multipliers)."""
    lanes = unpack_controls(u_words)                   # (B, Tp) int32
    sc = jnp.stack([hs_num, hs_den, cs_num, cs_den,
                    eh_num, eh_den, el_num, el_den], 0)  # (8, B)
    hqt = jnp.moveaxis(jnp.transpose(Hq, (0, 2, 1)), 0, -1)  # (k, j, B)
    sqj = jnp.moveaxis(jnp.transpose(Sq, (0, 2, 1)), 0, -1)  # (j, c, B)
    sqc = jnp.moveaxis(Sq, 0, -1)                            # (c, j, B)
    return _alm_fused_core(
        lanes, g_pre, hqt, sqj, sqc, c_off, lo_pre, hi_pre, lam0, sc,
        outer=outer, inners=inners, g_shift=g_shift, y_shift=y_shift,
        block=block, interpret=interpret,
    )


def alm_fused_words_pre(
    u_words: Array,   # (B, Tp/4) uint32
    g_pre: Array,     # (B, Tp) int32
    hqt: Array,       # (Tp, Tp, B) int8, kernel orientation
    hs_num: Array,    # (B,) int32
    hs_den: Array,
    sqj: Array,       # (Tp, Cp, B) int8
    sqc: Array,       # (Cp, Tp, B) int8
    cs_num: Array,
    cs_den: Array,
    c_off: Array,     # (B, Cp) int32
    lo_pre: Array,
    hi_pre: Array,
    eh_num: Array,
    eh_den: Array,
    el_num: Array,
    el_den: Array,
    lam0: Array,      # (B, Cp) int32
    *,
    outer: int,
    inners: int,
    g_shift: int,
    y_shift: int,
    block: int = 256,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array]:
    """:func:`alm_fused_words` with the int8 matrices already batch-last
    in kernel orientation (``hqt`` from :func:`pint_tpu.mpc.
    condense_fused.lipq_fused`, ``sqj``/``sqc`` from ``pen_fused``) --
    skipping every XLA-side int8 transpose on the hot path."""
    lanes = unpack_controls(u_words)                   # (B, Tp) int32
    sc = jnp.stack([hs_num, hs_den, cs_num, cs_den,
                    eh_num, eh_den, el_num, el_den], 0)  # (8, B)
    return _alm_fused_core(
        lanes, g_pre, hqt, sqj, sqc, c_off, lo_pre, hi_pre, lam0, sc,
        outer=outer, inners=inners, g_shift=g_shift, y_shift=y_shift,
        block=block, interpret=interpret,
    )
