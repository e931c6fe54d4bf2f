"""Fused Pallas lipschitz + quantize: the condensation epilogue in VMEM.

After round 3 fused the integer inners, the f32 condensation became the
binding stage of both device solvers (BASELINE.md phase tables: ~64-85%
of an outer).  Within it, the lipschitz power iteration re-streams the
batch-last Hessian ``Ht (Tm, Tm, B)`` from HBM once per iteration
(``power_iters + 1`` full passes, ~1.2 GB at the headline config), the
quantize phase reads it again and then materializes the int8 Hessian in
the batch-FIRST ``(B, Tm, Tm)`` layout -- a bad-layout transpose -- which
the fused PGD inner immediately transposes BACK to batch-last.

This kernel collapses all of that: grid over batch blocks, each block's
``Ht`` slab is loaded into VMEM ONCE; the whole power iteration, the
abs-max reduce and the int8 rounding run resident, and the quantized
Hessian comes out already in the fused inner's ``hqt[k, j, b] =
Hq[j, k, b]`` orientation (zero XLA-side transposes on the hot path).
Scalar epilogue (step rationals, ``g_pre`` rounding) stays outside the
kernel: it is elementwise-only f32 math, bit-deterministic under any XLA
fusion, and reuses :meth:`DeviceSQP._quantize_phase`'s exact formulas.

Bit-compatibility contract: the kernel's power iteration accumulates in
a fixed sublane order (unrolled k-loop), which differs in last-ulp bits
from XLA's tree reductions -- so ``lipq=True`` and ``lipq=False`` are
two self-consistent quantization paths, each bit-deterministic, each
shared by BOTH inner paths (fused and XLA) on a given backend.  The
fused-vs-XLA-inner bit-identity invariant holds within either setting
(tests/test_condense_fused.py).

The power iteration here applies ``H^T v`` (leading-axis, contiguous
sublane reads) where the XLA path applies ``H v``; the condensed Hessian
is symmetric up to f32 roundoff, so both converge to the same
``lambda_max`` with the same 1.05 safety margin.

No counterpart in the reference library (the reference has no float
stage at all); this serves the BASELINE.json MPC capability layer.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pint_tpu.mpc.fused_alm import (
    _native_block,
    _out_struct,
    _vmem_kwargs,
    _VMEM_BUDGET,
    _VMEM_CEIL,
    on_tpu_backend,
)

Array = jax.Array

__all__ = ["lipq_fused", "lipq_viable", "pen_fused", "pen_viable"]


def lipq_viable(Tm: int) -> bool:
    """True when :func:`lipq_fused` fits physical VMEM (raised-limit
    ceiling, ``fused_alm._VMEM_CEIL`` -- the ~16 MB scoped budget is
    Mosaic's default limit, not the v5e's 128 MB hardware) at the
    minimum native block (128 batch columns): Tm <= 286, covering the
    whole shipped horizon table (T=128 at m=2 is Tm=256)."""
    return 2 * (Tm * Tm * 128 * 5) <= _VMEM_CEIL


def pen_viable(C: int, Tm: int) -> bool:
    """True when :func:`pen_fused` fits physical VMEM at the minimum
    native block."""
    return 2 * (C * Tm * 128 * 6) <= _VMEM_CEIL


def _lipq_kernel_factory(Tm: int, power_iters: int):
    inv_sqrt = np.float32(1.0 / np.sqrt(Tm))
    safety = np.float32(1.05)

    def kernel(ht_ref, out_hqt, out_lip, out_hmax):
        # ht_ref: (Tm, Tm, bb) f32 VMEM-resident block

        def matvec(v):                                  # v (Tm, bb)
            # w = H^T v via leading-axis (contiguous) reads; H is
            # symmetric to f32 roundoff so lambda_max is unchanged
            w = ht_ref[0] * v[0:1]
            for k in range(1, Tm):
                w = w + ht_ref[k] * v[k : k + 1]
            return w

        def pit(_, v):
            w = matvec(v)
            return w / (
                jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True)) + 1e-30
            )

        zero = ht_ref[0, 0:1] * 0.0                     # (1, bb), varying
        v0 = jnp.full((Tm, 1), inv_sqrt, jnp.float32) + zero
        v = jax.lax.fori_loop(0, power_iters, pit, v0)
        hv = matvec(v)
        lip = jnp.sum(v * hv, axis=0, keepdims=True) * safety

        hm = jnp.max(jnp.abs(ht_ref[0]), axis=0, keepdims=True)
        for k in range(1, Tm):
            hm = jnp.maximum(
                hm, jnp.max(jnp.abs(ht_ref[k]), axis=0, keepdims=True)
            )

        # clamp the denominator: zero-padded batch columns (and any
        # degenerate all-zero slab) have hm == 0, and 0 * inf = NaN fed
        # into an int8 astype is unspecified in Mosaic/interpret.  Real
        # columns have hm >> 1e-30 so their bits are untouched.
        scale = np.float32(127.0) / jnp.maximum(hm, np.float32(1e-30))
        for k in range(Tm):
            # hqt[k, j, b] = round(Ht[k, j, b] * 127 / hmax): contiguous
            # leading-axis reads/writes.  The inner kernels consume hqt
            # as their [k, j] operand, i.e. they apply the quantized
            # TRANSPOSE q(H)^T -- a valid quantization of the symmetric
            # H, and the XLA inner consumes the exact same int8 values
            # (transpose(hqt, (2, 1, 0))), so cross-path bit-identity is
            # unaffected
            out_hqt[k] = jnp.clip(
                jnp.round(ht_ref[k] * scale), -127, 127
            ).astype(jnp.int8)
        out_lip[:] = lip
        out_hmax[:] = hm

    return kernel


def lipq_fused(
    Ht: Array,            # (Tm, Tm, B) f32 batch-last condensed Hessian
    *,
    power_iters: int,
    block: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """Power-iteration Lipschitz + int8 quantization, VMEM-resident.

    Returns ``(hqt (Tm, Tm, B) int8, lip (B,) f32, h_max (B,) f32)`` with
    ``hqt[k, j, b] = clip(round(Ht[k, j, b] * 127 / h_max[b]))`` (all
    contiguous leading-axis passes) -- consumed directly as the [k, j]
    operand of :func:`pint_tpu.mpc.fused_alm.pgd_fused_words`'s kernel,
    which therefore applies the quantized transpose ``q(H)^T``: a valid
    int8 quantization of the f32-roundoff-symmetric condensed Hessian,
    and identical ints in the XLA inner (which takes
    ``jnp.transpose(hqt, (2, 1, 0))``) -- ``lip`` already carrying the
    1.05 safety factor.  The step
    rationals and ``g_pre`` rounding stay with the caller (elementwise
    f32, bit-deterministic outside the kernel).
    """
    if interpret is None:
        interpret = not on_tpu_backend()
    Tm, Tm2, B = Ht.shape
    assert Tm == Tm2, f"Ht must be (Tm, Tm, B), got {Ht.shape}"
    blk = min(_native_block(block, interpret), -(-B // 128) * 128)
    # VMEM guard: the kernel holds a (Tm, Tm, blk) f32 slab + the int8
    # output, double-buffered across grid steps; Mosaic's scoped VMEM is
    # ~16 MB.  Native blocks floor at 128 (Pallas TPU requires the
    # trailing block dim divisible by 128); horizons too large even for
    # blk=128 must not take this kernel at all (lipq_viable gates the
    # solvers' auto-selection)
    while blk > 128 and 2 * (Tm * Tm * blk * 5) > _VMEM_BUDGET:
        blk -= 128
    rows = -(-B // blk) * blk
    pad = rows - B
    if pad:
        Ht = jnp.pad(Ht, ((0, 0), (0, 0), (0, pad)))

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (blk,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    kern = _lipq_kernel_factory(Tm, power_iters)
    ws = 2 * (Tm * Tm * blk * 5)
    with jax.enable_x64(False):
        hqt, lip, hmax = pl.pallas_call(
            kern,
            out_shape=(
                _out_struct((Tm, Tm, rows), jnp.int8, Ht),
                _out_struct((1, rows), jnp.float32, Ht),
                _out_struct((1, rows), jnp.float32, Ht),
            ),
            grid=(rows // blk,),
            in_specs=[spec(Tm, Tm)],
            out_specs=(spec(Tm, Tm), spec(1), spec(1)),
            interpret=interpret,
            **_vmem_kwargs(ws, interpret),
        )(Ht)
    return hqt[:, :, :B], lip[0, :B], hmax[0, :B]


def _pen_kernel_factory(C: int, Tm: int, power_iters: int):
    inv_sqrt = np.float32(1.0 / np.sqrt(Tm))
    safety = np.float32(1.05)

    def kernel(s_ref, out_sqc, out_sqj, out_lip, out_sscale, out_rowamp):
        # s_ref: (C, Tm, bb) f32 constraint stack, VMEM-resident

        def ssv(v):                                     # S v: (Tm,bb)->(C,bb)
            return jnp.concatenate(
                [
                    jnp.sum(s_ref[c] * v, axis=0, keepdims=True)
                    for c in range(C)
                ],
                axis=0,
            )

        def stw(w):                                     # S^T w: (C,bb)->(Tm,bb)
            u = s_ref[0] * w[0:1]
            for c in range(1, C):
                u = u + s_ref[c] * w[c : c + 1]
            return u

        def pit(_, v):
            u = stw(ssv(v))
            return u / (
                jnp.sqrt(jnp.sum(u * u, axis=0, keepdims=True)) + 1e-30
            )

        zero = s_ref[0, 0:1] * 0.0                      # (1, bb)
        v0 = jnp.full((Tm, 1), inv_sqrt, jnp.float32) + zero
        v = jax.lax.fori_loop(0, power_iters, pit, v0)
        w = ssv(v)
        hv = stw(w)
        lip = jnp.sum(v * hv, axis=0, keepdims=True) * safety

        sm = jnp.max(jnp.abs(s_ref[0]), axis=0, keepdims=True)
        ra = jnp.sum(jnp.abs(s_ref[0]), axis=0, keepdims=True)
        for c in range(1, C):
            a = jnp.abs(s_ref[c])
            sm = jnp.maximum(sm, jnp.max(a, axis=0, keepdims=True))
            ra = jnp.maximum(ra, jnp.sum(a, axis=0, keepdims=True))
        s_scale = sm / np.float32(127.0)

        # quantize with scale = 127/max|S| (the same multiply form as
        # lipq_fused; NOT 1/s_scale, whose double rounding could land a
        # quotient one ulp away from the reference recompute)
        # zero-padding guard as in the lipq kernel: keep padded columns
        # finite (sm == 0 otherwise makes 0 * inf = NaN -> int8)
        scale = np.float32(127.0) / jnp.maximum(sm, np.float32(1e-30))
        for c in range(C):
            out_sqc[c] = jnp.clip(
                jnp.round(s_ref[c] * scale), -127, 127
            ).astype(jnp.int8)
        for j in range(Tm):
            out_sqj[j] = jnp.clip(
                jnp.round(s_ref[:, j, :] * scale), -127, 127
            ).astype(jnp.int8)
        out_lip[:] = lip
        out_sscale[:] = s_scale
        out_rowamp[:] = np.float32(127.0) * ra

    return kernel


def pen_fused(
    S_t: Array,           # (C, Tm, B) f32 batch-last constraint stack
    *,
    power_iters: int,
    block: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array, Array, Array]:
    """Penalty power iteration + int8 constraint-row quantization, VMEM-
    resident: the constrained sibling of :func:`lipq_fused`, replacing
    :meth:`DeviceConstrainedSQP._pen_lipschitz` (which re-streams S_t
    twice per iteration from HBM) and the XLA Sq quantize + transposes.

    Returns ``(sqc (C, Tm, B) int8, sqj (Tm, C, B) int8, pen_lip (B,)
    f32, s_scale (B,) f32, row_amp (B,) f32)``: ``sqc[c, j, b] =
    clip(round(S_t[c, j, b] * 127 / max|S_t[..., b]|))`` in both orientations the
    fused ALM kernel consumes, ``pen_lip ~ 1.05 * lambda_max(S S^T)``,
    ``s_scale = max|S| / 127`` and ``row_amp = 127 * max_c sum_j |S|``
    (the c-pre unit ingredients, sqp_constrained semantics)."""
    if interpret is None:
        interpret = not on_tpu_backend()
    C, Tm, B = S_t.shape
    blk = min(_native_block(block, interpret), -(-B // 128) * 128)
    # VMEM guard (see lipq_fused): f32 slab + two int8 outputs
    while blk > 128 and 2 * (C * Tm * blk * 6) > _VMEM_BUDGET:
        blk -= 128
    rows = -(-B // blk) * blk
    pad = rows - B
    if pad:
        S_t = jnp.pad(S_t, ((0, 0), (0, 0), (0, pad)))

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (blk,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    kern = _pen_kernel_factory(C, Tm, power_iters)
    ws = 2 * (C * Tm * blk * 6)
    with jax.enable_x64(False):
        sqc, sqj, lip, ss, ra = pl.pallas_call(
            kern,
            out_shape=(
                _out_struct((C, Tm, rows), jnp.int8, S_t),
                _out_struct((Tm, C, rows), jnp.int8, S_t),
                _out_struct((1, rows), jnp.float32, S_t),
                _out_struct((1, rows), jnp.float32, S_t),
                _out_struct((1, rows), jnp.float32, S_t),
            ),
            grid=(rows // blk,),
            in_specs=[spec(C, Tm)],
            out_specs=(spec(C, Tm), spec(Tm, C), spec(1), spec(1), spec(1)),
            interpret=interpret,
            **_vmem_kwargs(ws, interpret),
        )(S_t)
    return (
        sqc[:, :, :B],
        sqj[:, :, :B],
        lip[0, :B],
        ss[0, :B],
        ra[0, :B],
    )
