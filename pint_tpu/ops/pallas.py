"""Pallas TPU kernels for the hot SWAR ops.

The jnp formulas in :mod:`pint_tpu.ops.word` lower to fused XLA elementwise
loops already; these Pallas kernels exist to (a) pin the tiling/VMEM
residency explicitly for the roofline bench, (b) serve as the fusion site
for multi-op chains (saturating accumulate, packed control updates) where
one HBM round-trip replaces several, and (c) host the fixed-point MPC inner
kernels.  The kernel bodies *reuse* the exact branch-free formulas -- a
Pallas kernel here is "formula + residency plan", nothing else, which keeps
the two paths bit-identical by construction (parity-tested in
tests/test_pallas.py).

Tiling: words are flattened and padded to (rows, COLS) with COLS=512 lanes,
then gridded over row blocks sized to the VPU's (8, 128) int32 tile
(pallas_guide: Tiling Constraints).  Word dtypes of 8/16/32 bits run native.

64-bit words (no TPU i64 vector unit; Mosaic rejects i64) have two tiers:
standalone ``binop``/``shift`` dispatch to the jnp/XLA path, whose u64
emulation fuses into one bandwidth-bound pass (measured ~7x faster than
routing through kernels with their pad/reshape boundary passes --
BENCH_sweep.json u64_family); the **split kernels** -- word.py formulas
evaluated over :class:`~pint_tpu.ops.split64.SplitWord` u32 half-pairs
with branch-free cross-half carries -- back the x64-free planar pair
entries (``binop_pair``/``shift_pair``) and fused in-Pallas u64 chains
(``saturating_accumulate``), where Mosaic leaves no alternative.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pint_tpu.layout import PackedLayout
from pint_tpu.ops import split64 as S
from pint_tpu.ops import word as W

Array = jax.Array

__all__ = [
    "supported",
    "binop",
    "binop_pair",
    "shift",
    "shift_pair",
    "saturating_accumulate",
    "BINOP_NAMES",
    "SHIFT_NAMES",
]

BINOP_NAMES = (
    "add_wrap",
    "add_unsigned_saturate",
    "add_signed_saturate",
    "sub_wrap",
    "sub_unsigned_saturate",
    "sub_signed_saturate",
    "min_unsigned",
    "max_unsigned",
    "min_signed",
    "max_signed",
)
SHIFT_NAMES = ("shift_left", "shift_right_unsigned")

_COLS = 512
_BLOCK_ROWS = 256


def supported(layout: PackedLayout) -> bool:
    """Whether a Pallas kernel exists for this layout's word dtype.

    8/16/32-bit words run native (widened-to-u32) kernels; for 64-bit
    layouts ``binop``/``shift`` return the jnp/XLA path (fastest measured)
    while split 2xu32 kernels back ``binop_pair``/``shift_pair`` and the
    fused ``saturating_accumulate``.  Always true today -- kept as API for
    callers that want to gate on availability.
    """
    return layout.word_bits in (8, 16, 32, 64)


def _native(layout: PackedLayout) -> bool:
    return layout.word_bits in (8, 16, 32)


def _tile_shape(total: int) -> tuple[int, int, int]:
    """(rows, padded_total, block_rows) for a flat word count."""
    rows = -(-total // _COLS)
    # row padding keeps the grid uniform; zero words are harmless for all ops
    block_rows = min(_BLOCK_ROWS, max(8, rows))
    rows = -(-rows // block_rows) * block_rows
    return rows, rows * _COLS, block_rows


def _elementwise_call(kernel, n_in: int, shape, dtype, block_rows, rows, interpret):
    grid = (rows // block_rows,)
    spec = pl.BlockSpec(
        (block_rows, _COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=spec,
        interpret=interpret,
    )


TPU_BACKENDS = ("tpu", "axon")


def on_tpu_backend() -> bool:
    """True when the default backend compiles Pallas natively (real TPU
    or the tunneled axon plugin) -- the single source of truth for every
    kernel/flag auto-gate in the package."""
    return jax.default_backend() in TPU_BACKENDS


def _default_interpret() -> bool:
    return not on_tpu_backend()


def _flatten_pad(x: Array, padded_total: int) -> Array:
    flat = x.reshape(-1)
    pad = padded_total - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat.reshape(-1, _COLS)


def _widen(x):
    """Mosaic has no i8/u16 vector ALU ("Only vector<i16> and vector<i32>
    are supported"); compute narrow-word layouts in a u32 container.  The
    branch-free formulas are container-agnostic: sub-word wrap/borrow
    behavior only ever matters below ``total_bits`` (the same invariant that
    makes total_bits < word_bits layouts work), and every result is
    canonical (< 2^total), so the narrowing cast back is exact.
    """
    return x.astype(jnp.uint32) if x.dtype.itemsize < 4 else x


@functools.lru_cache(maxsize=None)
def _binop_impl(layout: PackedLayout, name: str, interpret: bool):
    formula = getattr(W, name)

    def kernel(a_ref, b_ref, out_ref):
        out = formula(layout, _widen(a_ref[:]), _widen(b_ref[:]))
        out_ref[:] = out.astype(layout.word_dtype)

    @jax.jit
    def run(a: Array, b: Array) -> Array:
        shape = a.shape
        total = int(np.prod(shape)) if shape else 1
        rows, padded_total, block_rows = _tile_shape(total)
        a2 = _flatten_pad(a, padded_total)
        b2 = _flatten_pad(b, padded_total)
        out = _elementwise_call(
            kernel, 2, a2.shape, a2.dtype, block_rows, rows, interpret
        )(a2, b2)
        return out.reshape(-1)[:total].reshape(shape)

    return run


def _to_pair(x: Array) -> Array:
    """uint64 array -> (2, ...) planar u32 pair words (requires x64).

    PLANAR, not interleaved: the halves live on the LEADING axis so each
    plane is contiguous and tiles the (8, 128) vector grid perfectly.  A
    trailing pair axis would put a size-2 dim on the lane axis (padded
    2 -> 128: an 8-10x throughput cliff, measured).
    """
    return jnp.moveaxis(jax.lax.bitcast_convert_type(x, jnp.uint32), -1, 0)


def _from_pair(pair: Array) -> Array:
    """(2, ...) planar u32 pair words -> uint64 array (requires x64)."""
    return jax.lax.bitcast_convert_type(
        jnp.moveaxis(pair, 0, -1), jnp.uint64
    )


def _pair_pad(pair: Array, padded_total: int) -> tuple[Array, Array]:
    """(2, ...) planar pair words -> (lo, hi) planes flattened/padded to
    (rows, COLS)."""
    return (
        _flatten_pad(pair[0], padded_total),
        _flatten_pad(pair[1], padded_total),
    )


def _pair_trim(lo: Array, hi: Array, total: int, shape) -> Array:
    pair = jnp.stack([lo.reshape(-1)[:total], hi.reshape(-1)[:total]])
    return pair.reshape(2, *shape)


def _check_planar(pair: Array) -> None:
    """Planar pair words have the halves on the LEADING axis: (2, ...).
    A trailing pair axis would be silently misread (axis 0 becomes data),
    so reject anything whose first dim is not exactly 2."""
    if pair.ndim < 1 or pair.shape[0] != 2 or pair.dtype != jnp.uint32:
        raise ValueError(
            f"pair words must be planar uint32 (2, ...) -- [0]=low half, "
            f"[1]=high half; got shape {pair.shape} dtype {pair.dtype}"
        )


def _x32_trace():
    """Trace-local x64 off: split kernels are pure u32, but an ambient
    jax_enable_x64 turns Pallas index-map literals into i64 scalars which
    Mosaic rejects ('failed to legalize func.return (i32, i64)').  The u64
    bitcasts stay OUTSIDE this scope."""
    return jax.enable_x64(False)


@functools.lru_cache(maxsize=None)
def _binop_pair_impl(layout: PackedLayout, name: str, interpret: bool):
    formula = getattr(W, name)
    view = S.SplitView(layout)

    def kernel(alo, ahi, blo, bhi, olo, ohi):
        a = S.SplitWord(alo[:], ahi[:])
        b = S.SplitWord(blo[:], bhi[:])
        out = formula(view, a, b)
        olo[:] = out.lo
        ohi[:] = out.hi

    @jax.jit
    def run(a: Array, b: Array) -> Array:
        _check_planar(a)
        _check_planar(b)
        shape = a.shape[1:]
        total = int(np.prod(shape)) if shape else 1
        rows, padded_total, block_rows = _tile_shape(total)
        with _x32_trace():
            alo, ahi = _pair_pad(a, padded_total)
            blo, bhi = _pair_pad(b, padded_total)
            spec = pl.BlockSpec(
                (block_rows, _COLS), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            out_sd = jax.ShapeDtypeStruct(alo.shape, jnp.uint32)
            lo, hi = pl.pallas_call(
                kernel,
                out_shape=(out_sd, out_sd),
                grid=(rows // block_rows,),
                in_specs=[spec] * 4,
                out_specs=(spec, spec),
                interpret=interpret,
            )(alo, ahi, blo, bhi)
            return _pair_trim(lo, hi, total, shape)

    return run


def binop_pair(
    layout: PackedLayout, name: str, *, interpret: Optional[bool] = None
) -> Callable[[Array, Array], Array]:
    """Pallas split binop on u64 words carried as (2, ...) planar u32 pairs.

    The x64-free entry point for 64-bit layouts on TPU: ``pair[0]`` is the
    low half, ``pair[1]`` the high half (little-endian).  Planar layout --
    halves on the LEADING axis -- keeps each plane contiguous on the vector
    grid; an interleaved trailing pair axis costs 8-10x (measured).
    """
    if name not in BINOP_NAMES:
        raise ValueError(f"unknown binop {name!r}")
    if layout.word_bits != 64:
        raise ValueError(f"binop_pair is for u64 layouts, got {layout}")
    if interpret is None:
        interpret = _default_interpret()
    return _binop_pair_impl(layout, name, interpret)


def binop(
    layout: PackedLayout, name: str, *, interpret: Optional[bool] = None
) -> Callable[[Array, Array], Array]:
    """A Pallas-backed binary SWAR op ``(words, words) -> words``.

    u64 layouts dispatch to the jnp/XLA path: XLA's own 64-bit integer
    emulation fuses the whole formula into one bandwidth-bound pass and
    measures ~7x faster than routing through split kernels with their
    pad/reshape boundary passes (BENCH_sweep.json u64_family).  The split
    kernels remain as :func:`binop_pair` (x64-free pair-word entry) and as
    the in-kernel composition tier for fused u64 chains, where Mosaic's
    lack of i64 vectors leaves no alternative.
    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    tests run everywhere.
    """
    if name not in BINOP_NAMES:
        raise ValueError(f"unknown binop {name!r}")
    if interpret is None:
        interpret = _default_interpret()
    if not _native(layout):
        formula = getattr(W, name)
        return jax.jit(lambda a, b: formula(layout, a, b))
    return _binop_impl(layout, name, interpret)


@functools.lru_cache(maxsize=None)
def _shift_impl(layout: PackedLayout, name: str, interpret: bool):
    formula = getattr(W, name)

    def kernel(amt_ref, v_ref, out_ref):
        out = formula(layout, _widen(v_ref[:]), amt_ref[0])
        out_ref[:] = out.astype(layout.word_dtype)

    @jax.jit
    def run(v: Array, amount) -> Array:
        shape = v.shape
        total = int(np.prod(shape)) if shape else 1
        rows, padded_total, block_rows = _tile_shape(total)
        v2 = _flatten_pad(v, padded_total)
        amt = jnp.asarray(amount, dtype=jnp.int32).reshape(1)
        grid = (rows // block_rows,)
        spec = pl.BlockSpec(
            (block_rows, _COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(v2.shape, v2.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                spec,
            ],
            out_specs=spec,
            interpret=interpret,
        )(amt, v2)
        return out.reshape(-1)[:total].reshape(shape)

    return run


@functools.lru_cache(maxsize=None)
def _shift_pair_impl(layout: PackedLayout, name: str, interpret: bool):
    formula = getattr(W, name)
    view = S.SplitView(layout)

    def kernel(amt_ref, vlo, vhi, olo, ohi):
        out = formula(view, S.SplitWord(vlo[:], vhi[:]), amt_ref[0])
        olo[:] = out.lo
        ohi[:] = out.hi

    @jax.jit
    def run(v: Array, amount) -> Array:
        _check_planar(v)
        shape = v.shape[1:]
        total = int(np.prod(shape)) if shape else 1
        rows, padded_total, block_rows = _tile_shape(total)
        with _x32_trace():
            vlo, vhi = _pair_pad(v, padded_total)
            amt = jnp.asarray(amount, dtype=jnp.int32).reshape(1)
            spec = pl.BlockSpec(
                (block_rows, _COLS), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            out_sd = jax.ShapeDtypeStruct(vlo.shape, jnp.uint32)
            lo, hi = pl.pallas_call(
                kernel,
                out_shape=(out_sd, out_sd),
                grid=(rows // block_rows,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
                out_specs=(spec, spec),
                interpret=interpret,
            )(amt, vlo, vhi)
            return _pair_trim(lo, hi, total, shape)

    return run


def shift_pair(
    layout: PackedLayout, name: str, *, interpret: Optional[bool] = None
) -> Callable[[Array, object], Array]:
    """Pallas split lane-shift on (2, ...) planar u32 pair words
    (x64-free u64)."""
    if name not in SHIFT_NAMES:
        raise ValueError(f"unknown shift {name!r}")
    if layout.word_bits != 64:
        raise ValueError(f"shift_pair is for u64 layouts, got {layout}")
    if interpret is None:
        interpret = _default_interpret()
    return _shift_pair_impl(layout, name, interpret)


def shift(
    layout: PackedLayout, name: str, *, interpret: Optional[bool] = None
) -> Callable[[Array, object], Array]:
    """A Pallas-backed lane shift ``(words, amount) -> words`` with the
    amount living in SMEM (runtime scalar, branch-free guard intact)."""
    if name not in SHIFT_NAMES:
        raise ValueError(f"unknown shift {name!r}")
    if interpret is None:
        interpret = _default_interpret()
    if not _native(layout):
        formula = getattr(W, name)
        return jax.jit(lambda v, a: formula(layout, v, a))
    return _shift_impl(layout, name, interpret)


@functools.lru_cache(maxsize=None)
def _sat_accum_impl(layout: PackedLayout, signed: bool, steps: int, interpret: bool):
    formula = W.add_signed_saturate if signed else W.add_unsigned_saturate

    def kernel(acc_ref, d_ref, out_ref):
        acc = _widen(acc_ref[:])
        for s in range(steps):
            acc = formula(layout, acc, _widen(d_ref[s]))
        out_ref[:] = acc.astype(layout.word_dtype)

    @jax.jit
    def run(acc: Array, deltas: Array) -> Array:
        # deltas: (steps, *acc.shape)
        shape = acc.shape
        total = int(np.prod(shape)) if shape else 1
        rows, padded_total, block_rows = _tile_shape(total)
        a2 = _flatten_pad(acc, padded_total)
        d2 = jnp.stack(
            [_flatten_pad(deltas[s], padded_total) for s in range(steps)]
        )
        spec = pl.BlockSpec(
            (block_rows, _COLS), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        dspec = pl.BlockSpec(
            (steps, block_rows, _COLS), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a2.shape, a2.dtype),
            grid=(rows // block_rows,),
            in_specs=[spec, dspec],
            out_specs=spec,
            interpret=interpret,
        )(a2, d2)
        return out.reshape(-1)[:total].reshape(shape)

    return run


def saturating_accumulate(
    layout: PackedLayout,
    *,
    signed: bool = True,
    steps: int = 1,
    interpret: Optional[bool] = None,
) -> Callable[[Array, Array], Array]:
    """Fused multi-step saturating accumulate: ``acc <- sat(acc + d_s)`` for
    each of ``steps`` delta planes, one HBM round-trip total.

    This is the fusion pattern the MPC control update uses (saturating packed
    control updates over several PGD sub-steps); as a standalone op it shows
    the Pallas win over op-at-a-time execution: 2+steps HBM streams instead
    of 3*steps.
    """
    if interpret is None:
        interpret = _default_interpret()
    if not _native(layout):
        return _sat_accum_split_impl(layout, signed, steps, interpret)
    return _sat_accum_impl(layout, signed, steps, interpret)


@functools.lru_cache(maxsize=None)
def _sat_accum_split_impl(
    layout: PackedLayout, signed: bool, steps: int, interpret: bool
):
    formula = W.add_signed_saturate if signed else W.add_unsigned_saturate
    view = S.SplitView(layout)

    def kernel(alo, ahi, dlo, dhi, olo, ohi):
        acc = S.SplitWord(alo[:], ahi[:])
        for s in range(steps):
            acc = formula(view, acc, S.SplitWord(dlo[s], dhi[s]))
        olo[:] = acc.lo
        ohi[:] = acc.hi

    @jax.jit
    def run(acc: Array, deltas: Array) -> Array:
        shape = acc.shape
        total = int(np.prod(shape)) if shape else 1
        rows, padded_total, block_rows = _tile_shape(total)
        acc_pair = _to_pair(acc)
        delta_pairs = _to_pair(deltas)  # (2, steps, ...) planar
        with _x32_trace():
            alo, ahi = _pair_pad(acc_pair, padded_total)
            planes = [
                _pair_pad(delta_pairs[:, s], padded_total)
                for s in range(steps)
            ]
            dlo = jnp.stack([p[0] for p in planes])
            dhi = jnp.stack([p[1] for p in planes])
            spec = pl.BlockSpec(
                (block_rows, _COLS), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
            dspec = pl.BlockSpec(
                (steps, block_rows, _COLS), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            )
            out_sd = jax.ShapeDtypeStruct(alo.shape, jnp.uint32)
            lo, hi = pl.pallas_call(
                kernel,
                out_shape=(out_sd, out_sd),
                grid=(rows // block_rows,),
                in_specs=[spec, spec, dspec, dspec],
                out_specs=(spec, spec),
                interpret=interpret,
            )(alo, ahi, dlo, dhi)
            pair = _pair_trim(lo, hi, total, shape)
        return _from_pair(pair)

    return run
