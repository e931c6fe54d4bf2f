"""Fused Pallas PGD solver: the full iteration loop in one TPU kernel.

The reference-shaped solver (:class:`pint_tpu.mpc.solver.FixedPointPGD`)
lowers to an XLA `fori_loop` whose per-iteration tensors (the unpacked
iterate, the gradient, the deltas) round-trip HBM every iteration --
~6 MB x iters for the headline batch, which makes the solve HBM-bound.
This kernel keeps everything resident in VMEM:

* grid over batch blocks; each block loads its packed control words ONCE,
  unpacks to an int32 lane tile, and iterates in VMEM;
* the int8 Hessian (4 KB) rides along in VMEM and feeds the MXU every
  iteration (``jnp.dot`` with ``preferred_element_type=int32``);
* the saturating packed update + box floor collapse (exactly, see below) to
  a lane-space clip, so the iteration is matmul -> rescale -> clip;
* words are re-packed once at the end.

Exactness: for in-range int8 lanes, ``max_signed(add_signed_saturate(u, d),
-127)`` equals ``clip(u + d, -127, 127)`` in lane space -- int32 lane adds
cannot wrap, and the box floor re-clamps the -128 saturation flooring.  The
kernel is therefore bit-identical to the word-space solver (asserted in
tests/test_fused.py).

SWAR packing remains the storage/interchange format (4x less HBM traffic
for control plans); lane space is the in-register compute format.  That
split -- pack for memory, unpack for compute -- is the TPU-native reading
of the reference's design, where SWAR serves both roles because scalar CPUs
have no wide vector unit (README.md:5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pint_tpu.models.dynamics import CONTROL_LAYOUT, unpack_controls
from pint_tpu.mpc.condensed import QuantizedQP
from pint_tpu.ops import word as W

Array = jax.Array

__all__ = ["FusedPGD"]


def _unpack_lanes_u32(words: Array) -> Array:
    """(R, C) uint32 -> (R, 4C) int32 sign-extended lanes, vectorized with
    plain shifts (usable inside a Pallas kernel)."""
    r, c = words.shape
    w = words.astype(jnp.int32)  # bit-pattern preserved
    lanes = [
        jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(w, jnp.int32(24 - 8 * k)), jnp.int32(24)
        )
        for k in range(4)
    ]
    # (R, C, 4) -> (R, 4C) with lane k of word j at column 4j+k
    stacked = jnp.stack(lanes, axis=-1)
    return stacked.reshape(r, 4 * c)


def _pack_lanes_u32(lanes: Array) -> Array:
    """(R, 4C) int32 int8-range lanes -> (R, C) uint32 words."""
    r, c4 = lanes.shape
    quads = lanes.reshape(r, c4 // 4, 4)
    w = jnp.zeros(quads.shape[:2], jnp.int32)
    for k in range(4):
        w = w | jax.lax.shift_left(quads[:, :, k] & jnp.int32(0xFF), jnp.int32(8 * k))
    return w.astype(jnp.uint32)


@dataclasses.dataclass(frozen=True)
class FusedPGD:
    """VMEM-resident PGD solver, bit-identical to FixedPointPGD."""

    qqp: QuantizedQP
    iters: int = 40
    block_rows: int = 512
    interpret: bool = dataclasses.field(default=False)

    def _kernel(self, u_ref, g_ref, h_ref, out_ref):
        qqp = self.qqp
        hs_num = np.int32(qqp.hs_num)
        hs_den = np.int32(qqp.hs_den)
        g_shift = np.int32(qqp.g_shift)
        half = np.int32(1 << (qqp.g_shift - 1))

        lanes0 = _unpack_lanes_u32(u_ref[:])        # (R, Tp) int32
        g = g_ref[:]                                 # (R, Tp) int32
        h = h_ref[:]                                 # (Tp, Tp) int8

        def body(_, lanes):
            acc = jax.lax.dot_general(
                lanes.astype(jnp.int8),
                h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            pre = (acc * hs_num) >> hs_den
            step = -(pre + g)
            delta = jnp.clip((step + half) >> g_shift, -128, 127)
            return jnp.clip(lanes + delta, -127, 127)

        lanes = jax.lax.fori_loop(0, self.iters, body, lanes0)
        out_ref[:] = _pack_lanes_u32(lanes)

    @functools.cached_property
    def _call(self):
        qqp = self.qqp
        words_cols = qqp.padded // 4
        br = self.block_rows

        def run(u_words: Array, g_pre: Array) -> Array:
            batch = u_words.shape[0]
            rows = -(-batch // br) * br
            pad = rows - batch
            if pad:
                u_words = jnp.concatenate(
                    [u_words, jnp.zeros((pad, words_cols), u_words.dtype)]
                )
                g_pre = jnp.concatenate(
                    [g_pre, jnp.zeros((pad, qqp.padded), g_pre.dtype)]
                )
            grid = (rows // br,)
            out = pl.pallas_call(
                self._kernel,
                out_shape=jax.ShapeDtypeStruct((rows, words_cols), jnp.uint32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (br, words_cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (br, qqp.padded), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (qqp.padded, qqp.padded), lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (br, words_cols), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                interpret=self.interpret,
            )(u_words, g_pre, jnp.asarray(qqp.Hq))
            return out[:batch]

        return jax.jit(run)

    # -- public API (mirrors FixedPointPGD) ---------------------------------

    def init_words(self, batch: int) -> Array:
        return jnp.zeros((batch, self.qqp.padded // 4), jnp.uint32)

    def solve_words(self, u_words: Array, g_pre: Array) -> Array:
        return self._call(u_words, g_pre)

    def solve(self, x0_phys: np.ndarray) -> Tuple[Array, Array]:
        g_pre = jnp.asarray(self.qqp.g_lane_fixed(np.atleast_2d(x0_phys)))
        u0 = self.init_words(g_pre.shape[0])
        words = self.solve_words(u0, g_pre)
        lanes = unpack_controls(words)[:, : self.qqp.horizon]
        return words, lanes.astype(jnp.float32) * np.float32(self.qqp.u_scale)
