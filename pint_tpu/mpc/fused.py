"""Fused Pallas PGD solver: the full iteration loop in one TPU kernel.

The reference-shaped solver (:class:`pint_tpu.mpc.solver.FixedPointPGD`)
lowers to an XLA `fori_loop` whose per-iteration tensors (the unpacked
iterate, the gradient, the deltas) round-trip HBM every iteration --
~6 MB x iters for the headline batch, which makes the solve HBM-bound.
This kernel keeps the whole loop resident in VMEM:

* grid over batch blocks; each block loads its int32 lane tile and linear
  term ONCE and iterates in VMEM;
* the int8 Hessian (4 KB) rides along in VMEM and feeds the MXU every
  iteration (``dot_general`` with ``preferred_element_type=int32``);
* the saturating packed update + box floor collapse (exactly, see below) to
  a lane-space clip, so one iteration is matmul -> rescale -> clip.

SWAR words remain the HBM storage/interchange format; the unpack/pack
happens ONCE per solve on the XLA side (Mosaic cannot shape-cast the
interleaved lane reshape in-register, and a once-per-solve conversion is
off the critical path anyway).  That split -- pack for memory, unpack for
compute -- is the TPU-native reading of the reference's design, where SWAR
serves both roles because scalar CPUs have no wide vector unit
(README.md:5).

Exactness: for in-range int8 lanes, ``max_signed(add_signed_saturate(u, d),
-127)`` equals ``clip(u + d, -127, 127)`` in lane space -- int32 lane adds
cannot wrap, and the box floor re-clamps the -128 saturation flooring.  The
kernel is therefore bit-identical to the word-space solver (asserted in
tests/test_fused.py, and on-device in the bench).
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

from pint_tpu.models.dynamics import pack_controls, unpack_controls
from pint_tpu.mpc.condensed import QuantizedQP

Array = jax.Array

__all__ = ["FusedPGD"]


@dataclasses.dataclass(frozen=True)
class FusedPGD:
    """VMEM-resident PGD solver, bit-identical to FixedPointPGD.

    ``mxu_pack`` folds k independent problems into one MXU pass via a
    k-block-diagonal Hessian.  Measured on v5e this LOSES (~26M vs ~49M
    solves/s at the headline config): Mosaic already tiles the 64-wide
    contraction efficiently, so the doubled MAC count of the zero blocks is
    pure overhead.  Kept (default 1) as a documented experiment -- results
    stay bit-identical for any k.
    """

    qqp: QuantizedQP
    iters: int = 40
    block_rows: int = 1024   # best in the round-3 on-chip sweep: 46.4M
    # solves/s vs 44.2-45.0M at 512/2048/4096/8192 (batch 8192, 40 iters,
    # bit-identical at every size)
    mxu_pack: int = 1
    momentum: bool = False
    """Nesterov-style extrapolation (see mpc/accelerated.py): ~3x fewer
    iterations at equal accuracy for the default QP's kappa~100.  Carries a
    second lane plane (x_prev) in VMEM; bit-identical to AcceleratedPGD."""
    beta_den: int = 8
    packed_io: bool = False
    """EXPERIMENTAL -- interpret-mode only.  Read/write SWAR words directly
    in the kernel via a grouped lane order (all lane-0s | all lane-1s | ...)
    that unpacks with shifted copies + a lane-axis concatenate, no reshape.
    Semantically bit-identical (tests/test_fused.py, interpret mode), but
    the current Mosaic compiler MISCOMPILES the sub-tile (16-lane) concat/
    slice shuffles on hardware -- lane-2 bytes of odd word columns come back
    zeroed (verified 2026-08-17 on v5e; standalone repro checked in as
    ``mosaic_repro.py`` -- run it per toolchain bump; it also measures the
    shuffle-free PLANAR alternative, lane planes on a leading axis with no
    concat/sub-tile slice, which is the rewrite path if the gate must be
    lifted before the toolchain fix).  Native compilation therefore raises
    until the toolchain fixes lane-granular shuffles; the saving at stake
    is <5% of solve time (the once-per-solve XLA-side conversion)."""
    # None = auto: interpreter off-TPU so the same code runs everywhere
    interpret: object = None

    def _body(self, g, h):
        qqp = self.qqp
        hs_num = np.int32(qqp.hs_num)
        hs_den = np.int32(qqp.hs_den)
        g_shift = np.int32(qqp.g_shift)
        half = np.int32(1 << (qqp.g_shift - 1))

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

        return body

    @functools.cached_property
    def _beta_num(self) -> int:
        eig = np.linalg.eigvalsh(self.qqp.qp.H)
        kappa = float(eig.max() / max(eig.min(), 1e-12))
        rk = np.sqrt(kappa)
        return int(round((rk - 1.0) / (rk + 1.0) * (1 << self.beta_den)))

    def _kernel(self, u_ref, g_ref, h_ref, out_ref):
        body = self._body(g_ref[:], h_ref[:])
        if not self.momentum:
            out_ref[:] = jax.lax.fori_loop(0, self.iters, body, u_ref[:])
            return
        bnum = np.int32(self._beta_num)
        bden = np.int32(self.beta_den)

        def mbody(i, carry):
            x, xp = carry
            y = jnp.clip(x + ((bnum * (x - xp)) >> bden), -127, 127)
            return body(i, y), x

        x0 = u_ref[:]
        x_final, _ = jax.lax.fori_loop(0, self.iters, mbody, (x0, x0))
        out_ref[:] = x_final

    def _kernel_packed(self, w_ref, g_ref, h_ref, out_ref):
        """Packed-I/O variant: words in, words out, grouped lane order."""
        # bitcast, NOT astype: uint32->int32 value conversion of words with
        # the top bit set is implementation-defined on overflow (Mosaic
        # clamps, CPU wraps) -- this must be a reinterpretation
        w = jax.lax.bitcast_convert_type(w_ref[:], jnp.int32)  # (R, C)
        # grouped unpack: column k*C+j holds lane k of word j
        lanes0 = jnp.concatenate(
            [
                jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(w, jnp.int32(24 - 8 * k)),
                    jnp.int32(24),
                )
                for k in range(4)
            ],
            axis=1,
        )                                            # (R, 4C) int32
        body = self._body(g_ref[:], h_ref[:])
        lanes = jax.lax.fori_loop(0, self.iters, body, lanes0)
        cols = lanes.shape[1] // 4
        out = jnp.zeros((lanes.shape[0], cols), jnp.int32)
        for k in range(4):
            blk = lanes[:, k * cols : (k + 1) * cols]  # static slice
            out = out | jax.lax.shift_left(
                blk & jnp.int32(0xFF), jnp.int32(8 * k)
            )
        out_ref[:] = jax.lax.bitcast_convert_type(out, jnp.uint32)

    @functools.cached_property
    def _call(self):
        qqp = self.qqp
        br = self.block_rows
        k = self.mxu_pack
        cols = k * qqp.padded
        if br % k:
            raise ValueError("block_rows must divide by mxu_pack")
        from pint_tpu.ops.pallas import on_tpu_backend

        interpret = (
            self.interpret
            if self.interpret is not None
            else not on_tpu_backend()
        )

        if self.packed_io:
            if k != 1:
                raise ValueError("packed_io does not combine with mxu_pack")
            if not interpret:
                raise NotImplementedError(
                    "packed_io is interpret-mode only: Mosaic miscompiles "
                    "the 16-lane concat/slice shuffles on TPU (lane-2 bytes "
                    "zeroed; see docstring). Use packed_io=False."
                )
            C = qqp.padded // 4
            # grouped column gc = lane_k*C + word_j  <->  lane index 4j+k
            perm = np.array(
                [4 * (gc % C) + gc // C for gc in range(qqp.padded)]
            )
            hq_g = qqp.Hq[np.ix_(perm, perm)]

            def run_packed(u_words: Array, g_pre: Array) -> Array:
                batch = u_words.shape[0]
                rows = -(-batch // br) * br
                pad = rows - batch
                if pad:
                    u_words = jnp.concatenate(
                        [u_words, jnp.zeros((pad, C), u_words.dtype)]
                    )
                    g_pre = jnp.concatenate(
                        [g_pre, jnp.zeros((pad, qqp.padded), g_pre.dtype)]
                    )
                g_g = g_pre[:, perm]
                wspec = pl.BlockSpec(
                    (br, C), lambda i: (i, 0), memory_space=pltpu.VMEM
                )
                lspec = pl.BlockSpec(
                    (br, qqp.padded), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                )
                out = pl.pallas_call(
                    self._kernel_packed,
                    out_shape=jax.ShapeDtypeStruct((rows, C), jnp.uint32),
                    grid=(rows // br,),
                    in_specs=[
                        wspec,
                        lspec,
                        pl.BlockSpec(
                            (qqp.padded, qqp.padded), lambda i: (0, 0),
                            memory_space=pltpu.VMEM,
                        ),
                    ],
                    out_specs=wspec,
                    interpret=interpret,
                )(u_words, g_g, jnp.asarray(hq_g))
                return out[:batch]

            return jax.jit(run_packed)

        def run(u_words: Array, g_pre: Array) -> Array:
            batch = u_words.shape[0]
            lanes = unpack_controls(u_words)         # (B, Tp) int32, XLA side
            rows = -(-batch // br) * br
            pad = rows - batch
            if pad:
                lanes = jnp.concatenate(
                    [lanes, jnp.zeros((pad, qqp.padded), lanes.dtype)]
                )
                g_pre = jnp.concatenate(
                    [g_pre, jnp.zeros((pad, qqp.padded), g_pre.dtype)]
                )
            # fold k problems per row (XLA-side view reshape)
            lanes = lanes.reshape(rows // k, cols)
            g2 = g_pre.reshape(rows // k, cols)
            hq = np.zeros((cols, cols), np.int8)
            for i in range(k):
                s = i * qqp.padded
                hq[s : s + qqp.padded, s : s + qqp.padded] = qqp.Hq
            spec = pl.BlockSpec(
                (br // k, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            out_lanes = pl.pallas_call(
                self._kernel,
                out_shape=jax.ShapeDtypeStruct((rows // k, cols), jnp.int32),
                grid=(rows // br,),
                in_specs=[
                    spec,
                    spec,
                    pl.BlockSpec(
                        (cols, cols), lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=spec,
                interpret=interpret,
            )(lanes, g2, jnp.asarray(hq))
            out = out_lanes.reshape(rows, qqp.padded)[:batch]
            return pack_controls(out)

        return jax.jit(run)

    # -- multi-device --------------------------------------------------------

    def dp_sharded(self, mesh):
        """jitted dp-sharded solve over ``mesh``: each device runs the fused
        kernel on its batch shard (no communication; bit-identical).  For tp
        sharding use :class:`pint_tpu.parallel.ShardedPGD` (the gradient
        psum cannot live inside one Pallas kernel)."""
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            lambda u, g: self.solve_words(u, g),
            mesh=mesh,
            in_specs=(P("dp", None), P("dp", None)),
            out_specs=P("dp", None),
            check_vma=False,
        )
        return jax.jit(fn)

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
