"""Mesh-sharded fixed-point MPC solver (dp x tp, shard_map + psum).

Distribution plan (BASELINE.json: "condensed-QP residual/gradient blocks
reduced via psum/all-reduce over ICI"):

* **dp** shards the problem batch; no cross-device traffic in the solve.
* **tp** shards the condensed horizon dimension ``Tp``.  Every device holds
  the column-block ``Hq[:, cols_r]`` of the int8 Hessian and the iterate
  block ``U[:, cols_r]`` (as packed words).  One PGD iteration:

      partial_r = U_r @ Hq[:, cols_r]^T          (B_loc, Tp)  int32, MXU
      acc      = psum(partial_r, 'tp')           full gradient, ICI ring
      step_r   = -(acc[:, cols_r]*hs + g_r)      local column block
      U_r     <- max_signed(add_signed_saturate(U_r, pack(step_r)), floor)

  The psum of int32 partials is bit-exact and associative, so the
  distributed solve is *deterministic* and identical to the single-device
  result (tested in tests/test_parallel.py).

The whole iteration loop runs inside one `shard_map` region, so XLA sees a
static loop of matmul+psum and can schedule the collective permutes onto ICI
without host round-trips.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pint_tpu.models.dynamics import CONTROL_LAYOUT, pack_controls, unpack_controls
from pint_tpu.mpc.condensed import QuantizedQP
from pint_tpu.ops import word as W

shard_map = jax.shard_map

Array = jax.Array

__all__ = ["ShardedPGD"]


@dataclasses.dataclass(frozen=True)
class ShardedPGD:
    """dp x tp sharded PGD solver for one quantized QP."""

    qqp: QuantizedQP
    mesh: Mesh
    iters: int = 40
    momentum: bool = False
    """Nesterov extrapolation (see mpc/accelerated.py): the second iterate
    plane shards exactly like the first; bit-identical to AcceleratedPGD."""
    beta_den: int = 8

    def __post_init__(self):
        tp = self.mesh.shape["tp"]
        if self.qqp.padded % (4 * tp):
            raise ValueError(
                f"padded horizon {self.qqp.padded} must divide into "
                f"4-lane words across tp={tp}"
            )

    @functools.cached_property
    def tp(self) -> int:
        return self.mesh.shape["tp"]

    @functools.cached_property
    def block(self) -> int:
        """Horizon lanes per tp rank."""
        return self.qqp.padded // self.tp

    @property
    def Hq_dev(self) -> Array:
        return jnp.asarray(self.qqp.Hq)  # (Tp, Tp) int8

    @property
    def lower_words(self) -> Array:
        w = 0
        for off in CONTROL_LAYOUT.offsets:
            w |= (-127 & 0xFF) << off
        return jnp.full((1,), np.uint32(w), jnp.uint32)

    # -- the shard-local iteration ------------------------------------------

    def _local_iterate(self, u_words: Array, g_pre: Array, Hq_cols: Array):
        """One PGD step on this rank's (B_loc, block) column block.

        u_words: (B_loc, block/4) uint32; g_pre: (B_loc, block) int32;
        Hq_cols: (Tp, block) int8 -- our columns of Hq.
        """
        lanes = unpack_controls(u_words)  # (B_loc, block) int32
        partial = jax.lax.dot_general(
            lanes.astype(jnp.int8),
            Hq_cols,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B_loc, Tp): contribution of our U block to every gradient row
        acc = jax.lax.psum(partial, "tp")  # full gradient, exact int32
        r = jax.lax.axis_index("tp")
        acc_blk = jax.lax.dynamic_slice_in_dim(
            acc, r * self.block, self.block, axis=1
        )
        pre = (acc_blk * np.int32(self.qqp.hs_num)) >> np.int32(self.qqp.hs_den)
        step = -(pre + g_pre)
        half = np.int32(1 << (self.qqp.g_shift - 1))
        delta = jnp.clip((step + half) >> np.int32(self.qqp.g_shift), -128, 127)
        u_words = W.add_signed_saturate(
            CONTROL_LAYOUT, u_words, pack_controls(delta)
        )
        u_words = W.max_signed(
            CONTROL_LAYOUT,
            u_words,
            jnp.broadcast_to(self.lower_words, u_words.shape),
        )
        return u_words

    @functools.cached_property
    def _beta_num(self) -> int:
        eig = np.linalg.eigvalsh(self.qqp.qp.H)
        kappa = float(eig.max() / max(eig.min(), 1e-12))
        rk = np.sqrt(kappa)
        return int(round((rk - 1.0) / (rk + 1.0) * (1 << self.beta_den)))

    def _local_solve(self, u_words: Array, g_pre: Array, Hq: Array):
        r = jax.lax.axis_index("tp")
        Hq_cols = jax.lax.dynamic_slice_in_dim(
            Hq, r * self.block, self.block, axis=1
        )

        if self.momentum:
            bnum = np.int32(self._beta_num)
            bden = np.int32(self.beta_den)

            def mbody(_, carry):
                x_words, xp_words = carry
                x = unpack_controls(x_words)
                xp = unpack_controls(xp_words)
                y = jnp.clip(x + ((bnum * (x - xp)) >> bden), -127, 127)
                y_words = pack_controls(y)
                return (
                    self._local_iterate(y_words, g_pre, Hq_cols),
                    x_words,
                )

            u_words, _ = jax.lax.fori_loop(
                0, self.iters, mbody, (u_words, u_words)
            )
        else:

            def body(_, u):
                return self._local_iterate(u, g_pre, Hq_cols)

            u_words = jax.lax.fori_loop(0, self.iters, body, u_words)
        # residual diagnostic: global L1 of the final gradient block,
        # reduced over BOTH mesh axes (the "residual blocks reduced via
        # psum" path of BASELINE.json)
        lanes = unpack_controls(u_words)
        partial = jax.lax.dot_general(
            lanes.astype(jnp.int8),
            Hq_cols,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = jax.lax.psum(partial, "tp")
        r_blk = jax.lax.dynamic_slice_in_dim(acc, r * self.block, self.block, 1)
        pre = (r_blk * np.int32(self.qqp.hs_num)) >> np.int32(self.qqp.hs_den)
        grad = pre + g_pre
        residual = jax.lax.psum(
            jnp.sum(jnp.abs(grad).astype(jnp.float32)), ("dp", "tp")
        )
        return u_words, residual

    # -- public API ---------------------------------------------------------

    @functools.cached_property
    def solve_words(self):
        """jitted (u_words (B, Tp/4), g_pre (B, Tp)) -> (words, residual),
        sharded dp over batch and tp over horizon."""
        fn = shard_map(
            self._local_solve,
            mesh=self.mesh,
            in_specs=(P("dp", "tp"), P("dp", "tp"), P(None, None)),
            out_specs=(P("dp", "tp"), P()),
        )
        return jax.jit(
            lambda u, g: fn(u, g, self.Hq_dev)
        )

    def init_words(self, batch: int) -> Array:
        sharding = NamedSharding(self.mesh, P("dp", "tp"))
        return jax.device_put(
            jnp.zeros((batch, self.qqp.padded // 4), jnp.uint32), sharding
        )

    def place_g(self, g_pre: np.ndarray) -> Array:
        sharding = NamedSharding(self.mesh, P("dp", "tp"))
        return jax.device_put(jnp.asarray(g_pre), sharding)

    def solve(self, x0_phys: np.ndarray) -> Tuple[Array, Array, Array]:
        """End-to-end sharded solve; returns (words, u_phys, residual)."""
        g_pre = self.place_g(self.qqp.g_lane_fixed(np.atleast_2d(x0_phys)))
        u0 = self.init_words(g_pre.shape[0])
        words, residual = self.solve_words(u0, g_pre)
        lanes = unpack_controls(words)[:, : self.qqp.horizon]
        return (
            words,
            lanes.astype(jnp.float32) * np.float32(self.qqp.u_scale),
            residual,
        )
