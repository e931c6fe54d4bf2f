"""Lane-arithmetic kernels: jnp reference path (:mod:`pint_tpu.ops.word`)
and Pallas TPU kernels (:mod:`pint_tpu.ops.pallas`)."""

from pint_tpu.ops import word

__all__ = ["word"]
