from pint_tpu.mpc.condensed import (
    CondensedQP,
    QuantizedQP,
    condense_double_integrator,
    quantize,
)
from pint_tpu.mpc.solver import FixedPointPGD

__all__ = [
    "CondensedQP",
    "QuantizedQP",
    "condense_double_integrator",
    "quantize",
    "FixedPointPGD",
]
