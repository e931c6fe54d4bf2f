from pint_tpu.models.quadrotor import PlanarQuadrotor
from pint_tpu.models.dynamics import (
    CONTROL_LAYOUT,
    DoubleIntegrator,
    Unicycle,
    pack_controls,
    unpack_controls,
)

__all__ = [
    "CONTROL_LAYOUT",
    "DoubleIntegrator",
    "Unicycle",
    "PlanarQuadrotor",
    "pack_controls",
    "unpack_controls",
]
