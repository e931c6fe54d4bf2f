from pint_tpu.models.quadrotor import PlanarQuadrotor
from pint_tpu.models.dynamics import (
    CONTROL_LAYOUT,
    DoubleIntegrator,
    Unicycle,
    pack_controls,
    unpack_controls,
)
from pint_tpu.models.pendulum import Pendulum

__all__ = [
    "CONTROL_LAYOUT",
    "DoubleIntegrator",
    "Unicycle",
    "PlanarQuadrotor",
    "Pendulum",
    "pack_controls",
    "unpack_controls",
]
