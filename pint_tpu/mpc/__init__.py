from pint_tpu.mpc.condensed import (
    CondensedQP,
    QuantizedQP,
    condense_double_integrator,
    condense_lti,
    condense_ltv,
    dare_terminal,
    quantize,
)
from pint_tpu.mpc.accelerated import AcceleratedPGD
from pint_tpu.mpc.constrained import (
    ConstrainedController,
    ConstrainedPGD,
    StateConstrainedQP,
    constrain_states,
    quantize_constrained,
)
from pint_tpu.mpc.controller import LTIController, RecedingHorizonController
from pint_tpu.mpc.device_constrained import DeviceConstrainedSQP
from pint_tpu.mpc.device_sqp import DeviceSQP
from pint_tpu.mpc.fused import FusedPGD
from pint_tpu.mpc.ltv import QuantizedSQP, SQPController
from pint_tpu.mpc.mppi import QuantizedMPPI, unicycle_goal_cost
from pint_tpu.mpc.nonlinear import QuantizedNonlinearPGD
from pint_tpu.mpc.solver import FixedPointPGD
from pint_tpu.mpc.sqp_constrained import ConstrainedSQP

__all__ = [
    "CondensedQP",
    "QuantizedQP",
    "condense_double_integrator",
    "condense_lti",
    "condense_ltv",
    "dare_terminal",
    "quantize",
    "FixedPointPGD",
    "AcceleratedPGD",
    "ConstrainedController",
    "ConstrainedPGD",
    "StateConstrainedQP",
    "constrain_states",
    "quantize_constrained",
    "FusedPGD",
    "RecedingHorizonController",
    "LTIController",
    "QuantizedMPPI",
    "QuantizedNonlinearPGD",
    "QuantizedSQP",
    "DeviceConstrainedSQP",
    "DeviceSQP",
    "SQPController",
    "ConstrainedSQP",
    "unicycle_goal_cost",
]
