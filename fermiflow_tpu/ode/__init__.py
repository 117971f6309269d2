from fermiflow_tpu.ode.integrators import odeint, odeint_trajectory, TABLEAUS
from fermiflow_tpu.ode.adjoint import odeint_adjoint
from fermiflow_tpu.ode.adaptive import odeint_adaptive

__all__ = [
    "odeint",
    "odeint_trajectory",
    "odeint_adjoint",
    "odeint_adaptive",
    "TABLEAUS",
]
