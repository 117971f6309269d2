from fermiflow_tpu.nn.mlp import (
    mlp_init_zeros,
    mlp_init_gaussian,
    mlp_apply,
    mlp_grad,
)
from fermiflow_tpu.nn.backflow import (
    backflow_apply,
    backflow_divergence,
    backflow_init_zeros,
    backflow_init_gaussian,
)

__all__ = [
    "mlp_init_zeros",
    "mlp_init_gaussian",
    "mlp_apply",
    "mlp_grad",
    "backflow_apply",
    "backflow_divergence",
    "backflow_init_zeros",
    "backflow_init_gaussian",
]
