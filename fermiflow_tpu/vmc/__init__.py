from fermiflow_tpu.vmc.local_energy import y_grad_laplacian, divergence_fwd
from fermiflow_tpu.vmc.gs import GSVMC
from fermiflow_tpu.vmc.beta import BetaVMC

__all__ = ["y_grad_laplacian", "divergence_fwd", "GSVMC", "BetaVMC"]
