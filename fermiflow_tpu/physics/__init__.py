from fermiflow_tpu.physics.orbitals import HO2D, hermite_functions
from fermiflow_tpu.physics.slater import (
    log_abs_slater_det,
    log_abs_slater_det_multstates,
    slater_matrix,
    slater_matrix_multstates,
)
from fermiflow_tpu.physics.base_dist import FreeFermion
from fermiflow_tpu.physics.potentials import (
    HOPotential,
    CoulombPairPotential,
    pairwise_distances,
)

__all__ = [
    "HO2D",
    "hermite_functions",
    "log_abs_slater_det",
    "log_abs_slater_det_multstates",
    "slater_matrix",
    "slater_matrix_multstates",
    "FreeFermion",
    "HOPotential",
    "CoulombPairPotential",
    "pairwise_distances",
]
