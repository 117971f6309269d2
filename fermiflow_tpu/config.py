"""Single experiment configuration dataclass.

The reference scatters hyperparameters across two near-duplicate argparse
blocks and hardcoded constants (SURVEY.md §5: Adam lr at
``src/FermionHO2D.py:61``, MCMC constants at ``src/base_dist.py:59``, ODE
tolerances at ``src/NeuralODE/nnModule.py:162``, MLP init std at
``src/MLP.py:25``).  Here every knob lives in one serializable dataclass,
shared by both CLIs, the benchmark, and the checkpoints.
"""

from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass
class Config:
    # physics / model
    nup: int = 6
    ndown: int = 0
    Z: float = 0.5  # Coulomb coupling strength
    beta: float = 2.0  # inverse temperature (finite-T only)
    deltaE: float = 2.0  # excitation-energy cutoff (finite-T only)
    boltzmann: bool = False  # Boltzmann init of state logits (finite-T only)

    # flow network
    d_eta: int = 50  # hidden size of the two-body MLP (reference --Deta)
    d_mu: int | None = 50  # hidden size of the one-body MLP; None = --nomu
    t0: float = 0.0
    t1: float = 1.0

    # ODE solver.  Default grid backed by the trained-params error study
    # (validation/ode_steps_study.py, docs/VALIDATION.md): at converged N=6
    # parameters the 4-step dopri5 grid gives |dE| ~ 8e-10 and gradient
    # rel-err 1.6e-8 vs a 256-step grid — five orders below the batch-8192
    # MC error and TIGHTER than the reference's own adaptive envelope
    # (rtol 1e-6, src/NeuralODE/nnModule.py:161-162).  The round-5 flagship
    # retrain at ode_steps=4 (validation/runs/gs_n6_z05_r5_ode4*.jsonl)
    # converges to E = 18.1606(5), identical to the ode_steps=8 flagship
    # (18.1602(1)), at ~20% less step time; 8 remains available via
    # --ode-steps for extra margin.
    ode_steps: int = 4
    ode_method: str = "dopri5"
    ode_solver: str = "fixed"  # generate path: fixed | adaptive | adjoint
    rtol: float = 1e-6
    atol: float = 1e-8

    # sampler
    batch: int = 8000
    equilibrium_steps: int = 100  # reference-compat re-equilibration length
    mcmc_steps: int = 30  # steps per iteration with persistent walkers
    tau: float = 0.1
    persistent_walkers: bool = False  # carry chains + per-walker tau adaptation
    tau_target_accept: float = 0.5
    tau_gain: float = 0.1
    pallas_sampler: bool = False  # fused TPU Metropolis kernel (f32 only)
    pallas_interpret: bool = False  # run the kernel in the TPU interpreter (CPU tests)

    # optimization
    lr: float = 1e-2
    iternum: int = 1000
    # Iterations scanned inside ONE compiled program per dispatch.  On
    # runtimes with high per-launch latency (a tunneled TPU pays a fixed
    # ~31 ms per dispatch plus ~100 ms per metrics fetch) the overhead
    # dominates the ~40 ms step compute; K>1 amortizes it to 1/K while the
    # stacked per-iteration metrics keep full observability.  Pick K dividing
    # checkpoint_every to avoid extra chunk-size compiles.
    steps_per_call: int = 1

    # numerics / runtime
    local_energy: str = "auto"  # auto | hessian_flow | nested_jvp
    pallas_local_energy: bool = False  # fused TPU Hessian-flow kernel (f32, dim=2)
    # Fused REINFORCE-gradient adjoint kernel (ops/pallas_reinforce.py):
    # replaces the reverse-ODE logp solve + autodiff VJP — measured 87% of
    # the train step — with one closed-form backward kernel.  Effective only
    # on the Pallas Hessian-flow path.
    pallas_reinforce: bool = True
    # Automatic failure recovery: on a non-finite energy, restore the latest
    # checkpoint with a reseeded RNG stream, up to this many times (needs
    # checkpoint_dir; 0 = fail fast).
    max_restarts: int = 0
    # Divergence watchdog (finite-but-diverged runs, e.g. an lr spike): the
    # primary metric exceeding the trailing-window mean by `nsigma` window
    # standard deviations, or the per-walker std exploding 10x above the
    # window median, triggers the same restore path as a NaN.  The window
    # counts the last `divergence_window` healthy iterations; nsigma <= 0 or
    # window <= 0 disables the check.
    divergence_window: int = 50
    divergence_nsigma: float = 10.0
    laplacian_chunk: int | None = None  # batch chunk for the Laplacian engine
    dtype: str = "float64"  # float64 | float32 (bf16 rejected, see jnp_dtype)
    seed: int = 42
    checkpoint_every: int = 100
    checkpoint_dir: str | None = None
    metrics_path: str | None = None

    def jnp_dtype(self):
        import jax.numpy as jnp

        if self.dtype == "bfloat16":
            raise ValueError(
                "dtype='bfloat16' is not supported: the unrolled-GE "
                "determinant and the 2nd/3rd-order derivative chains lose "
                "all signal below float32 (the f32 TPU path already pins "
                "matmul precision HIGHEST at the critical sites). Use "
                "float32 on TPU or float64 on CPU."
            )
        return {"float64": jnp.float64, "float32": jnp.float32}[self.dtype]

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls(**json.loads(s))
