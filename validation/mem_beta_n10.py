"""Compiled-memory analysis of the finite-T train step at the largest
enumerated problem (N=10, deltaE=4 -> 1781 states, batch 2048) — the
config of validation/runs/beta_n10_de4.jsonl.  Prints one JSON line with
XLA's memory_analysis of the K=10 scanned production program.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python -m validation.mem_beta_n10
"""

import json

import jax
import optax

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config
from fermiflow_tpu.train import (init_beta_state, make_beta_train_step,
                                 make_multi_step)


def main():
    cfg = Config(
        nup=10, ndown=0, Z=0.5, beta=1.0, deltaE=4.0, boltzmann=True,
        batch=2048, ode_steps=8, dtype="float32", lr=3e-3,
        persistent_walkers=True, steps_per_call=10,
    )
    common.setup_precision(cfg)
    model, params = common.build_beta(cfg)
    optimizer = optax.adam(cfg.lr)
    state = init_beta_state(model, params, cfg, optimizer)
    raw = make_beta_train_step(model, optimizer, cfg, jit=False)
    step = make_multi_step(raw, cfg.steps_per_call)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(state).compile()
    m = compiled.memory_analysis()
    # With donate_argnums the output aliases the donated input, so
    # argument + output + temp double-counts the aliased bytes; subtract
    # alias_size_in_bytes so the reported peak is XLA's actual bound.
    alias = getattr(m, "alias_size_in_bytes", 0)
    print(json.dumps({
        "config": "beta=1 N=10 deltaE=4 Nstates=1781 batch=2048 K=10",
        "argument_mib": round(m.argument_size_in_bytes / 2**20, 3),
        "output_mib": round(m.output_size_in_bytes / 2**20, 3),
        "temp_mib": round(m.temp_size_in_bytes / 2**20, 3),
        "alias_mib": round(alias / 2**20, 3),
        "peak_hbm_mib": round(
            (m.argument_size_in_bytes + m.output_size_in_bytes
             + m.temp_size_in_bytes - alias) / 2**20, 3),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
