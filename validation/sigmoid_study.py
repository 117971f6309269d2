"""Measure the hflow kernel's transcendental-chain cost (r4 VERDICT #8).

The Hessian-flow kernel's inner loop evaluates, per hidden unit and pair row,
one sigmoid (exp + reciprocal, both EUP ops) and derives s', s'', s''' from it
via polynomial identities (ops/pallas_hessian_flow._mlp4_block).  The round-4
deferral note modeled a sufficiently-accurate rational replacement at ~14
flop-equivalents vs exp's ~8 and predicted "no clear win" — this script
replaces the model with a measurement:

  * stock  — the shipped exp-based sigmoid.
  * poly3  — a 3-flop cubic stand-in (WRONG numerics, same dataflow).  This
    is the cost CEILING of any transcendental optimization: if even a
    ~free sigmoid doesn't move the kernel, the direction is dead regardless
    of which approximation could pass the accuracy gates.
  * pade76 — a realistic candidate: sigmoid via clamped Pade(7,6) tanh
    (1 div + ~11 mul/add).  Only competitive if poly3 shows headroom.

Timing protocol per CLAUDE.md: KR launches inside one jitted fori_loop,
value-fetch to force completion, warm-up call first.  Monkeypatching
phf._sigmoid requires phf.hessian_flow_pallas.clear_cache() to force a
retrace (the function is jit-decorated at module level).

RESULT (validation/runs/hflow_sigmoid_study.json, N=6 b8192 ode8 dopri5):
stock 4.585 ms/launch, poly3 floor 3.796 ms (ceiling gain 17.2% of this one
kernel, ~0.8 ms of the 6.3 ms ode8 production step), pade76 5.715 ms —
the realistic rational is 25% SLOWER than exp: the VPU's native exp beats
the ~12-op rational chain outright.  Negative result; the exp-based sigmoid
stays.  (Note the identical checksums across variants are by construction:
params are backflow_init_zeros, so w2 = 0 zeroes every MLP contribution
regardless of the sigmoid — timing is unaffected since the kernel computes
the full chain on runtime arguments; nothing constant-folds.)

Writes validation/runs/hflow_sigmoid_study.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import fermiflow_tpu.ops.pallas_hessian_flow as phf
from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess
from fermiflow_tpu.physics import HO2D, FreeFermion
from __graft_entry__ import _build

NUP, BATCH, KR, ODE_STEPS = 6, 8192, 20, 8

_stock_sigmoid = phf._sigmoid


def _poly3(z):
    # Cost floor stand-in (~3 flops), NOT a sigmoid approximation.
    return 0.5 + z * (0.25 - 0.02 * (z * z))


def _pade76(z):
    # sigmoid(z) = 0.5 * (1 + tanh(z/2)); tanh via clamped Pade(7,6).
    h = jnp.clip(0.5 * z, -4.0, 4.0)
    h2 = h * h
    num = h * (135135.0 + h2 * (17325.0 + h2 * (378.0 + h2)))
    den = 135135.0 + h2 * (62370.0 + h2 * (3150.0 + h2 * 28.0))
    return 0.5 + 0.5 * (num / den)


def main():
    assert jax.devices()[0].platform == "tpu", "TPU-only measurement"
    dtype = jnp.float32
    model, params = _build(dtype, nup=NUP, ode_steps=ODE_STEPS)
    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(NUP, dtype=np.int32)

    z = jax.random.normal(jax.random.PRNGKey(0), (BATCH, NUP, 2), dtype)
    y0, g0, H0 = jax.jit(
        lambda zz: base_val_grad_hess(lambda zs: bd.log_prob(occ, (), zs), zz)
    )(z)

    def time_variant(name, fn):
        phf._sigmoid = fn
        phf.hessian_flow_pallas.clear_cache()

        @jax.jit
        def run(p, zz, y, g, H):
            def body(i, acc):
                x, lp, gg, HH = phf.hessian_flow_pallas(
                    p, zz, y + 0.0 * i, g, H, 0.0, 1.0,
                    steps=ODE_STEPS, method="dopri5")
                return acc + lp.sum() + jnp.trace(
                    HH, axis1=-2, axis2=-1).sum()
            return jax.lax.fori_loop(0, KR, body, jnp.zeros((), jnp.float32))

        tc = time.monotonic()
        out = run(params, z, y0, g0, H0)
        val = float(out)  # force completion (block_until_ready unreliable)
        compile_s = time.monotonic() - tc
        t0 = time.perf_counter()
        val = float(run(params, z, y0, g0, H0))
        dt = (time.perf_counter() - t0) / KR
        print(f"{name}: {dt*1e3:.3f} ms/launch (compile+warm {compile_s:.0f}s,"
              f" checksum {val:.6g})", flush=True)
        return {"seconds_per_launch": dt, "compile_s": round(compile_s, 1),
                "checksum": val}

    results = {
        "config": f"N={NUP} batch={BATCH} ode_steps={ODE_STEPS} dopri5 KR={KR}",
        "stock": time_variant("stock", _stock_sigmoid),
        "poly3_cost_floor": time_variant("poly3", _poly3),
    }
    ceiling_gain = 1.0 - (results["poly3_cost_floor"]["seconds_per_launch"]
                          / results["stock"]["seconds_per_launch"])
    results["ceiling_gain_fraction"] = round(ceiling_gain, 4)
    # Only measure the realistic rational if the ceiling shows real headroom.
    if ceiling_gain > 0.05:
        results["pade76"] = time_variant("pade76", _pade76)
    phf._sigmoid = _stock_sigmoid
    phf.hessian_flow_pallas.clear_cache()

    out_path = os.path.join(os.path.dirname(__file__), "runs",
                            "hflow_sigmoid_study.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
