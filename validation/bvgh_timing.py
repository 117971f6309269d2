"""Time the base (value, grad, Hessian) evaluation: closed-form determinant
calculus (physics/slater.logdet_vgh) vs nested autodiff
(vmc/hessian_flow.base_val_grad_hess), at the production GS bench config
(N=6, batch 8192, f32, one TPU chip).

Protocol: KR reps inside one jitted fori_loop, value fetched at the end
(CLAUDE.md timing rules for the tunneled platform); prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.physics import HO2D, FreeFermion
from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess

NUP, BATCH, KR = 6, 8192, 50


def time_one(fn, z):
    @jax.jit
    def run(z):
        def body(i, acc):
            y, g, H = fn(z + 0.0 * i)
            return acc + y.sum() + g.sum() + jnp.trace(
                H, axis1=-2, axis2=-1).sum()
        return jax.lax.fori_loop(0, KR, body, jnp.zeros((), z.dtype))

    np.asarray(run(z))  # compile + warm
    t0 = time.perf_counter()
    out = run(z)
    np.asarray(out)
    return (time.perf_counter() - t0) / KR, float(out)


def main():
    orb = HO2D()
    bd = FreeFermion(orb)
    occ = tuple(range(NUP))
    dtype = jnp.float32 if jax.devices()[0].platform == "tpu" else jnp.float64
    z = jax.random.normal(jax.random.PRNGKey(0), (BATCH, NUP, 2), dtype=dtype)

    t_auto, v_auto = time_one(
        lambda zz: base_val_grad_hess(
            lambda zs: bd.log_prob(occ, (), zs), zz), z)
    t_cf, v_cf = time_one(lambda zz: bd.log_prob_vgh(occ, (), zz), z)

    print(json.dumps({
        "config": f"N={NUP} batch={BATCH} reps={KR}",
        "bvgh_autodiff_s": round(t_auto, 6),
        "bvgh_closed_form_s": round(t_cf, 6),
        "speedup": round(t_auto / t_cf, 2),
        "checksum_rel_diff": abs(v_auto - v_cf) / max(abs(v_auto), 1e-9),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
