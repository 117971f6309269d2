"""Rank driver for test_two_process_pallas_hessian_flow.

Each of two OS processes runs this script: bring up ``jax.distributed``,
build the GLOBAL 2-device walker mesh, launch the fused Hessian-flow kernel
through its ``jax.shard_map`` wrapper in interpret mode, and check the
sharded result against the single-host XLA engine.  This is the
process-spanning analog of tests/test_hessian_flow.py::
test_pallas_hessian_flow_sharded_matches_single; the full-CLI variant is
impractical here because XLA's CPU backend takes tens of minutes to compile
the interpret-expanded kernel inside the whole SPMD train step.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.nn.backflow import backflow_init_gaussian
from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
from fermiflow_tpu.parallel.mesh import (
    init_distributed,
    make_walker_mesh,
    shard_walkers,
)
from fermiflow_tpu.physics import HO2D, FreeFermion
from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess, hessian_flow


def main():
    coordinator, pid = sys.argv[1], int(sys.argv[2])
    init_distributed(coordinator, 2, pid, initialization_timeout=300)
    assert jax.process_count() == 2 and jax.device_count() == 2
    mesh = make_walker_mesh()

    orb = HO2D()
    bd = FreeFermion(orb)
    occ = np.arange(2, dtype=np.int32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        backflow_init_gaussian(k1, 8, 8, std=0.3),
    )
    z = jax.random.normal(k2, (32, 2, 2), dtype=jnp.float32)
    y0, g0, H0 = base_val_grad_hess(
        lambda zs: bd.log_prob(occ, (), zs), z
    )

    # Reference: plain XLA engine, replicated on the local device.
    ref = jax.jit(
        lambda p, *a: hessian_flow(backflow_field_tensors, p, *a, 0.0, 1.0,
                                   steps=4, method="dopri5")
    )(params, z, y0, g0, H0)

    # Global mesh launch: shard_map + interpret-mode kernel, walkers split
    # across the two PROCESSES.
    from fermiflow_tpu.ops.pallas_hessian_flow import (
        hessian_flow_pallas_sharded,
    )

    zs, ys, gs, Hs = shard_walkers(mesh, (z, y0, g0, H0))
    out = jax.jit(
        lambda p, *a: hessian_flow_pallas_sharded(
            mesh, p, *a, 0.0, 1.0, steps=4, method="dopri5", interpret=True
        )
    )(params, zs, ys, gs, Hs)

    for name, a, b in zip(("x", "logp", "g", "H"), ref, out):
        a = np.asarray(a)
        b = np.asarray(jax.device_get(
            jax.experimental.multihost_utils.process_allgather(
                b, tiled=True)))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)
    print(f"MP_PALLAS_OK rank={pid}")


if __name__ == "__main__":
    import jax.experimental.multihost_utils  # noqa: F401

    main()
