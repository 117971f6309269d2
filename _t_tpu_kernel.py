import sys, time
import jax, jax.numpy as jnp, numpy as np

from fermiflow_tpu.nn import backflow_init_gaussian
from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
from fermiflow_tpu.physics import HO2D, FreeFermion
from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess, hessian_flow
from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas

NUP = int(sys.argv[1]) if len(sys.argv) > 1 else 6
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
REPS = 10

orb = HO2D(); bd = FreeFermion(orb)
occ = np.arange(NUP, dtype=np.int32)
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
params = jax.tree.map(lambda a: a.astype(jnp.float32),
                      backflow_init_gaussian(k1, 50, 50, std=0.01))
z = jax.random.normal(k2, (B, NUP, 2), dtype=jnp.float32)
y0, g0, H0 = base_val_grad_hess(lambda zs: bd.log_prob(occ, (), zs), z)

def timed(name, fn):
    out = fn(); np.asarray(jax.tree.leaves(out)[0])
    out = fn(); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn()
    v = np.asarray(jax.tree.leaves(out)[3])  # H
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:24s} {dt*1e3:9.2f} ms  (|H|max {float(np.abs(v).max()):.4f})")
    return out

def rep(body):
    @jax.jit
    def fn():
        def step(c, _):
            x, y, g, H = body(c[0], c[1], c[2], c[3])
            return (x, y, g, H), None
        out, _ = jax.lax.scan(step, (z, y0, g0, H0), None, length=REPS)
        return out
    return fn

o1 = timed("hflow XLA", rep(lambda zz, yy, gg, HH: hessian_flow(
    backflow_field_tensors, params, zz, yy, gg, HH, 0.0, 1.0, steps=STEPS)))
for bw in (128, 64):
    try:
        o2 = timed(f"hflow pallas bw={bw}", rep(lambda zz, yy, gg, HH: hessian_flow_pallas(
            params, zz, yy, gg, HH, 0.0, 1.0, steps=STEPS, block_walkers=bw)))
    except Exception as e:
        print(f"bw={bw}: FAILED {str(e)[:200]}")
        continue
for name, a, b in zip(("x", "logp", "g", "H"), o1, o2):
    err = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(a)))
    print(f"  {name}: max abs diff {err:.3e} (scale {scale:.2f})")
