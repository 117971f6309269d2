"""Phase-level timing of the GS train step on the attached TPU chip.

Runs R reps of each phase inside ONE jitted lax.scan program (eager
dispatches cost O(100 ms) through the tunnel — see CLAUDE.md) and forces a
value fetch. Usage: python examples/profile_step.py [nup] [batch] [ode_steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config

nup = int(sys.argv[1]) if len(sys.argv) > 1 else 6
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
ode_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 16
REPS = 10

cfg = Config(nup=nup, Z=0.5, batch=batch, ode_steps=ode_steps, dtype="float32",
             pallas_sampler=True)
model, params = common.build_gs(cfg)
dtype = cfg.jnp_dtype()

key = jax.random.PRNGKey(0)
z0 = jax.random.normal(key, (batch, model.n, 2), dtype=dtype)


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)  # compile + 2nd-call layout warmup
    np.asarray(jax.tree.leaves(out)[0])
    out = jfn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = jfn(*args)
    v = np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:30s} {dt*1e3:9.2f} ms/call  (check {float(v.ravel()[0]):.4f})")
    return dt


def rep(body):
    """Scan body REPS times with a data dependency."""
    def fn(x):
        def step(c, _):
            return body(c), None
        out, _ = jax.lax.scan(step, x, None, length=REPS)
        return out
    return fn


# 1. generate ODE (forward flow)
timed("generate (fwd ODE)", rep(lambda z: model.cnf.generate(params, z)), z0)

# 2. logp (reverse ODE, value only)
timed("log_prob (rev ODE)", rep(lambda z: z + jnp.mean(
    model.log_prob(params, z)) * 0), z0)

# 3. local energy (y_grad_laplacian)
def le(z):
    eloc, _ = model.local_energy(params, z)
    return z + jnp.mean(eloc) * 0
timed("local_energy (laplacian)", rep(le), z0)

# 4. full loss grad
def lg(z):
    (loss, m), g = jax.value_and_grad(model.loss_and_metrics, has_aux=True)(params, z)
    return z + loss * 0
timed("value_and_grad(loss)", rep(lg), z0)

# 5. Hessian-flow local energy (forward augmented ODE, closed-form tensors)
def le_hf(z):
    x, eloc, logp = model.local_energy_from_base(params, z)
    return z + jnp.mean(eloc) * 0
timed("local_energy (hessian flow)", rep(le_hf), z0)

# 6. full loss grad through the Hessian-flow path
def lg_hf(z):
    (loss, m), g = jax.value_and_grad(
        model.loss_and_metrics_from_base, has_aux=True
    )(params, z)
    return z + loss * 0
timed("value_and_grad(loss hflow)", rep(lg_hf), z0)

# 7/8. fused Pallas Hessian-flow kernel (TPU; --pallas)
if "--pallas" in sys.argv:
    def le_pl(z):
        x, eloc, logp = model.local_energy_from_base(params, z, backend="pallas")
        return z + jnp.mean(eloc) * 0
    timed("local_energy (pallas hflow)", rep(le_pl), z0)

    def lg_pl(z):
        (loss, m), g = jax.value_and_grad(
            lambda p, zz: model.loss_and_metrics_from_base(
                p, zz, backend="pallas"
            ),
            has_aux=True,
        )(params, z)
        return z + loss * 0
    timed("value_and_grad(loss pallas)", rep(lg_pl), z0)
