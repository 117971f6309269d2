import os
os.environ["JAX_ENABLE_X64"] = "1"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

from fermiflow_tpu.nn import backflow_init_gaussian
from fermiflow_tpu.nn.backflow_derivs import backflow_field_tensors
from fermiflow_tpu.physics import HO2D, FreeFermion
from fermiflow_tpu.vmc.hessian_flow import base_val_grad_hess, hessian_flow
from fermiflow_tpu.ops.pallas_hessian_flow import hessian_flow_pallas

orb = HO2D(); bd = FreeFermion(orb)
occ = np.arange(3, dtype=np.int32)
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
params64 = jax.tree.map(lambda a: a.astype(jnp.float64),
                        backflow_init_gaussian(k1, 8, 8, std=0.3))
params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params64)
B = 256
z64 = jax.random.normal(k2, (B, 3, 2), dtype=jnp.float64)
z32 = z64.astype(jnp.float32)
y64, g64, H64 = base_val_grad_hess(lambda zs: bd.log_prob(occ, (), zs), z64)
y32, g32, H32 = (a.astype(jnp.float32) for a in (y64, g64, H64))

for method in ("rk4", "dopri5"):
    ref = hessian_flow(backflow_field_tensors, params64, z64, y64, g64, H64,
                       0.0, 1.0, steps=8, method=method)
    xla32 = hessian_flow(backflow_field_tensors, params32, z32, y32, g32, H32,
                         0.0, 1.0, steps=8, method=method)
    pal32 = hessian_flow_pallas(params32, z32, y32, g32, H32,
                                0.0, 1.0, steps=8, method=method, interpret=True)
    for name, r, a, b in zip(("x", "logp", "g", "H"), ref, xla32, pal32):
        ea = float(jnp.max(jnp.abs(np.asarray(r, np.float64) - np.asarray(a, np.float64))))
        eb = float(jnp.max(jnp.abs(np.asarray(r, np.float64) - np.asarray(b, np.float64))))
        scale = float(jnp.max(jnp.abs(r)))
        print(f"{method} {name}: |ref|max {scale:9.3f}  xla-f32 err {ea:.3e}  pallas err {eb:.3e}")
        assert eb < max(3.0 * ea, 1e-5 * scale + 1e-6), (method, name, ea, eb)

# mu=None variant
p64 = {"eta": params64["eta"], "mu": None}
p32 = {"eta": params32["eta"], "mu": None}
ref = hessian_flow(backflow_field_tensors, p64, z64, y64, g64, H64, 0.0, 1.0, steps=4, method="rk4")
pal = hessian_flow_pallas(p32, z32, y32, g32, H32, 0.0, 1.0, steps=4, method="rk4", interpret=True)
for name, r, b in zip(("x", "logp", "g", "H"), ref, pal):
    eb = float(jnp.max(jnp.abs(np.asarray(r, np.float64) - np.asarray(b, np.float64))))
    scale = float(jnp.max(jnp.abs(r)))
    print(f"nomu {name}: |ref|max {scale:9.3f}  pallas err {eb:.3e}")
    assert eb < 1e-4 * scale + 1e-5
print("ALL OK")
