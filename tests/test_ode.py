"""ODE solver tests against closed-form solutions, including high-order
gradients (models reference tests/test_NeuralODE.py / tests/test_odeint.py).

The workhorse problem is the linear ODE dx/dt = a1*a2*x with solution
x(T) = x0 exp(a1 a2 (T - t0)) — every derivative wrt x0, a1, a2 is known in
closed form to any order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fermiflow_tpu.ode import (
    odeint,
    odeint_adaptive,
    odeint_adjoint,
    odeint_trajectory,
)

T = 1.0


def f_linear(params, t, x):
    return params["a1"] * params["a2"] * x


def params0():
    return {"a1": jnp.asarray(0.7), "a2": jnp.asarray(-0.4)}


def x_exact(p, x0, t=T):
    return x0 * jnp.exp(p["a1"] * p["a2"] * t)


@pytest.mark.parametrize("method,steps,tol", [
    ("euler", 4000, 1e-4), ("midpoint", 200, 1e-6), ("rk4", 60, 1e-10),
    ("dopri5", 20, 1e-12),
])
def test_fixed_grid_solution(method, steps, tol):
    p = params0()
    x0 = jnp.asarray([1.0, 2.0, -0.5])
    xT = odeint(f_linear, p, x0, 0.0, T, steps=steps, method=method)
    np.testing.assert_allclose(np.asarray(xT), np.asarray(x_exact(p, x0)), atol=tol)


def test_backward_time_integration():
    """t1 < t0 (the CNF likelihood path integrates in reverse)."""
    p = params0()
    x0 = jnp.asarray(1.5)
    xT = odeint(f_linear, p, x0, 0.0, T, steps=24)
    x_back = odeint(f_linear, p, xT, T, 0.0, steps=24)
    np.testing.assert_allclose(float(x_back), 1.5, atol=1e-12)


def test_gradients_to_third_order():
    """d^k x(T)/da1^k for k = 1, 2, 3 vs closed form (reference
    tests/test_NeuralODE.py asserts up to 3rd order)."""
    x0 = jnp.asarray(1.3)

    def solve(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4)}
        return odeint(f_linear, p, x0, 0.0, T, steps=32, method="dopri5")

    a1 = jnp.asarray(0.7)
    a2 = -0.4
    g1 = jax.grad(solve)(a1)
    g2 = jax.grad(jax.grad(solve))(a1)
    g3 = jax.grad(jax.grad(jax.grad(solve)))(a1)
    base = float(x0) * np.exp(0.7 * a2 * T)
    np.testing.assert_allclose(float(g1), base * a2 * T, atol=1e-10)
    np.testing.assert_allclose(float(g2), base * (a2 * T) ** 2, atol=1e-10)
    np.testing.assert_allclose(float(g3), base * (a2 * T) ** 3, atol=1e-10)


def test_gradient_wrt_initial_condition():
    p = params0()

    def solve(x0):
        return odeint(f_linear, p, x0, 0.0, T, steps=32)

    g = jax.grad(solve)(jnp.asarray(2.0))
    np.testing.assert_allclose(float(g), float(jnp.exp(p["a1"] * p["a2"] * T)), atol=1e-10)


def test_forward_mode_and_remat():
    """jvp through the scan solver (needed by the Laplacian engine) and the
    remat flag give identical results."""
    p = params0()
    x0 = jnp.asarray(1.0)
    fun = lambda a1: odeint(
        f_linear, {"a1": a1, "a2": p["a2"]}, x0, 0.0, T, steps=32
    )
    fun_r = lambda a1: odeint(
        f_linear, {"a1": a1, "a2": p["a2"]}, x0, 0.0, T, steps=32, remat=True
    )
    _, jv = jax.jvp(fun, (jnp.asarray(0.7),), (jnp.asarray(1.0),))
    g_r = jax.grad(fun_r)(jnp.asarray(0.7))
    g = jax.grad(fun)(jnp.asarray(0.7))
    np.testing.assert_allclose(float(jv), float(g), atol=1e-12)
    np.testing.assert_allclose(float(g_r), float(g), atol=1e-12)


def test_tuple_state():
    """Pytree states (the CNF integrates an (x, logp) tuple)."""
    p = params0()

    def f(pp, t, state):
        x, y = state
        return (pp["a1"] * pp["a2"] * x, -y)

    x0 = (jnp.asarray(1.0), jnp.asarray(2.0))
    xT, yT = odeint(f, p, x0, 0.0, T, steps=32)
    np.testing.assert_allclose(float(xT), float(x_exact(p, 1.0)), atol=1e-12)
    np.testing.assert_allclose(float(yT), 2.0 * np.exp(-T), atol=1e-10)


# ---- O(1)-memory adjoint ----

def test_adjoint_value_and_first_gradient():
    x0 = jnp.asarray(1.3)

    def solve(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4)}
        return odeint_adjoint(f_linear, p, x0, 0.0, T, 64, "dopri5")

    a1 = jnp.asarray(0.7)
    np.testing.assert_allclose(
        float(solve(a1)), float(x_exact(params0(), x0)), atol=1e-12
    )
    g = jax.grad(solve)(a1)
    base = float(x0) * np.exp(0.7 * -0.4 * T)
    np.testing.assert_allclose(float(g), base * -0.4 * T, atol=1e-8)


def test_adjoint_second_order_reverse():
    """grad-of-grad through the adjoint (the backward pass is built from
    differentiable primitives, mirroring the reference's create_graph=True)."""
    x0 = jnp.asarray(1.0)

    def solve(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4)}
        return odeint_adjoint(f_linear, p, x0, 0.0, T, 64, "dopri5")

    g2 = jax.grad(jax.grad(solve))(jnp.asarray(0.7))
    base = np.exp(0.7 * -0.4 * T)
    np.testing.assert_allclose(float(g2), base * (0.4 * T) ** 2, atol=1e-7)


def test_adjoint_grad_x0():
    p = params0()

    def solve(x0):
        return odeint_adjoint(f_linear, p, x0, 0.0, T, 64, "dopri5")

    g = jax.grad(solve)(jnp.asarray(2.0))
    np.testing.assert_allclose(
        float(g), float(jnp.exp(p["a1"] * p["a2"] * T)), atol=1e-9
    )


# ---- adaptive dopri5 ----

def test_adaptive_matches_closed_form():
    p = {"a1": jnp.asarray(2.0), "a2": jnp.asarray(1.0)}  # stiff-ish growth
    x0 = jnp.asarray([1.0, -0.3])
    xT = odeint_adaptive(f_linear, p, x0, 0.0, T, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xT), np.asarray(x_exact(p, x0)), rtol=1e-8)


def test_adaptive_tolerance_parity_with_fixed_grid():
    """Reference tolerance regime (rtol=1e-6, atol=1e-8): the fixed-grid
    default must agree with the adaptive solve to better than rtol."""
    p = params0()
    x0 = jnp.asarray(1.7)
    x_fixed = odeint(f_linear, p, x0, 0.0, T, steps=16, method="dopri5")
    x_adapt = odeint_adaptive(f_linear, p, x0, 0.0, T, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(x_fixed), float(x_adapt), rtol=1e-7)


def test_adaptive_differentiable_variant():
    x0 = jnp.asarray(1.0)

    def solve(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4)}
        return odeint_adaptive(
            f_linear, p, x0, 0.0, T, rtol=1e-8, atol=1e-10,
            max_steps=64, differentiable=True,
        )

    g = jax.grad(solve)(jnp.asarray(0.7))
    base = np.exp(0.7 * -0.4 * T)
    np.testing.assert_allclose(float(g), base * -0.4 * T, atol=1e-6)


def test_adaptive_differentiable_float32_grad_finite():
    """float32 exercise of the differentiable variant: the error-norm floor
    must be dtype-aware — a 1e-300 literal underflows to 0.0 in f32, and the
    masked no-op steps' exactly-zero error would then NaN the gradient
    through sqrt (ADVICE r4 / VERDICT r4 weak #6)."""
    x0 = jnp.asarray(1.0, jnp.float32)

    def solve(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4, jnp.float32)}
        return odeint_adaptive(
            f_linear, p, x0, 0.0, T, rtol=1e-4, atol=1e-6,
            max_steps=64, differentiable=True,
        )

    g = jax.grad(solve)(jnp.asarray(0.7, jnp.float32))
    assert np.isfinite(float(g))
    base = np.exp(0.7 * -0.4 * T)
    np.testing.assert_allclose(float(g), base * -0.4 * T, rtol=1e-2)


def test_adaptive_backward_time():
    p = params0()
    xT = x_exact(p, jnp.asarray(1.5))
    x0 = odeint_adaptive(f_linear, p, xT, T, 0.0, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(x0), 1.5, rtol=1e-7)


def test_trajectory_frames():
    p = params0()
    x0 = jnp.asarray(1.0)
    ts = jnp.linspace(0.0, T, 5)
    frames = odeint_trajectory(f_linear, p, x0, ts, steps_per_frame=8)
    want = np.asarray([float(x_exact(p, 1.0, t=float(t))) for t in ts])
    np.testing.assert_allclose(np.asarray(frames), want, atol=1e-9)


def test_adjoint_third_order_reverse():
    """3rd derivatives through the O(1)-memory adjoint — full parity with the
    reference's SolveIVP higher-order tests
    (/root/reference/tests/test_NeuralODE.py:82-116): the backward pass is
    built from differentiable primitives, so reverse-mode nests to any
    order."""
    x0 = jnp.asarray(1.0)

    def solve(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4)}
        return odeint_adjoint(f_linear, p, x0, 0.0, T, 64, "dopri5")

    g3 = jax.grad(jax.grad(jax.grad(solve)))(jnp.asarray(0.7))
    want = np.exp(0.7 * -0.4 * T) * (0.4 * T) ** 3
    np.testing.assert_allclose(float(g3), -want, atol=1e-9)


def test_adjoint_memory_is_step_independent():
    """The point of the adjoint: backward-pass temp memory must not scale
    with ode_steps (the scan solver saves the whole stage trajectory).
    Measured via XLA's compiled memory analysis."""
    xb = jnp.ones((256,))
    STEPS = 2048

    def loss_scan(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4)}
        return jnp.sum(odeint(f_linear, p, xb, 0.0, T, steps=STEPS,
                              method="dopri5"))

    def loss_adj(a1):
        p = {"a1": a1, "a2": jnp.asarray(-0.4)}
        return jnp.sum(odeint_adjoint(f_linear, p, xb, 0.0, T, STEPS,
                                      "dopri5"))

    def temp_bytes(fn):
        c = jax.jit(jax.grad(fn)).lower(jnp.asarray(0.7)).compile()
        return c.memory_analysis().temp_size_in_bytes

    scan_b, adj_b = temp_bytes(loss_scan), temp_bytes(loss_adj)
    # measured: ~25 MB vs ~17 KB at 2048 steps x 256-dim state (f64 CPU)
    assert adj_b * 100 < scan_b, (adj_b, scan_b)
