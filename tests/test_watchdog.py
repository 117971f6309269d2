"""Automatic failure recovery (NaN watchdog) in the training loop.

The reference has no failure handling at all — a diverged run is lost
(SURVEY.md §5).  ``run_training_loop`` + ``--max-restarts`` restores the
latest checkpoint with a reseeded RNG stream when the primary metric goes
non-finite.  The fake step here diverges deterministically at iteration 3
on the ORIGINAL key stream only, so a successful reseed-and-restore is
observable as the run completing with a different final key.
"""

import types

import jax
import jax.numpy as jnp
import optax
import pytest

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config
from fermiflow_tpu.train import init_gs_state
from fermiflow_tpu.utils import MetricsLogger


def _setup(tmp_path, max_restarts, steps_per_call=1):
    cfg = Config(nup=2, batch=8, iternum=6, checkpoint_dir=str(tmp_path / "ck"),
                 checkpoint_every=2, max_restarts=max_restarts,
                 steps_per_call=steps_per_call, dtype="float64")
    model, params = common.build_gs(cfg)
    state = init_gs_state(model, params, cfg, optax.adam(1e-3))
    key0 = state.key

    def fake_step(state):
        # Diverge at step 3 of the original stream; healthy otherwise.
        poisoned = jnp.all(state.key == key0) & (state.step == 2)
        E = jnp.where(poisoned, jnp.nan, 1.0 + state.step.astype(jnp.float64))
        new = state._replace(step=state.step + 1)
        return new, {"E": E, "E_std": jnp.zeros(()), "accept_rate": E * 0,
                     "loss": E * 0}

    args = types.SimpleNamespace(profile_dir=None)
    logger = MetricsLogger(None)
    return cfg, state, fake_step, args, logger


@pytest.mark.parametrize("steps_per_call", [1, 2])
def test_watchdog_restores_and_completes(tmp_path, steps_per_call):
    cfg, state, fake_step, args, logger = _setup(
        tmp_path, max_restarts=2, steps_per_call=steps_per_call)
    final = common.run_training_loop(
        state, 0, cfg, args, lambda jit: fake_step, logger,
        primary=True, print_row=lambda rec: None,
    )
    # Completed all iterations after one restore (NaN hit once, at step 2
    # of the original stream; the reseeded stream is healthy).
    assert int(final.step) >= cfg.iternum - 2  # restored to ckpt step 2
    assert not jnp.all(final.key == init_gs_state(
        common.build_gs(cfg)[0], common.build_gs(cfg)[1], cfg,
        optax.adam(1e-3)).key)


def test_watchdog_exhausted_raises(tmp_path):
    cfg, state, fake_step, args, logger = _setup(tmp_path, max_restarts=0)
    with pytest.raises(FloatingPointError):
        common.run_training_loop(
            state, 0, cfg, args, lambda jit: fake_step, logger,
            primary=True, print_row=lambda rec: None,
        )


def _setup_divergence(tmp_path, max_restarts, steps_per_call=1):
    """Fake step that DIVERGES FINITELY (E = 1e6, an lr-spike analog) at
    iteration 3 of the original key stream; healthy after a reseed."""
    cfg = Config(nup=2, batch=8, iternum=8, checkpoint_dir=str(tmp_path / "ck"),
                 checkpoint_every=2, max_restarts=max_restarts,
                 steps_per_call=steps_per_call, dtype="float64",
                 divergence_window=2, divergence_nsigma=5.0)
    model, params = common.build_gs(cfg)
    state = init_gs_state(model, params, cfg, optax.adam(1e-3))
    key0 = state.key

    def fake_step(state):
        poisoned = jnp.all(state.key == key0) & (state.step == 2)
        E = jnp.where(poisoned, 1e6, 1.0 + state.step.astype(jnp.float64))
        new = state._replace(step=state.step + 1)
        return new, {"E": E, "E_std": jnp.zeros(()), "accept_rate": E * 0,
                     "loss": E * 0}

    args = types.SimpleNamespace(profile_dir=None)
    logger = MetricsLogger(None)
    return cfg, state, fake_step, args, logger


@pytest.mark.parametrize("steps_per_call", [1, 2])
def test_divergence_watchdog_restores(tmp_path, steps_per_call):
    cfg, state, fake_step, args, logger = _setup_divergence(
        tmp_path, max_restarts=2, steps_per_call=steps_per_call)
    seen = []
    final = common.run_training_loop(
        state, 0, cfg, args, lambda jit: fake_step, logger,
        primary=True, print_row=lambda rec: seen.append(float(rec["E"])),
    )
    # The finite spike never reached the printed stream, the run restored
    # (reseeded key) and completed.
    assert int(final.step) >= cfg.iternum - 2
    assert all(e < 1e5 for e in seen), seen
    assert not jnp.all(final.key == init_gs_state(
        common.build_gs(cfg)[0], common.build_gs(cfg)[1], cfg,
        optax.adam(1e-3)).key)


def test_divergence_watchdog_raises_without_restarts(tmp_path):
    cfg, state, fake_step, args, logger = _setup_divergence(
        tmp_path, max_restarts=0)
    with pytest.raises(FloatingPointError, match="divergence"):
        common.run_training_loop(
            state, 0, cfg, args, lambda jit: fake_step, logger,
            primary=True, print_row=lambda rec: None,
        )


def test_divergence_watchdog_disabled(tmp_path):
    # nsigma = 0 switches the finite-divergence check off: the spike passes
    # through and the run completes without a restore.
    cfg, state, fake_step, args, logger = _setup_divergence(
        tmp_path, max_restarts=0)
    cfg.divergence_nsigma = 0.0
    seen = []
    common.run_training_loop(
        state, 0, cfg, args, lambda jit: fake_step, logger,
        primary=True, print_row=lambda rec: seen.append(float(rec["E"])),
    )
    assert any(e > 1e5 for e in seen)
