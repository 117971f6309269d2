"""End-to-end training-step tests: the integration coverage the reference
never had (SURVEY.md §4 gap), including short-training energy gates and
checkpoint round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fermiflow_tpu.cli import common
from fermiflow_tpu.config import Config
from fermiflow_tpu.train import (
    init_beta_state,
    init_gs_state,
    make_beta_train_step,
    make_gs_train_step,
)


def small_gs_cfg(**kw):
    defaults = dict(
        nup=3, Z=0.0, batch=64, d_eta=8, d_mu=8, ode_steps=4,
        equilibrium_steps=10, mcmc_steps=5, iternum=3, seed=0,
    )
    defaults.update(kw)
    return Config(**defaults)


def test_gs_train_step_runs_and_preserves_eigenstate():
    """Z=0, identity init: E == 5.0 and parameters receive zero gradient, so
    training must keep E at 5.0 exactly."""
    cfg = small_gs_cfg()
    model, params = common.build_gs(cfg)
    # SGD, not Adam: at the eigenstate the true gradient is exactly zero and
    # the measured one is ~1e-15 numerical noise; Adam's scale-invariant
    # update would amplify that noise to lr-sized parameter moves (the
    # reference behaves identically) and break the invariance being tested.
    opt = optax.sgd(cfg.lr)
    # Snapshot before stepping: the jitted step donates its input state, which
    # shares buffers with `params`.
    params_np = jax.tree.map(np.asarray, params)
    state = init_gs_state(model, params, cfg, opt)
    step = make_gs_train_step(model, opt, cfg)
    for _ in range(3):
        state, metrics = step(state)
        np.testing.assert_allclose(float(metrics["E"]), 5.0, atol=1e-8)
        np.testing.assert_allclose(float(metrics["E_std"]), 0.0, atol=1e-7)
    # params unchanged (zero gradients at the eigenstate)
    for a, b in zip(jax.tree.leaves(params_np), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_gs_training_lowers_interacting_energy():
    """Short-training integration gate: at Z=2 the flow must lower the
    variational energy below the identity-flow (base-distribution) value."""
    cfg = small_gs_cfg(Z=2.0, batch=256, iternum=12, persistent_walkers=True,
                      equilibrium_steps=30)
    model, params = common.build_gs(cfg)
    opt = optax.adam(2e-2)
    state = init_gs_state(model, params, cfg, opt)
    step = make_gs_train_step(model, opt, cfg)
    Es = []
    for _ in range(12):
        state, metrics = step(state)
        Es.append(float(metrics["E"]))
    # identity-flow energy is E0 + <V>; after a dozen iterations the mean of
    # the last few energies must be below the first iteration's.
    assert np.mean(Es[-3:]) < Es[0] - 0.05, Es


def test_gs_persistent_walkers_adapt_tau():
    cfg = small_gs_cfg(persistent_walkers=True, tau=0.01)
    model, params = common.build_gs(cfg)
    opt = optax.adam(cfg.lr)
    state = init_gs_state(model, params, cfg, opt)
    step = make_gs_train_step(model, opt, cfg)
    tau0 = float(jnp.mean(state.tau))
    for _ in range(5):
        state, metrics = step(state)
    # tiny tau => acceptance ~1 > target 0.5 => tau must grow.
    assert float(jnp.mean(state.tau)) > tau0


def test_beta_train_step_boltzmann_fixed_point():
    """Finite-T at Z=0, Boltzmann init: F equals the exact free energy and
    all gradients vanish, so the train step must not move it."""
    cfg = small_gs_cfg()
    cfg.beta, cfg.deltaE, cfg.boltzmann = 2.0, 2.0, True
    model, params = common.build_beta(cfg)
    # SGD for the same zero-gradient/Adam-noise reason as the GS fixed-point
    # test above.
    opt = optax.sgd(cfg.lr)
    state = init_beta_state(model, params, cfg, opt)
    step = make_beta_train_step(model, opt, cfg)
    Es = np.asarray(model.Es_original)
    F_exact = Es[0] - np.log(np.sum(np.exp(-cfg.beta * (Es - Es[0])))) / cfg.beta
    for _ in range(2):
        state, metrics = step(state)
        np.testing.assert_allclose(float(metrics["F"]), F_exact, atol=1e-8)
        np.testing.assert_allclose(float(metrics["F_std"]), 0.0, atol=1e-7)


def test_beta_random_init_moves_toward_boltzmann():
    """From random logits at Z=0 the phi loss must drive F down toward the
    exact free energy."""
    cfg = small_gs_cfg(batch=512, equilibrium_steps=20)
    cfg.beta, cfg.deltaE, cfg.boltzmann = 1.0, 2.0, False
    model, params = common.build_beta(cfg)
    opt = optax.adam(5e-2)
    state = init_beta_state(model, params, cfg, opt)
    step = make_beta_train_step(model, opt, cfg)
    Fs = []
    for _ in range(25):
        state, metrics = step(state)
        Fs.append(float(metrics["F"]))
    Es = np.asarray(model.Es_original)
    F_exact = Es[0] - np.log(np.sum(np.exp(-1.0 * (Es - Es[0])))) / 1.0
    assert np.mean(Fs[-5:]) < Fs[0]
    assert np.mean(Fs[-5:]) > F_exact - 0.05  # variational bound (within MC noise)


def test_checkpoint_roundtrip(tmp_path):
    from fermiflow_tpu.utils import restore_checkpoint, save_checkpoint

    cfg = small_gs_cfg()
    model, params = common.build_gs(cfg)
    opt = optax.adam(cfg.lr)
    state = init_gs_state(model, params, cfg, opt)
    step = make_gs_train_step(model, opt, cfg)
    state, _ = step(state)
    save_checkpoint(str(tmp_path), 1, state)
    # Rebuild params: the original buffers were donated into the first step.
    _, params2 = common.build_gs(cfg)
    fresh = init_gs_state(model, params2, cfg, opt)
    restored, at = restore_checkpoint(str(tmp_path), fresh)
    assert at == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_metrics_logger(tmp_path):
    import json

    from fermiflow_tpu.utils import MetricsLogger

    p = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(p)
    lg.log(1, {"E": jnp.asarray(5.0)})
    lg.log(2, {"E": jnp.asarray(4.5)})
    lg.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["E"] == 5.0
    assert "hours_per_100_iters" in lines[1]


def test_checkpoint_npz_fallback_fingerprint(tmp_path):
    """The npz fallback (no orbax) must round-trip via explicitly numbered
    leaves and refuse to restore into a mismatched TrainState layout."""
    import sys
    import unittest.mock as mock

    import pytest

    from fermiflow_tpu.utils import checkpointing as ck

    state = {"a": np.arange(6.0).reshape(2, 3),
             "b": {"c": np.ones(4, np.int32)}}
    with mock.patch.dict(sys.modules, {"orbax.checkpoint": None,
                                       "orbax": None}):
        ck.save_checkpoint(str(tmp_path), 7, state)
    like = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4, np.int32)}}
    restored, step = ck.restore_checkpoint(str(tmp_path), like)
    assert step == 7
    np.testing.assert_array_equal(restored["a"], state["a"])
    np.testing.assert_array_equal(restored["b"]["c"], state["b"]["c"])

    bad = {"a": np.zeros((3, 2)), "b": {"c": np.zeros(4, np.int32)}}
    with pytest.raises(ValueError, match="structure mismatch"):
        ck.restore_checkpoint(str(tmp_path), bad)


def _per_state_virial_errors(state, model):
    """Per-state <r^2/2> vs the exact E_s/2 (virial theorem for HO
    eigenstates at identity flow), in units of the per-state MC sem."""
    r2 = 0.5 * np.sum(np.asarray(state.walkers) ** 2, axis=(-2, -1))
    idx = np.asarray(state.state_idx)
    Es = np.asarray(model.Es_original)
    errs = []
    for s in np.unique(idx):
        vals = r2[idx == s]
        if len(vals) < 50:
            continue
        sem = vals.std() / np.sqrt(len(vals))
        errs.append((float(abs(vals.mean() - Es[s] / 2.0)), float(sem)))
    assert len(errs) >= 3  # several states actually populated
    return errs


def test_beta_persistent_sampling_unbiased():
    """Persistent finite-T chains: with the maximal-coupling state refresh,
    frozen logits keep every chain on its own state target, so after burn-in
    the per-state positional moments must match the exact HO virial values
    (<r^2/2> = E_s/2) within MC error — the distributional gate VERDICT r1
    asked for.  Under drifting logits only a TV-sized fraction of chains
    switches and the moments must stay unbiased."""
    cfg = small_gs_cfg(batch=2048, mcmc_steps=10, persistent_walkers=True)
    cfg.beta, cfg.deltaE, cfg.boltzmann = 1.0, 2.0, True
    model, params = common.build_beta(cfg)
    # host copy before the first (buffer-donating) step call
    p = np.exp(np.asarray(jax.nn.log_softmax(params["log_state_weights"])))
    opt = optax.sgd(0.0)  # frozen params: pure sampling dynamics
    state = init_beta_state(model, params, cfg, opt)
    step = make_beta_train_step(model, opt, cfg)

    for _ in range(30):  # burn-in: 300 Metropolis steps per chain
        state, metrics = step(state)
    # Frozen logits => the coupling never switches a chain's state.
    assert float(metrics["state_switch_frac"]) == 0.0

    # Marginal state occupation matches softmax(logits).
    counts = np.bincount(np.asarray(state.state_idx),
                         minlength=model.Nstates) / cfg.batch
    np.testing.assert_allclose(counts, p, atol=4 * np.sqrt(p.max() / cfg.batch))

    for err, sem in _per_state_virial_errors(state, model):
        assert err < 4 * sem + 0.02, (err, sem)

    # Drifting logits (simulated training): moments stay unbiased and the
    # switch fraction stays at the TV-distance scale.
    sw = []
    for k in range(15):
        new_params = dict(state.params)
        new_params["log_state_weights"] = (
            state.params["log_state_weights"]
            + 0.05 * jax.random.normal(jax.random.PRNGKey(k),
                                       (model.Nstates,))
        )
        state = state._replace(params=new_params)
        state, metrics = step(state)
        sw.append(float(metrics["state_switch_frac"]))
    assert 0.0 < np.mean(sw) < 0.1, sw
    for err, sem in _per_state_virial_errors(state, model):
        assert err < 4 * sem + 0.05, (err, sem)


def test_multi_step_matches_sequential_single_steps():
    """K iterations scanned inside one program (train.make_multi_step) must
    reproduce the K-sequential-dispatch trajectory exactly: same final params
    and the stacked (K,) metrics equal to the per-iteration values."""
    from fermiflow_tpu.train import make_multi_step

    cfg = small_gs_cfg(Z=1.0, batch=64, persistent_walkers=True)
    model, params = common.build_gs(cfg)
    opt = optax.adam(1e-2)

    state_a = init_gs_state(model, params, cfg, opt)
    step = make_gs_train_step(model, opt, cfg)
    seq_E, seq_loss = [], []
    for _ in range(4):
        state_a, m = step(state_a)
        seq_E.append(float(m["E"]))
        seq_loss.append(float(m["loss"]))

    _, params_b = common.build_gs(cfg)
    state_b = init_gs_state(model, params_b, cfg, opt)
    raw = make_gs_train_step(model, opt, cfg, jit=False)
    multi = make_multi_step(raw, 4)
    state_b, stacked = multi(state_b)

    np.testing.assert_allclose(np.asarray(stacked["E"]), seq_E, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(stacked["loss"]), seq_loss,
                               rtol=1e-9, atol=1e-12)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_metrics_logger_log_many(tmp_path):
    import json
    import time

    from fermiflow_tpu.utils import MetricsLogger

    p = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(p)
    stacked = {"E": jnp.asarray([5.0, 4.5, 4.25]),
               "accept_rate": jnp.asarray([0.5, 0.6, 0.7])}
    rows = lg.log_many(11, stacked, time.time() - 0.3)
    lg.close()
    lines = [json.loads(l) for l in open(p)]
    assert [r["step"] for r in lines] == [11, 12, 13]
    assert lines[2]["E"] == 4.25 and lines[0]["accept_rate"] == 0.5
    assert all(abs(r["iter_seconds"] - 0.1) < 0.05 for r in rows)


def test_gs_fused_multi_step_runs_interpret():
    """The fused multi-chain-sampler multi-step (one Pallas launch feeding K
    scanned iterations, train.make_gs_fused_multi_step) compiles and runs in
    interpret mode: stacked per-iteration metrics, advancing step counter,
    persistent walkers + tau carried out of the kernel.  (Distributional
    equivalence with the per-iteration step is TPU-gated — interpret mode
    stubs the on-core PRNG.)"""
    import optax

    from fermiflow_tpu.cli import common as cli_common
    from fermiflow_tpu.config import Config
    from fermiflow_tpu.train import init_gs_state, make_gs_fused_multi_step

    cfg = Config(
        nup=3, Z=0.5, batch=64, d_eta=8, d_mu=8, ode_steps=2,
        equilibrium_steps=2, mcmc_steps=2, persistent_walkers=True,
        dtype="float32", pallas_sampler=True, pallas_interpret=True,
    )
    model, params = cli_common.build_gs(cfg)
    opt = optax.adam(cfg.lr)
    state = init_gs_state(model, params, cfg, opt)
    fn = make_gs_fused_multi_step(model, opt, cfg, 3)
    state2, metrics = fn(state)
    assert metrics["E"].shape == (3,)
    assert int(state2.step) == 3
    assert state2.walkers.shape == state.walkers.shape
    assert np.all(np.isfinite(np.asarray(state2.tau)))
