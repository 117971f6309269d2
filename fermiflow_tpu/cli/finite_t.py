"""Finite-temperature VMC training driver.

Capability parity with ``src/BetaFermionHO2D.py``: same flags/defaults, same
printed observables (F, F_std, E, E_std, S, S_analytical, speed), plus the
TPU-native extensions.

    python -m fermiflow_tpu.cli.finite_t --beta 2.0 --nup 6 --Z 0.5 \
        --deltaE 2.0 --boltzmann
"""

from __future__ import annotations

import argparse

import optax

from fermiflow_tpu.cli import common
from fermiflow_tpu.parallel import make_walker_mesh, shard_walkers
from fermiflow_tpu.train import init_beta_state, make_beta_train_step
from fermiflow_tpu.utils import MetricsLogger, restore_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Finite-temperature variational Monte Carlo (TPU-native)"
    )
    common.add_flags(parser, finite_t=True)
    args = parser.parse_args(argv)
    primary = common.maybe_init_distributed(args)
    cfg = common.config_from_args(args, finite_t=True)
    common.setup_precision(cfg, debug_nans=args.debug_nans)

    model, params = common.build_beta(cfg)
    optimizer = optax.adam(cfg.lr)
    mesh = make_walker_mesh() if args.shard else None

    state = init_beta_state(model, params, cfg, optimizer)
    if mesh is not None:
        state = state._replace(
            walkers=shard_walkers(mesh, state.walkers),
            tau=shard_walkers(mesh, state.tau),
        )
    start_step = 0
    if cfg.checkpoint_dir:
        state, start_step = restore_checkpoint(cfg.checkpoint_dir, state)

    logger = MetricsLogger(cfg.metrics_path if primary else None)

    if primary:
        print(
            f"beta = {cfg.beta:.1f}, nup = {cfg.nup}, ndown = {cfg.ndown}, "
            f"Z = {cfg.Z:.1f}"
        )
        print(f"deltaE = {cfg.deltaE:.1f}, "
              f"total number of states = {model.Nstates}")
        print(
            "State probabilities initialized with "
            + ("Boltzmann distribution." if cfg.boltzmann else "random Gaussian.")
        )
        print(f"batch = {cfg.batch}, iternum = {cfg.iternum}.")

    def print_row(rec):
        print(
            f"iter: {rec['step']:03d} F: {rec['F']} F_std: {rec['F_std']} "
            f"E: {rec['E']} E_std: {rec['E_std']} "
            f"S: {rec['S']} S_analytical: {rec['S_analytical']} "
            f"accept: {rec['accept_rate']:.3f} "
            f"Instant speed (hours per 100 iters): "
            f"{rec.get('hours_per_100_iters', float('nan'))}"
        )

    state = common.run_training_loop(
        state, start_step, cfg, args,
        lambda jit: make_beta_train_step(model, optimizer, cfg, mesh=mesh,
                                         jit=jit),
        logger, primary, print_row,
    )

    if args.movie:
        import jax

        common.dump_density_movie(
            args.movie, model, state.params["flow"],
            jax.random.fold_in(state.key, 999),
            args.movie_frames, args.movie_walkers, cfg,
            state_logits=state.params["log_state_weights"],
        )

    logger.close()
    return state


if __name__ == "__main__":
    main()
