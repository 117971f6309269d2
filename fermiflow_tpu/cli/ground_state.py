"""Ground-state VMC training driver.

Capability parity with ``src/FermionHO2D.py``: same physics flags and
defaults, same printed observables (E, E_std, hours-per-100-iters), plus the
TPU-native extensions (sharding, persistent walkers, checkpoints, jsonl
metrics).

    python -m fermiflow_tpu.cli.ground_state --nup 6 --Z 0.5 --batch 8000
"""

from __future__ import annotations

import argparse

import optax

from fermiflow_tpu.cli import common
from fermiflow_tpu.parallel import make_walker_mesh, shard_walkers
from fermiflow_tpu.train import (
    init_gs_state,
    make_gs_fused_multi_step,
    make_gs_train_step,
)
from fermiflow_tpu.utils import MetricsLogger, restore_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Ground-state variational Monte Carlo (TPU-native)"
    )
    common.add_flags(parser, finite_t=False)
    args = parser.parse_args(argv)
    primary = common.maybe_init_distributed(args)
    cfg = common.config_from_args(args, finite_t=False)
    common.setup_precision(cfg, debug_nans=args.debug_nans)

    model, params = common.build_gs(cfg)
    optimizer = optax.adam(cfg.lr)
    mesh = make_walker_mesh() if args.shard else None

    state = init_gs_state(model, params, cfg, optimizer)
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
        print(f"nup = {cfg.nup}, ndown = {cfg.ndown}, Z = {cfg.Z:.1f}")
        print(f"batch = {cfg.batch}, iternum = {cfg.iternum}.")

    def print_row(rec):
        print(
            f"iter: {rec['step']:03d} E: {rec['E']} E_std: {rec['E_std']} "
            f"accept: {rec['accept_rate']:.3f} "
            f"Instant speed (hours per 100 iters): "
            f"{rec.get('hours_per_100_iters', float('nan'))}"
        )

    # On the Pallas-sampler path, K-iteration chunks compile to the fused
    # multi-step: ONE multi-chain sampler launch feeds the whole chunk
    # (train.make_gs_fused_multi_step).
    make_chunk = None
    if cfg.pallas_sampler and cfg.steps_per_call > 1:
        make_chunk = lambda chunk: make_gs_fused_multi_step(
            model, optimizer, cfg, chunk, mesh=mesh)

    state = common.run_training_loop(
        state, start_step, cfg, args,
        lambda jit: make_gs_train_step(model, optimizer, cfg, mesh=mesh,
                                       jit=jit),
        logger, primary, print_row, make_chunk=make_chunk,
    )

    if args.movie:
        import jax

        common.dump_density_movie(
            args.movie, model, state.params,
            jax.random.fold_in(state.key, 999),
            args.movie_frames, args.movie_walkers, cfg,
        )

    logger.close()
    return state


if __name__ == "__main__":
    main()
