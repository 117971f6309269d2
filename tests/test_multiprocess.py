"""Multi-process (multi-host analog) integration tests.

Launches the real CLIs as pairs of OS processes wired together with
``jax.distributed.initialize`` over localhost (CPU backend, gloo
collectives) — the single-machine stand-in for a TPU pod slice
(SURVEY.md §2.4(f)).  Coverage:

  * ground-state CLI: bring-up, global walker sharding with a per-process
    local batch, collective metrics agreeing with physics oracles,
    per-process checkpointing, resume (``test_two_process_cpu_training``);
  * finite-T CLI: Categorical state draw + maximal-coupling refresh +
    per-state segment baselines reduced over the 2-process global mesh
    (``test_two_process_finite_t``);
  * the fused Pallas Hessian-flow kernel sharded with ``jax.shard_map``
    across the 2-process mesh, interpret mode (``test_two_process_pallas_
    hessian_flow``).

Bring-up robustness comes from an explicit ``--init-timeout`` (plumbed to
``jax.distributed.initialize(initialization_timeout=...)``) plus a shared
persistent compile cache, not from retries.
"""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(port, nproc, pid, cli, extra):
    env = dict(os.environ)
    # A clean child jax: CPU backend, no site-hook platform plugins, no
    # virtual-device flags from the parent test session.
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    # Both ranks compile the identical SPMD program and the resume phase
    # repeats it; a PERSISTENT shared cache (not tmp_path — that would
    # recompile cold on every pytest invocation) keeps the ranks within
    # milliseconds of each other at any post-bring-up collective.
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/fermiflow_tpu/jax_mp_cache"),
    )
    cmd = [
        sys.executable, "-m", f"fermiflow_tpu.cli.{cli}",
        "--Z", "0.5", "--batch", "32",
        "--Deta", "8", "--Dmu", "8", "--lr", "1e-3",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(nproc), "--process-id", str(pid),
        "--init-timeout", "300",
    ] + extra
    return subprocess.Popen(
        cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )


def _run_pair(cli, extra):
    port = _free_port()
    procs = [_spawn(port, 2, pid, cli, extra) for pid in (0, 1)]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:  # never leave orphans behind on timeout/failure
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-4000:]}"
    return outs


def _gs_extra(iternum, ckpt_dir):
    return [
        "--nup", "3", "--iternum", str(iternum), "--ode-steps", "2",
        "--equilibrium-steps", "4", "--dtype", "float64",
        "--checkpoint-dir", ckpt_dir, "--checkpoint-every", "1",
    ]


def test_two_process_cpu_training(tmp_path):
    ckpt = str(tmp_path / "ck")
    outs = _run_pair("ground_state", _gs_extra(2, ckpt))
    out0 = outs[0] if "iter: 001" in outs[0] else outs[1]

    # Both ranks announce the 2-process runtime with 1 local / 2 global devices.
    for out in outs:
        assert re.search(r"jax.distributed: process \d/2, 1 local / 2 global",
                         out), out[-2000:]

    # Only the primary prints iterations; E at identity init must sit on the
    # N=3 Z=0.5 oracle (E0 + <V_coul> ~ 6.0).
    es = [float(m) for m in re.findall(r"iter: \d+ E: ([\d.eE+-]+)", out0)]
    assert len(es) == 2, out0[-2000:]
    assert all(5.5 < e < 6.5 for e in es), es
    other = outs[1] if out0 is outs[0] else outs[0]
    assert "iter: 001" not in other

    # Per-process checkpoint shards were written by both ranks.
    assert os.path.isdir(os.path.join(ckpt, "proc00000"))
    assert os.path.isdir(os.path.join(ckpt, "proc00001"))

    # Resume: a fresh 2-process run continues from iter 3.
    outs2 = _run_pair("ground_state", _gs_extra(3, ckpt))
    out0b = outs2[0] if "iter:" in outs2[0] else outs2[1]
    assert "iter: 003" in out0b and "iter: 002" not in out0b, out0b[-2000:]


def test_two_proc_checkpoint_resumes_single(tmp_path):
    """Elastic recovery: per-process walker shards saved by a 2-process run
    restore into a SINGLE-process resume (``_restore_resharded`` merges the
    ``procNNNNN`` shards along the walker axis), energies staying on the
    oracle — the half of the elastic story the round-3 checkpointing lacked."""
    ckpt = str(tmp_path / "ck")
    _run_pair("ground_state", _gs_extra(2, ckpt))
    assert os.path.isdir(os.path.join(ckpt, "proc00000"))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/fermiflow_tpu/jax_mp_cache"),
    )
    cmd = [
        sys.executable, "-m", "fermiflow_tpu.cli.ground_state",
        "--Z", "0.5", "--batch", "32",
        "--Deta", "8", "--Dmu", "8", "--lr", "1e-3",
    ] + _gs_extra(3, ckpt)
    out = subprocess.run(
        cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-4000:]
    # Continues from the 2-proc step-2 checkpoint: only iteration 3 runs,
    # with the merged global walkers, and E stays on the N=3 Z=0.5 oracle.
    assert "iter: 003" in out.stdout and "iter: 002" not in out.stdout, \
        out.stdout[-2000:]
    es = [float(m) for m in re.findall(r"iter: \d+ E: ([\d.eE+-]+)",
                                       out.stdout)]
    assert es and all(5.5 < e < 6.5 for e in es), es


def test_two_process_finite_t():
    # Persistent chains: the maximal-coupling state refresh + the per-state
    # segment-sum baseline both run over the sharded global batch.
    outs = _run_pair("finite_t", [
        "--nup", "3", "--iternum", "2", "--ode-steps", "2",
        "--equilibrium-steps", "4", "--mcmc-steps", "4", "--dtype", "float64",
        "--beta", "2.0", "--deltaE", "2.0", "--boltzmann", "--persistent",
    ])
    out0 = outs[0] if "iter: 001" in outs[0] else outs[1]
    assert "total number of states = 21" in out0, out0[-2000:]

    rows = re.findall(
        r"iter: \d+ F: ([\d.eE+-]+) .* E: ([\d.eE+-]+) .* "
        r"S: ([\d.eE+-]+) S_analytical: ([\d.eE+-]+)", out0)
    assert len(rows) == 2, out0[-2000:]
    for F, E, S, S_ana in ((float(a), float(b), float(c), float(d))
                           for a, b, c, d in rows):
        # Boltzmann init at Z=0.5: E ~ E0 + <V> + thermal ~ 6-9 at beta=2,
        # F = E + mean(logp_states)/beta strictly below E, S_analytical ~ 2.0
        # (21 states; ln 21 = 3.04 is the cap), MC S within batch-32 noise.
        assert 5.0 < E < 9.5, (F, E, S, S_ana)
        assert F < E, (F, E)
        assert 0.2 < S_ana < 3.05, S_ana
        assert abs(S - S_ana) < 1.5, (S, S_ana)


# A 2-process interpret-mode launch of the sharded Pallas kernels is NOT
# tested: measured on this jax (0.9.0, CPU/gloo backend), the identical
# `jit(shard_map(pallas_call(interpret=...)))` program that compiles and
# runs in 45 s on a single-process 2-virtual-device mesh never completes
# under 2 OS processes — both ranks stall inside the jit (>20 min,
# tests/_mp_pallas_driver.py reproduces it).  Interpret-mode Pallas is a
# test-only construct; the cross-process SPMD machinery is covered by the
# two CLI tests above (XLA engines), the kernels' shard_map wrappers by the
# single-process multi-device interpret tests (tests/test_hessian_flow.py,
# tests/test_pallas_metropolis.py, tests/test_pallas_reinforce.py), and the
# real kernels by the single-chip TPU production configs.
