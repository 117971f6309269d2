"""Multi-process (multi-host analog) integration test.

Launches the real ground-state CLI twice as separate OS processes wired
together with ``jax.distributed.initialize`` over localhost (CPU backend,
gloo collectives) — the single-machine stand-in for a TPU pod slice
(SURVEY.md §2.4(f)).  Validates: bring-up, global walker sharding with a
per-process local batch, collective metrics agreeing with physics oracles,
per-process checkpointing, and resume.
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


def _spawn(port, nproc, pid, iternum, ckpt_dir):
    env = dict(os.environ)
    # A clean child jax: CPU backend, no site-hook platform plugins, no
    # virtual-device flags from the parent test session.
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    # Both ranks compile the identical SPMD program and the resume phase
    # repeats it; a PERSISTENT shared cache (not tmp_path — that would
    # recompile cold on every pytest invocation) keeps the ranks within
    # milliseconds of each other at the gloo rendezvous, whose KV-store
    # wait has a hard 30 s deadline that a cold compile on a loaded host
    # can miss.
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/fermiflow_tpu/jax_mp_cache"),
    )
    cmd = [
        sys.executable, "-m", "fermiflow_tpu.cli.ground_state",
        "--nup", "3", "--Z", "0.5", "--batch", "32", "--iternum",
        str(iternum), "--ode-steps", "2", "--equilibrium-steps", "4",
        "--Deta", "8", "--Dmu", "8", "--dtype", "float64", "--lr", "1e-3",
        "--checkpoint-dir", ckpt_dir, "--checkpoint-every", "1",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", str(nproc), "--process-id", str(pid),
    ]
    return subprocess.Popen(
        cmd, env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )


def _run_pair(iternum, ckpt_dir, _retried=False):
    port = _free_port()
    procs = [_spawn(port, 2, pid, iternum, ckpt_dir) for pid in (0, 1)]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:  # never leave orphans behind on timeout/failure
            if p.poll() is None:
                p.kill()
    if not _retried and any(p.returncode != 0 for p in procs) and any(
        "DEADLINE_EXCEEDED" in out for out in outs
    ) and not any("iter:" in out for out in outs):
        # (no "iter:" = the failure was at bring-up, before any checkpoint
        # was written, so rerunning with the same ckpt_dir is clean)
        # First-ever (cold-cache) run on an oversubscribed host can blow the
        # 30 s gloo rendezvous deadline while one rank is still compiling;
        # the compile is cached now, so one retry is deterministic-fast.
        return _run_pair(iternum, ckpt_dir, _retried=True)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-4000:]}"
    return outs


def test_two_process_cpu_training(tmp_path):
    ckpt = str(tmp_path / "ck")
    outs = _run_pair(2, ckpt)
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
    outs2 = _run_pair(3, ckpt)
    out0b = outs2[0] if "iter:" in outs2[0] else outs2[1]
    assert "iter: 003" in out0b and "iter: 002" not in out0b, out0b[-2000:]
