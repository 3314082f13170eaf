"""Multi-process loopback distributed test (SURVEY §4.5 second half, §5.8).

Spawns 2 JAX processes (2 virtual CPU devices each) joined through
jax.distributed.initialize over a loopback coordinator with gloo CPU
collectives — the same recipe a real multi-host TPU pod uses (minus the
auto-detected coordinator) — and runs one mesh-parallel flagship train step
over the GLOBAL 4-device ('data','model') mesh.  Asserts both processes
compute the identical loss/param state, and that it matches a
single-process run over the same 4-device mesh: cross-DCN gradient
all-reduce changes nothing.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multiprocess_worker.py")


def _env(n_local):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(args, n_local, extra=()):
    return subprocess.Popen(
        [sys.executable, _WORKER, *map(str, args), *map(str, extra)],
        env=_env(n_local),
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _join_group(procs):
    try:
        for p in procs:
            _, err = p.communicate(timeout=600)
            assert p.returncode == 0, err[-3000:]
    finally:
        for p in procs:  # never leak a worker holding the port
            if p.poll() is None:
                p.kill()


@pytest.mark.slow
def test_two_process_step_matches_single_process(tmp_path):
    # pid-derived port: two concurrent suite runs on one machine must not
    # share a coordinator port (a collision wedges the gloo rendezvous)
    port = 50000 + (os.getpid() % 9000)
    outs = [tmp_path / f"p{i}.txt" for i in range(2)]
    _join_group([_run((i, 2, port, outs[i]), n_local=2) for i in range(2)])

    single = tmp_path / "single.txt"
    _join_group([_run((0, 1, port + 2, single), n_local=4)])

    vals = [
        np.loadtxt(f, ndmin=1) for f in (*outs, single)
    ]
    # both workers agree bit-for-bit (same global program, same data)
    np.testing.assert_array_equal(vals[0], vals[1])
    # 2-process == 1-process over the same global mesh (GSPMD semantics;
    # gloo reduction order may differ from the compiled single-process
    # all-reduce, so allow float tolerance)
    np.testing.assert_allclose(vals[0], vals[2], rtol=1e-4)


@pytest.mark.slow
def test_four_process_global_mesh_matches_single_process(tmp_path):
    """>2-process group over the 2-D global_mesh helper (VERDICT r2 weak
    #5): 4 processes x 2 local devices = an 8-device ('data'=4,'model'=2)
    mesh whose 'data' axis spans process boundaries — every cross-process
    path (init barrier, gradient all-reduce over gloo, replicated output
    readback) runs with more than two members."""
    port = 50000 + ((os.getpid() + 17) % 9000)
    outs = [tmp_path / f"p{i}.txt" for i in range(4)]
    _join_group([_run((i, 4, port, outs[i]), n_local=2) for i in range(4)])

    single = tmp_path / "single.txt"
    _join_group([_run((0, 1, port + 2, single), n_local=8)])

    vals = [np.loadtxt(f, ndmin=1) for f in (*outs, single)]
    for v in vals[1:4]:
        np.testing.assert_array_equal(vals[0], v)
    np.testing.assert_allclose(vals[0], vals[4], rtol=1e-4)


@pytest.mark.slow
def test_checkpoint_restart_across_process_groups(tmp_path):
    """Checkpoint-restart story across process GROUPS (SURVEY §5.3 failure
    model; VERDICT r2 weak #5): group A steps once and saves the replicated
    state, a FRESH group B (new coordinator, new mesh) restores it and
    steps again — final state must match one uninterrupted 2-step run."""
    port = 50000 + ((os.getpid() + 41) % 9000)
    state = tmp_path / "state.npz"
    outs_a = [tmp_path / f"a{i}.txt" for i in range(2)]
    _join_group([
        _run((i, 2, port, outs_a[i]), n_local=2,
             extra=("--steps", 1, "--save", state))
        for i in range(2)
    ])
    assert state.exists()

    outs_b = [tmp_path / f"b{i}.txt" for i in range(2)]
    _join_group([
        _run((i, 2, port + 2, outs_b[i]), n_local=2,
             extra=("--steps", 1, "--step0", 1, "--load", state))
        for i in range(2)
    ])

    uninterrupted = tmp_path / "u.txt"
    _join_group([
        _run((0, 1, port + 4, uninterrupted), n_local=4,
             extra=("--steps", 2))
    ])

    vals = [np.loadtxt(f, ndmin=1) for f in (*outs_b, uninterrupted)]
    np.testing.assert_array_equal(vals[0], vals[1])
    # restart path == uninterrupted (float tolerance: gloo reduction order)
    np.testing.assert_allclose(vals[0], vals[2], rtol=1e-4)
