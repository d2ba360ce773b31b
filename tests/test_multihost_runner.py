"""Model-level multi-host runner test (VERDICT r2 next #4).

Two real ``jax.distributed`` processes (2 CPU devices each) drive the
production ``RunnerBase`` + tiny ``Myriad``: per-epoch losses and final
trainable trees must agree ACROSS processes (the SPMD contract), the
2-process loss trajectory must match a 1-process run over the same global
row sets (DDP equivalence, reference runner_base.py:85-102), the orbax
ring must be written by rank 0 only, and resume from rank-0's checkpoint
must work on every process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc, workdir, local_bs, timeout=900):
    worker = os.path.join(os.path.dirname(__file__), "multihost_runner_worker.py")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port),
             workdir, str(local_bs)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo_root,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost runner workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out[-2000:]}\n{err[-3000:]}"
    return outs


def _parse(out):
    vals = {"stats": []}
    for line in out.splitlines():
        if line.startswith("STATS "):
            vals["stats"].append(float(line.split()[1]))
        elif line.startswith("TRAIN_SUM "):
            vals["train_sum"] = float(line.split()[1])
        elif line.startswith("CKPTS "):
            vals["ckpts"] = int(line.split()[1])
        elif line.startswith("RESUME_OK "):
            vals["resume_epoch"] = int(line.split()[1])
    return vals


@pytest.mark.slow
def test_runner_two_processes_match_single(tmp_path):
    two = [_parse(o) for _, o, _ in _run(2, str(tmp_path / "mp"), local_bs=4)]
    one = [_parse(o) for _, o, _ in _run(1, str(tmp_path / "sp"), local_bs=8)]

    # SPMD consistency: both processes computed the identical global program
    assert two[0]["stats"] == two[1]["stats"], (two[0], two[1])
    assert two[0]["train_sum"] == pytest.approx(two[1]["train_sum"], rel=1e-6)

    # DDP equivalence: same per-epoch losses as the single-process run over
    # the same global row sets (mean loss is row-order invariant; stats are
    # logged at 3 decimals)
    assert len(two[0]["stats"]) == len(one[0]["stats"]) == 2
    np.testing.assert_allclose(two[0]["stats"], one[0]["stats"], atol=2e-3)
    assert two[0]["train_sum"] == pytest.approx(one[0]["train_sum"], rel=1e-3)

    # one coordinated orbax ring on the shared dir (collective saves: a
    # rank-gated save deadlocks on orbax's process barrier — this test is
    # what caught it; rank 0 alone clears/deletes, the primary host writes)
    assert two[0]["ckpts"] == 2 and two[1]["ckpts"] == 2, (two[0], two[1])

    # resume from rank-0's checkpoint succeeded on BOTH processes
    assert two[0]["resume_epoch"] == two[1]["resume_epoch"] == 2
