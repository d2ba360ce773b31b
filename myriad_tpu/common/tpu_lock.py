"""Cooperative single-chip TPU lock (VERDICT r4 weak #1).

Round 4 recorded a 9% bench regression because a nohup'd training queue
was still time-slicing the one TPU chip while the driver benched
(BENCH_r04 11.11 vs r3's 12.24 img/s; the straddling job itself read an
absurd 0.34 img/s).  Every TPU-touching entry point now serializes
through one advisory lockfile:

  * acquire() blocks until the chip is free (live-pid check — stale
    locks from killed jobs are reclaimed), then writes
    {pid, tag, t0, deadline, token}.
  * a holder's SUBPROCESSES inherit the lock via the
    MYRIAD_TPU_LOCK_TOKEN env var (bench.py holds while its harness
    subprocess runs; train_to_spec holds across train + eval CLIs).
  * deadline: a holder that outlives its declared max_hold_s is treated
    as stale by waiters — a hung job cannot dam the queue forever.

Advisory only: nothing enforces it at the runtime level, but all repo
entry points (bench.py, evaluation_aqa_dataset.py, train.py, the
tools/ probes and sweep scripts) route through it, which is exactly the
fence the round-4 contamination needed.
"""

import contextlib
import errno
import json
import os
import sys
import time
from typing import Optional

ENV_TOKEN = "MYRIAD_TPU_LOCK_TOKEN"


def lock_path() -> str:
    return os.environ.get(
        "MYRIAD_TPU_LOCK",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".runs", "tpu.lock"),
    )


def _read(path: str) -> Optional[dict]:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM
    return True


def holder(path: Optional[str] = None) -> Optional[dict]:
    """The live current holder record, or None (absent/stale/expired)."""
    path = path or lock_path()
    rec = _read(path)
    if not rec:
        return None
    if time.time() > rec.get("deadline", 0):
        return None  # overstayed its declared budget: treat as stale
    if not _pid_alive(int(rec.get("pid", -1))):
        return None
    return rec


def acquire(tag: str, max_hold_s: float = 7200.0,
            wait_s: float = 0.0, poll_s: float = 10.0) -> bool:
    """Take the chip lock (blocking up to wait_s for the current holder).

    Returns True when acquired (or re-entered via an inherited token),
    False when the wait budget expired with the lock still held — the
    caller decides whether to proceed loudly or abort.
    """
    path = lock_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    existing = _read(path)
    inherited = os.environ.get(ENV_TOKEN)
    if existing and inherited and existing.get("token") == inherited:
        return True  # re-entrant: we are a subprocess of the holder
    t_end = time.time() + wait_s
    while True:
        cur = holder(path)
        if cur is None:
            break
        if time.time() >= t_end:
            print(f"[tpu_lock] BUSY: held by pid {cur['pid']} "
                  f"({cur.get('tag')}) since {time.ctime(cur.get('t0', 0))}",
                  file=sys.stderr)
            return False
        time.sleep(poll_s)
    token = f"{os.getpid()}-{time.time_ns()}"
    rec = {"pid": os.getpid(), "tag": tag, "t0": time.time(),
           "deadline": time.time() + max_hold_s, "token": token}
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)
    os.environ[ENV_TOKEN] = token  # subprocesses inherit the hold
    return True


def release() -> None:
    path = lock_path()
    rec = _read(path)
    token = os.environ.pop(ENV_TOKEN, None)
    if rec and rec.get("token") == token and rec.get("pid") == os.getpid():
        with contextlib.suppress(OSError):
            os.unlink(path)


@contextlib.contextmanager
def tpu_lock(tag: str, max_hold_s: float = 7200.0, wait_s: float = 1800.0,
             required: bool = False):
    """Hold the chip for the with-block.  When the wait budget expires,
    ``required=False`` proceeds with a loud stderr warning (measurements
    may be contaminated — the warning is the audit trail), ``required=True``
    raises."""
    got = acquire(tag, max_hold_s=max_hold_s, wait_s=wait_s)
    if not got:
        if required:
            raise RuntimeError(f"TPU lock unavailable for '{tag}'")
        print(f"[tpu_lock] proceeding WITHOUT the lock ({tag}) — "
              "another job may contaminate this measurement", file=sys.stderr)
    try:
        yield got
    finally:
        if got:
            release()
