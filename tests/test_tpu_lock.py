"""Chip-fence lockfile (common/tpu_lock.py) — the VERDICT r4 weak-#1 fix.

The r4 driver bench was contaminated by a background train queue
time-slicing the one TPU; every TPU entry point now serializes through
this advisory lock, so the semantics (stale reclaim, deadline expiry,
subprocess token inheritance) are load-bearing for measurement hygiene.
"""

import json
import os
import subprocess
import sys

import pytest

from myriad_tpu.common import tpu_lock


@pytest.fixture
def lockfile(tmp_path, monkeypatch):
    path = str(tmp_path / "tpu.lock")
    monkeypatch.setenv("MYRIAD_TPU_LOCK", path)
    monkeypatch.delenv(tpu_lock.ENV_TOKEN, raising=False)
    return path


def test_acquire_release_roundtrip(lockfile):
    assert tpu_lock.acquire("t1") is True
    rec = json.load(open(lockfile))
    assert rec["pid"] == os.getpid() and rec["tag"] == "t1"
    assert tpu_lock.holder() is not None
    tpu_lock.release()
    assert not os.path.exists(lockfile)
    assert tpu_lock.holder() is None


def test_busy_lock_blocks_second_acquirer(lockfile):
    # a DIFFERENT live process holds the lock -> zero-wait acquire fails
    rec = {"pid": os.getpid(), "tag": "other", "t0": 0,
           "deadline": 1e18, "token": "not-ours"}
    json.dump(rec, open(lockfile, "w"))
    assert tpu_lock.acquire("t2", wait_s=0.0) is False


def test_stale_pid_is_reclaimed(lockfile):
    rec = {"pid": 2 ** 22 + 12345, "tag": "dead", "t0": 0,
           "deadline": 1e18, "token": "x"}
    json.dump(rec, open(lockfile, "w"))
    assert tpu_lock.holder() is None
    assert tpu_lock.acquire("t3", wait_s=0.0) is True
    tpu_lock.release()


def test_expired_deadline_is_reclaimed(lockfile):
    # live pid but overstayed its declared budget -> treated as stale
    rec = {"pid": os.getpid(), "tag": "hung", "t0": 0,
           "deadline": 1.0, "token": "x"}
    json.dump(rec, open(lockfile, "w"))
    assert tpu_lock.holder() is None
    assert tpu_lock.acquire("t4", wait_s=0.0) is True
    tpu_lock.release()


def test_garbage_lockfile_is_reclaimed(lockfile):
    open(lockfile, "w").write("not json{")
    assert tpu_lock.acquire("t5", wait_s=0.0) is True
    tpu_lock.release()


def test_subprocess_inherits_hold(lockfile):
    """bench.py holds while its harness subprocess re-enters via the env
    token — the subprocess must NOT block on its parent's lock."""
    assert tpu_lock.acquire("parent") is True
    try:
        code = (
            "import sys; from myriad_tpu.common import tpu_lock; "
            "sys.exit(0 if tpu_lock.acquire('child', wait_s=0.0) else 1)"
        )
        env = dict(os.environ)
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))))
        assert proc.returncode == 0
        # a stranger (no token) still blocks
        env.pop(tpu_lock.ENV_TOKEN, None)
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))))
        assert proc.returncode == 1
    finally:
        tpu_lock.release()


def test_context_manager_releases_on_error(lockfile):
    with pytest.raises(RuntimeError):
        with tpu_lock.tpu_lock("cm"):
            assert tpu_lock.holder() is not None
            raise RuntimeError("boom")
    assert tpu_lock.holder() is None


def test_host_isa_tag_deterministic():
    """CPU compile-cache scoping (dist._host_isa_tag): sandbox rounds
    migrate between heterogeneous hosts and mismatched XLA:CPU AOT cache
    entries can SIGILL — the tag must be stable on one host and derived
    from the CPU feature flags."""
    from myriad_tpu.common.dist import _host_isa_tag

    t1, t2 = _host_isa_tag(), _host_isa_tag()
    assert t1 == t2 and len(t1) == 10 and t1.isalnum()


def test_required_raises_when_busy(lockfile):
    json.dump({"pid": os.getpid(), "tag": "other", "t0": 0,
               "deadline": 1e18, "token": "not-ours"}, open(lockfile, "w"))
    with pytest.raises(RuntimeError):
        with tpu_lock.tpu_lock("cm2", wait_s=0.0, required=True):
            pass  # pragma: no cover
    # non-required proceeds (loudly) without taking the lock
    with tpu_lock.tpu_lock("cm3", wait_s=0.0) as got:
        assert got is False
    # and did not delete the other holder's lock
    assert json.load(open(lockfile))["token"] == "not-ours"
