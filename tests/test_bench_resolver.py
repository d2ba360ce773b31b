"""bench.py --ckpt resolution: the armed-headline marker contract.

tools/train_to_spec.py (and the r4 measurement queue) validate a trained
checkpoint on TPU and arm `.runs/bench_ckpt.json`; the driver's plain
`python bench.py` must pick it up — including the batch/prefill-chunk
profile the checkpoint was validated at (the spec optimum b24/3-chunk
differs from the greedy-optimal b48/9 default, BENCH_NOTES r4) — while a
fresh clone without the marker stays unchanged.  Pure-host logic: no jax.
"""

import importlib.util
import json
import os
import types

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "benchmod_for_test", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(**kw):
    kw.setdefault("ckpt", "auto")
    kw.setdefault("harness_spec", 3)
    return types.SimpleNamespace(**kw)


def _with_marker(benchmod, payload):
    """Run resolve_bench_ckpt with a temporarily-armed marker, restoring
    whatever was there before (the real queue may be running)."""
    marker = os.path.join(ROOT, ".runs", "bench_ckpt.json")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    prior = open(marker).read() if os.path.exists(marker) else None
    try:
        with open(marker, "w") as f:
            json.dump(payload, f)
        return benchmod.resolve_bench_ckpt(_args())
    finally:
        if prior is None:
            os.remove(marker)
        else:
            with open(marker, "w") as f:
                f.write(prior)


def test_none_disables(benchmod):
    assert benchmod.resolve_bench_ckpt(_args(ckpt="none")) == (
        "", 3, None, None, None)


def test_explicit_path_ignores_marker_profile(benchmod, tmp_path):
    p = tmp_path / "ckpt_dir"
    p.mkdir()
    ckpt, spec, hb, hc, hkv = benchmod.resolve_bench_ckpt(
        _args(ckpt=str(p), harness_spec=5))
    assert (ckpt, spec, hb, hc, hkv) == (str(p), 5, None, None, None)


def test_missing_explicit_path_runs_without(benchmod):
    ckpt, _, _, _, _ = benchmod.resolve_bench_ckpt(
        _args(ckpt="/nonexistent/ckpt"))
    assert ckpt == ""


def test_armed_marker_carries_profile(benchmod):
    ckpt, spec, hb, hc, hkv = _with_marker(
        benchmod,
        {"ckpt": os.path.join(ROOT, "bench.py"), "spec": 4,
         "batch": 24, "prefill_chunks": 3, "kv": "bf16"})
    assert ckpt.endswith("bench.py") and spec == 4
    assert (hb, hc, hkv) == (24, 3, "bf16")


def test_armed_marker_minimal_fields(benchmod):
    ckpt, spec, hb, hc, hkv = _with_marker(
        benchmod, {"ckpt": os.path.join(ROOT, "bench.py")})
    assert ckpt.endswith("bench.py") and spec == 3
    assert hb is None and hc is None and hkv is None


def test_bad_marker_ignored(benchmod):
    ckpt, _, _, _, _ = _with_marker(benchmod, {"spec": "not-a-ckpt"})
    assert ckpt == ""


def test_ckpt_paths_pin_train_param_policy():
    """Every trained-checkpoint consumer must pin the TRAIN construction
    policy ('bf16': fp32 init draws).  The eval CLI otherwise defaults to
    bf16_params, whose bf16 init draws build a DIFFERENT random frozen
    body than the readout was trained on — measured r4 failure mode:
    templated_frac 0.0 / byte garbage despite train loss 0.92."""
    bench_src = open(os.path.join(ROOT, "bench.py")).read()
    assert '"model.param_policy=bf16"' in bench_src
    t2s_src = open(os.path.join(ROOT, "tools", "train_to_spec.py")).read()
    assert t2s_src.index('FULL_ARCH_EVAL = """param_policy: bf16') > 0
    probe_src = open(os.path.join(ROOT, "tools", "engineprobe.py")).read()
    assert "Policy.bf16() if args.ckpt" in probe_src
