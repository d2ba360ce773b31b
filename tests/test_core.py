"""Core substrate tests: registry, config merge, LR schedules, mesh."""

import math
import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myriad_tpu.common.config import Config, ConfigDict, parse_dotlist
from myriad_tpu.common.optim import build_schedule, make_optimizer
from myriad_tpu.common.registry import Registry, registry
from myriad_tpu.parallel import mesh as mesh_lib
from myriad_tpu.parallel import partition
from jax.sharding import PartitionSpec as P


def test_registry_roundtrip():
    r = Registry()

    @r.register_model("foo")
    class Foo:
        pass

    assert r.get_model_class("foo") is Foo
    with pytest.raises(KeyError):
        r.get_model_class("bar")
    # re-register same class is idempotent; different class raises
    r.register_model("foo")(Foo)
    with pytest.raises(KeyError):

        @r.register_model("foo")
        class Foo2:
            pass


def test_configdict_merge_and_dotlist():
    base = ConfigDict({"a": {"b": 1, "c": 2}, "d": [1, 2]})
    base.merge({"a": {"b": 5}, "e": "x"})
    assert base.a.b == 5 and base.a.c == 2 and base.e == "x"
    over = parse_dotlist(["run.init_lr=1e-4", "model.use_lora=True", "name=abc"])
    assert over.run.init_lr == pytest.approx(1e-4)
    assert over.model.use_lora is True
    assert over.name == "abc"


def test_config_three_way_merge(tmp_path):
    # a fake model with a default yaml
    default = tmp_path / "default.yaml"
    default.write_text(
        textwrap.dedent(
            """
            model:
              image_size: 224
              num_query_token: 32
              freeze_vit: True
            """
        )
    )

    @registry.register_model("_test_arch")
    class _TestModel:
        @classmethod
        def default_config_path(cls, model_type):
            return str(default)

    user = tmp_path / "user.yaml"
    user.write_text(
        textwrap.dedent(
            """
            model:
              arch: _test_arch
              model_type: base
              freeze_vit: False
              max_txt_len: 160
            run:
              task: image_text_pretrain
              seed: 42
            """
        )
    )
    cfg = Config(cfg_path=str(user), options=["model.max_txt_len=90"])
    assert cfg.model_cfg.image_size == 224  # from default
    assert cfg.model_cfg.freeze_vit is False  # user wins
    assert cfg.model_cfg.max_txt_len == 90  # dotlist wins
    assert cfg.run_cfg.seed == 42


def test_cosine_schedule_matches_reference_formula():
    sched = build_schedule(
        "linear_warmup_cosine_lr",
        init_lr=1e-4,
        min_lr=0.0,
        max_epoch=10,
        iters_per_epoch=100,
        warmup_steps=20,
        warmup_start_lr=1e-6,
    )
    # warmup: linear from 1e-6 to 1e-4 over 20 steps
    assert float(sched(0)) == pytest.approx(1e-6)
    assert float(sched(10)) == pytest.approx(1e-6 + (1e-4 - 1e-6) * 0.5, rel=1e-5)
    # cosine after warmup: reference formula
    for step in [20, 500, 999]:
        expect = (1e-4 - 0.0) * 0.5 * (1 + math.cos(math.pi * step / 1000)) + 0.0
        assert float(sched(step)) == pytest.approx(expect, rel=1e-5)


def test_step_schedule():
    sched = build_schedule(
        "linear_warmup_step_lr",
        init_lr=1e-3,
        min_lr=1e-5,
        iters_per_epoch=10,
        decay_rate=0.1,
        warmup_steps=5,
        warmup_start_lr=0.0,
    )
    assert float(sched(15)) == pytest.approx(1e-4, rel=1e-5)  # epoch 1
    assert float(sched(95)) == pytest.approx(1e-5, rel=1e-5)  # clamped


def test_optimizer_decay_mask_and_step():
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    tx = make_optimizer(build_schedule(
        "linear_warmup_cosine_lr", init_lr=0.1, min_lr=0.0,
        max_epoch=1, iters_per_epoch=10, warmup_steps=0), weight_decay=0.5)
    state = tx.init(params)
    grads = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    updates, state = tx.update(grads, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    # weight decayed, bias untouched (zero grad, no decay)
    assert float(jnp.abs(new["w"] - 1.0).max()) > 1e-4
    assert float(jnp.abs(new["b"] - 1.0).max()) < 1e-6


def test_mesh_and_partition_rules():
    m = mesh_lib.make_mesh(n_model=4)
    assert m.devices.shape == (2, 4)
    params = {
        "llama": {
            "layers_0": {"self_attn": {"q_proj": {"kernel": jnp.zeros((16, 8))}}},
            "norm": {"scale": jnp.zeros((16,))},
        }
    }
    sh = partition.tree_shardings(params, m, partition.myriad_rules())
    q = sh["llama"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert q.spec == P(None, "model")
    assert sh["llama"]["norm"]["scale"].spec == P()
    # non-divisible dims fall back to replicated
    params2 = {"llama": {"layers_0": {"self_attn": {"q_proj": {"kernel": jnp.zeros((16, 6))}}}}}
    sh2 = partition.tree_shardings(params2, m, partition.myriad_rules())
    assert sh2["llama"]["layers_0"]["self_attn"]["q_proj"]["kernel"].spec == P()


def test_shard_batch_places_on_data_axis():
    m = mesh_lib.make_mesh()
    batch = {"x": np.zeros((16, 3)), "y": np.zeros((16,))}
    out = mesh_lib.shard_batch(batch, m)
    assert out["x"].sharding.spec == P("data", None)
