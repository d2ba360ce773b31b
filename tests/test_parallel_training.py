"""Sharded training over the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_dryrun_multichip_entrypoints():
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    loss = float(jax.jit(fn)(*args))
    assert np.isfinite(loss)
    g.dryrun_multichip(8)
    g.dryrun_multichip(2)


def test_runner_with_mesh(tmp_path):
    """Full runner path with use_mesh + model_shards=2 on 8 CPU devices."""
    import jax
    import textwrap

    from tests.fixtures import make_ad_dataset
    import myriad_tpu.datasets  # noqa: F401
    import myriad_tpu.models  # noqa: F401
    import myriad_tpu.runners  # noqa: F401
    import myriad_tpu.tasks as tasks
    from myriad_tpu.common.config import Config
    from myriad_tpu.common.registry import registry
    from jax.sharding import PartitionSpec as P

    root = tmp_path / "data"
    make_ad_dataset(str(root), classes=("bottle",), n_train=8, img_size=64)
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(textwrap.dedent(f"""
        model:
          arch: myriad
          model_type: pretrain_vicuna
          arch_preset: tiny
          image_size: 28
          use_ve: False
          use_lora: True
          max_txt_len: 16
          end_sym: "###"
        datasets:
          anomaly_detection:
            img_size: 28
            crop_size: 28
            build_info:
              storage: {root}
              ann_paths: [DC_MVTEC_train_normal.jsonl]
            vis_processor:
              train: {{name: loc_image_train, identity: True}}
            text_processor:
              train: {{name: blip_caption}}
        run:
          task: image_text_pretrain
          init_lr: 1e-3
          min_lr: 0
          max_epoch: 1
          iters_per_epoch: 2
          batch_size_train: 16   # halved to 8, doubled by aug -> 16 = 4 data shards x 4
          num_workers: 0
          seed: 0
          output_dir: {tmp_path}/out
          use_mesh: True
          model_shards: 2
    """))
    cfg = Config(cfg_path=str(cfg_file))
    task = tasks.setup_task(cfg)
    datasets = task.build_datasets(cfg)
    # shrink images for tiny arch
    from tests.test_training import _Shrink

    datasets["anomaly_detection"]["train"] = _Shrink(datasets["anomaly_detection"]["train"])
    model = task.build_model(cfg)
    runner = registry.get_runner_class("runner_base")(
        cfg=cfg, task=task, model=model, datasets=datasets, job_id="mesh")
    assert runner.mesh is not None
    assert dict(zip(runner.mesh.axis_names, runner.mesh.devices.shape)) == {
        "data": 4, "model": 2}
    # frozen llama kernels sharded over 'model'
    qk = model.frozen["llama"]["model"]["layers_0"]["self_attn"]["q_proj"]["base"]["kernel"]
    assert qk.sharding.spec == P(None, "model")
    runner.train()
    # loss logged and finite
    import json, os

    with open(os.path.join(runner.output_dir, "log.txt")) as f:
        lines = [json.loads(l) for l in f]
    assert np.isfinite(float(lines[-1]["train_loss"]))


def test_sharded_generation_matches_unsharded():
    """Serving path under GSPMD: params sharded over ('data','model'),
    greedy tokens identical to the single-device run."""
    import jax
    import jax.numpy as jnp

    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.myriad import Myriad, MyriadArch
    from myriad_tpu.parallel import mesh as mesh_lib
    from myriad_tpu.parallel import partition

    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###", seed=0)
    s = {
        "image": np.zeros((4, 28, 28, 3), np.float32),
        "scene": ["bottle"] * 4,
        "question": ["<Img><ImageHere></Img>find defects"] * 4,
        "question2": ["<Img><ImageHere></Img>find defects"] * 4,
        "question3": ["<Img><ImageHere></Img>find defects"] * 4,
        "img_path": ["x"] * 4,
    }
    ref = np.asarray(model.generate(s, max_new_tokens=5)["token_ids"])

    mesh = mesh_lib.make_mesh(n_model=2)
    rules = partition.myriad_rules()
    model.trainable = jax.device_put(
        model.trainable, partition.tree_shardings(model.trainable, mesh, rules))
    model.frozen = jax.device_put(
        model.frozen, partition.tree_shardings(model.frozen, mesh, rules))
    model._jit_cache.clear()
    sharded = np.asarray(model.generate(s, max_new_tokens=5)["token_ids"])
    np.testing.assert_array_equal(sharded, ref)


def test_sharded_speculative_matches_unsharded():
    """Speculative decoding under GSPMD: the vmap'd per-row cache writes
    and position-causal masks must partition cleanly; tokens identical to
    both the sharded greedy run and the single-device spec run."""
    import jax

    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.myriad import Myriad, MyriadArch
    from myriad_tpu.parallel import mesh as mesh_lib
    from myriad_tpu.parallel import partition

    s = {
        "image": np.zeros((4, 28, 28, 3), np.float32),
        "scene": ["bottle"] * 4,
        "question": ["<Img><ImageHere></Img>find defects"] * 4,
        "img_path": ["x"] * 4,
    }
    greedy = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                    max_txt_len=16, end_sym="###", seed=0)
    ref = np.asarray(greedy.generate(s, max_new_tokens=6)["token_ids"])

    model = Myriad(arch=MyriadArch.tiny(), use_ve=False, policy=Policy.fp32(),
                   max_txt_len=16, end_sym="###", seed=0, spec_k=2)
    mesh = mesh_lib.make_mesh(n_model=2)
    rules = partition.myriad_rules()
    model.trainable = jax.device_put(
        model.trainable, partition.tree_shardings(model.trainable, mesh, rules))
    model.frozen = jax.device_put(
        model.frozen, partition.tree_shardings(model.frozen, mesh, rules))
    sharded_spec = np.asarray(model.generate(s, max_new_tokens=6)["token_ids"])
    np.testing.assert_array_equal(sharded_spec, ref)
