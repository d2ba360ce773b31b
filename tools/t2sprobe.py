"""Train-vs-serve numeric bisection for the t2s degeneration (VERDICT r4 #2).

The r4 full-profile train_to_spec run fit the templated answers to CE 0.95
(teacher-forced) but served "the the the…" — the unigram mode, meaning the
serving-time features were fully DEcorrelated from the training-time
features at the very first token.  Over a random (no-Vicuna-weights)
32-layer body the echo-state readout has ~zero numeric noise margin, so
any train/serve program delta is a candidate.  This probe loads the
trained checkpoint and compares FIRST-ANSWER-TOKEN logits across the
candidate program deltas on the same training images:

  A16  the exact training program: no-cache full attention, aug-concat
       batch (batch_size_train 8 -> effective 16), train_logits method
  A8   same program, no aug concat (isolates batch-width tiling)
  B_*  the serving prefill (cache-writing) at a knob grid:
         kv in {bf16, int8} x chunks in {1, 3} x flash {on, off}

Reported per variant vs A16: first-token argmax agreement, logit cosine,
plus A16's own teacher-forced argmax accuracy over the answer span (does
the readout emit the templates in its OWN program at all?).

Usage:
  python tools/t2sprobe.py --workdir /root/repo/.runs/t2s_diag [--device tpu]
One JSON line on stdout.
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def cosine(a, b):
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    return float((num / den).mean())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/root/repo/.runs/t2s_diag")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--stage", type=int, default=1,
                   help="prompt stage (generate serves stage 1)")
    p.add_argument("--skip", nargs="*", default=[],
                   help="variant names to skip (compile-time budget)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny-arch smoke (CPU; pair with a tiny-profile "
                        "train_to_spec workdir)")
    args = p.parse_args()

    from myriad_tpu.common import dist
    from myriad_tpu.common.tpu_lock import tpu_lock

    dist.configure_platform(args.device if args.device == "cpu" else None, None)
    if args.device != "cpu":
        dist.enable_compilation_cache()
    lock = tpu_lock("t2sprobe", max_hold_s=7200.0, wait_s=3600.0)
    lock.__enter__()

    import jax
    import jax.numpy as jnp

    import myriad_tpu.models  # noqa: F401
    import myriad_tpu.processors  # noqa: F401
    from myriad_tpu.datasets.anomaly_detection import AnomalyDetectionDataset
    from myriad_tpu.datasets.loaders import DataLoader
    from myriad_tpu.generation import _prefill
    from myriad_tpu.models.llama import (LlamaForCausalLM, init_cache,
                                         serving_cache_dtype)
    from myriad_tpu.models.myriad import Myriad, MyriadModule
    from myriad_tpu.processors.blip_processors import LocImageTrainProcessor
    from myriad_tpu.processors.blip_processors import BlipCaptionProcessor

    workdir = args.workdir
    ckpt_dirs = []
    for dirpath, dirs, _ in os.walk(os.path.join(workdir, "train_out")):
        ckpt_dirs += [os.path.join(dirpath, d) for d in dirs
                      if d.startswith("checkpoint_")]
    ckpt = max(ckpt_dirs, key=lambda d: int(d.rsplit("_", 1)[1]))

    # mirror tools/train_to_spec.py FULL_ARCH_EVAL exactly, minus the knobs
    # the probe itself sweeps (kv dtype / chunks live in the generate
    # config, not the weights)
    if args.tiny:
        cfg = {
            "arch_preset": "tiny", "image_size": 28, "llm_vocab_size": 320,
            "train_llm_head": True, "vit_precision": "fp32",
            "use_lora": True, "use_ve": True, "max_txt_len": 64,
            "end_sym": "###",
            "prompt_template": "###Human: {} ###Assistant: ",
            "ckpt": ckpt,
        }
    else:
        cfg = {
            "param_policy": "bf16", "llm_weight_dtype": "int8",
            "vit_weight_dtype": "int8", "ve_weight_dtype": "int8",
            "qformer_weight_dtype": "int8", "train_llm_head": True,
            "use_lora": True, "use_ve": True, "max_txt_len": 96,
            "end_sym": "###", "prompt_template": "###Human: {} ###Assistant: ",
            "ckpt": ckpt, "train_add_bos": False,
        }
    model = Myriad.from_config(cfg)

    data_root = os.path.join(workdir, "data")
    ds = AnomalyDetectionDataset(
        LocImageTrainProcessor(identity=True), BlipCaptionProcessor(),
        data_root, ve_root="", ann_paths=["DC_MVTEC_train_normal.jsonl"],
        img_size=model.arch.img_size, crop_size=model.arch.img_size,
        stage="train")
    ve = model.vision_expert
    classes = sorted({a["img_path"].split("/")[1] for a in ds.annotation})
    ve.class_names = classes
    ve.class_index = {c: i for i, c in enumerate(classes)}
    ve.build_text_features()
    loader = DataLoader(ds, batch_size=args.batch, num_workers=0)
    samples = next(iter(loader))

    image, question, texts, maps, _one = model.prepare_sample(
        samples, args.stage, training=True)
    before, after = model.split_prompt(question)
    text_ids, text_mask = model.tokenize_targets(texts)
    b_full = image.shape[0]          # with aug concat (training's view)
    b_plain = args.batch
    params = model.params
    before_j, after_j = jnp.asarray(before), jnp.asarray(after)
    stage = args.stage

    # ---- A: the training program (no cache, full attention) --------------
    @jax.jit
    def a_logits(params, image, maps, text_ids, text_mask):
        logits, pfx = model.module.apply(
            {"params": params}, image, maps, before_j, after_j,
            text_ids, text_mask, stage, add_bos=model.train_add_bos,
            method=MyriadModule.train_logits)
        return logits, pfx

    out = {"metric": "t2sprobe", "ckpt": ckpt, "stage": stage,
           "batch_plain": b_plain, "batch_aug": int(b_full)}

    maps_j = jnp.asarray(maps)
    img_j = jnp.asarray(image)
    la16, pfx = a_logits(params, img_j, maps_j,
                         jnp.asarray(text_ids), jnp.asarray(text_mask))
    la16 = np.asarray(la16, np.float32)
    pfx = int(pfx)
    # teacher-forced argmax accuracy over the masked answer span: does the
    # readout emit the templates inside its own program?
    pred = la16[:, pfx - 1:-1].argmax(-1)
    m = text_mask.astype(bool)
    out["teacher_forced_acc"] = round(
        float((pred[m] == text_ids[m]).mean()), 4)
    out["first_token_target"] = text_ids[:3, 0].tolist()
    a16_first = la16[:b_plain, pfx - 1]          # rows without aug
    out["a16_first_argmax"] = a16_first.argmax(-1)[:8].tolist()

    la8, _ = a_logits(params, img_j[:b_plain], maps_j[:b_plain],
                      jnp.asarray(text_ids[:b_plain]),
                      jnp.asarray(text_mask[:b_plain]))
    a8_first = np.asarray(la8, np.float32)[:, pfx - 1]
    out["a8_vs_a16"] = {
        "argmax_match": round(float((a8_first.argmax(-1)
                                     == a16_first.argmax(-1)).mean()), 3),
        "cosine": round(cosine(a8_first, a16_first), 6),
    }

    # ---- B: the serving prefill grid --------------------------------------
    def b_first(kv, chunks, flash):
        lcfg = dataclasses.replace(model.arch.llama, flash_prefill=flash)
        llama = LlamaForCausalLM(lcfg, model.policy.compute_dtype,
                                 model.policy.param_dtype)
        cache_dtype = (serving_cache_dtype(
            dataclasses.replace(lcfg, kv_cache_dtype=kv),
            model.policy.compute_dtype))

        @jax.jit
        def fn(params, image, maps):
            embeds = model.module.apply(
                {"params": params}, image, maps, before_j, after_j, stage,
                add_bos=False, method=MyriadModule.prefill_embeds)
            b, t, _ = embeds.shape
            cache = init_cache(llama.config, b, ((t + 90 + 31) // 32) * 32,
                               cache_dtype)
            logits, _ = _prefill(llama, {"params": params["llama"]},
                                 embeds, cache, chunks)
            return logits[:, -1]

        return np.asarray(fn(params, img_j[:b_plain], maps_j[:b_plain]),
                          np.float32)

    grid = [("bf16_c1", "bf16", 1, True), ("bf16_c3", "bf16", 3, True),
            ("int8_c1", "int8", 1, True), ("int8_c3", "int8", 3, True),
            ("bf16_c1_noflash", "bf16", 1, False)]
    for name, kv, chunks, flash in grid:
        if name in args.skip:
            continue
        first = b_first(kv, chunks, flash)
        out[f"b_{name}"] = {
            "argmax_match_vs_a16": round(
                float((first.argmax(-1) == a16_first.argmax(-1)).mean()), 3),
            "argmax_match_vs_a8": round(
                float((first.argmax(-1) == a8_first.argmax(-1)).mean()), 3),
            "cosine_vs_a16": round(cosine(first, a16_first), 6),
            "argmax": first.argmax(-1)[:8].tolist(),
        }
        print(f"[probe] {name}: {out['b_' + name]}", file=sys.stderr,
              flush=True)

    # ---- generalization: the SAME training program on UNSEEN test images --
    # r5 D1 showed matched-numerics serving still degenerates, so the rival
    # hypothesis is train->test image generalization: a chaotic random body
    # maps unseen images to decorrelated features and the memorizing
    # readout emits the corpus mode.  Teacher-force the test images'
    # ground-truth templates through the training program itself: low
    # accuracy HERE proves the failure is generalization, not numerics.
    if "test" not in args.skip:
        from myriad_tpu.datasets.anomaly_detection import (ABNORMAL_DESCRIBE,
                                                           NORMAL_DESCRIBE)

        ds_t = AnomalyDetectionDataset(
            LocImageTrainProcessor(identity=True), BlipCaptionProcessor(),
            data_root, ve_root="",
            ann_paths=["DC_MVTEC_test_normal.jsonl"],
            img_size=model.arch.img_size, crop_size=model.arch.img_size,
            stage="test")
        samples_t = next(iter(DataLoader(ds_t, batch_size=b_plain,
                                         num_workers=0)))
        image_t, _, _, maps_t, _ = model.prepare_sample(
            samples_t, args.stage, training=False)
        texts_t = [ABNORMAL_DESCRIBE if a else NORMAL_DESCRIBE
                   for a in samples_t["is_anomaly"]]
        tids_t, tmask_t = model.tokenize_targets(texts_t)
        # pad to the aug-concat width so the SAME a_logits program runs
        # (avoids a second full-attention compile): duplicate the batch
        reps = -(-b_full // b_plain)
        img_t = jnp.asarray(np.tile(image_t, (reps, 1, 1, 1))[:b_full])
        maps_tj = jnp.asarray(np.tile(np.asarray(maps_t),
                                      (reps, 1, 1, 1))[:b_full])
        tids_f = np.tile(tids_t, (reps, 1))[:b_full]
        tmask_f = np.tile(tmask_t, (reps, 1))[:b_full]
        la_t, _ = a_logits(params, img_t, maps_tj, jnp.asarray(tids_f),
                           jnp.asarray(tmask_f))
        la_t = np.asarray(la_t, np.float32)[:b_plain]
        pred_t = la_t[:, pfx - 1:-1].argmax(-1)
        m_t = tmask_t.astype(bool)
        out["test_teacher_forced_acc"] = round(
            float((pred_t[m_t] == tids_t[m_t]).mean()), 4)
        out["test_first_argmax"] = la_t[:, pfx - 1].argmax(-1)[:8].tolist()
        out["test_first_target"] = tids_t[:3, 0].tolist()
        print(f"[probe] test-image teacher-forced acc "
              f"{out['test_teacher_forced_acc']} "
              f"(train-image {out['teacher_forced_acc']})",
              file=sys.stderr, flush=True)

    print(json.dumps(out))
    lock.__exit__(None, None, None)


if __name__ == "__main__":
    main()
