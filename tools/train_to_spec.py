"""Train -> checkpoint -> speculative serve, end to end (VERDICT r3 #2).

The speculative headline has so far been an oracle bound (18.36 img/s at
100% draft acceptance) bracketed by a random-weight floor (8.0) — real
acceptance needs a model whose greedy generations actually emit the
task's templated answers (reference anomaly_detection.py:332-337:
"Yes/No, there exists ... anomalies in the image").  This driver closes
the loop in-sandbox:

  1. builds a synthetic AD tree (tests/fixtures.make_ad_dataset);
  2. runs the REAL train CLI (train.py, stage-2 LoRA envelope per the
     reference train_configs/loraadapter_simple_myriad_finetune.yaml)
     until the templated answers dominate the CE loss;
  3. points the REAL eval CLI (evaluation_aqa_dataset.py) at the run's
     orbax checkpoint with `llm_spec_k` enabled;
  4. reports measured spec_acceptance + img/s and a few sample outputs.

Profiles: `tiny` proves the loop on CPU minutes (ByteTokenizer ids need
`llm_vocab_size: 320`); `full` is the d32 int8 TPU measurement run.

Usage:
  python tools/train_to_spec.py --profile tiny --workdir /tmp/t2s
  python tools/train_to_spec.py --profile full --workdir /tmp/t2s_full \
      [--epochs 2 --iters 150 --batch 8 --bs-eval 24 --spec 3]

One summary JSON line on stdout (sweep-queue convention).
"""

import argparse
import json
import os
import subprocess
import sys
import textwrap
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


TRAIN_YAML = """
model:
  arch: myriad
  model_type: pretrain_vicuna
  {arch_lines}
  freeze_vit: True
  freeze_qformer: True
  use_lora: True
  use_ve: True
  max_txt_len: {max_txt_len}
  end_sym: "###"
  prompt_template: '###Human: {{}} ###Assistant: '
datasets:
  anomaly_detection:
    img_size: {img_size}
    crop_size: {img_size}
    build_info:
      storage: {data_root}
      ann_paths:
        - DC_MVTEC_train_normal.jsonl
    vis_processor:
      train: {{name: "loc_image_train", identity: True, image_size: {img_size}}}
    text_processor:
      train: {{name: "blip_caption"}}
run:
  task: image_text_pretrain
  device: {device}
  # bf16 first moments: the HBM knob for the 246M-trainable echo-state
  # profile (lm_head readout) — fp32 mu OOM'd the d32 int8 step at batch 4
  optimizer_mu_dtype: bfloat16
  lr_sched: "linear_warmup_cosine_lr"
  init_lr: {lr}
  min_lr: 0
  warmup_lr: 1e-6
  weight_decay: {weight_decay}
  max_epoch: {epochs}
  iters_per_epoch: {iters}
  batch_size_train: {batch}
  num_workers: 0
  warmup_steps: {warmup}
  seed: 42
  output_dir: {out_dir}
  max_checkpoints: 2
"""

EVAL_YAML = """
model:
  arch: myriad
  {arch_lines}
  use_lora: True
  use_ve: True
  max_txt_len: {max_txt_len}
  end_sym: "###"
  prompt_template: '###Human: {{}} ###Assistant: '
  ckpt: {ckpt}
  llm_spec_k: {spec}
datasets:
  anomaly_detection:
    img_size: {img_size}
    crop_size: {img_size}
    build_info: {{storage: {data_root}}}
run:
  task: image_text_pretrain
  device: {device}
"""

# the serving quant profile (BENCH_NOTES reproduction command).
# train_llm_head: the in-sandbox body is RANDOM (no Vicuna weights), and
# LoRA over a random frozen body cannot learn the LM task (measured:
# loss plateaus at ~4.5 = unigram entropy, r4 overfit probes) — but a
# trained OUTPUT readout over the frozen random features emits the
# templated answers exactly (echo-state probe, myriad.py
# _trainable_predicate note).  The eval config must set it too so the
# checkpoint's lm_head merges into the trainable tree (trainable-only
# checkpoints, base.load_checkpoint).
FULL_ARCH_TRAIN = """param_policy: bf16
  llm_weight_dtype: int8
  vit_weight_dtype: int8
  ve_weight_dtype: int8
  qformer_weight_dtype: int8
  train_llm_head: True
  use_grad_checkpoint: True"""
# param_policy MUST match training's ('bf16': fp32 init draws, frozen
# cast to bf16 after).  Without it the eval CLI defaults to 'bf16_params'
# (evaluation_aqa_dataset.py:264), whose bf16 init DRAWS differ from
# fp32-drawn-then-cast values — a *different random frozen body* whose
# int8 codes diverge, so the trained echo-state readout sees decorrelated
# layer-32 features and generates byte garbage (r4: templated_frac 0.0
# with loss 0.92; tiny passed only because vit_precision: fp32 disables
# that setdefault).
FULL_ARCH_EVAL = """param_policy: bf16
  llm_weight_dtype: int8
  llm_kv_dtype: {kv}
  vit_weight_dtype: int8
  ve_weight_dtype: int8
  qformer_weight_dtype: int8
  train_llm_head: True
  llm_prefill_chunks: {chunks}"""
TINY_ARCH = """arch_preset: tiny
  image_size: 28
  llm_vocab_size: 320
  train_llm_head: True
  vit_precision: fp32"""


def run_cmd(cmd, log_path, timeout):
    t0 = time.time()
    with open(log_path, "w") as f:
        proc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                              text=True, cwd=ROOT, timeout=timeout)
    wall = time.time() - t0
    if proc.returncode != 0:
        tail = open(log_path).read()[-3000:]
        raise SystemExit(f"command failed ({cmd[1]}):\n{tail}")
    return wall


def find_last_checkpoint(out_dir):
    hits = []
    for dirpath, dirs, _ in os.walk(out_dir):
        for d in dirs:
            if d.startswith("checkpoint_") and d.split("_")[-1].isdigit():
                hits.append((int(d.split("_")[-1]), os.path.join(dirpath, d)))
    if not hits:
        raise SystemExit(f"no checkpoint under {out_dir}")
    return max(hits)[1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--profile", choices=["tiny", "full"], default="tiny")
    p.add_argument("--workdir", default="/tmp/train_to_spec")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--iters", type=int, default=None,
                   help="iters per epoch")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--bs-eval", type=int, default=None)
    p.add_argument("--spec", type=int, default=3)
    p.add_argument("--max-new", type=int, default=None)
    p.add_argument("--n-test", type=int, default=None)
    p.add_argument("--n-train", type=int, default=None,
                   help="synthetic train images (default max(32, 4*batch)).  "
                        "r5 diagnosis: 32 base images let the trainable "
                        "stack MEMORIZE per-image feature keys of the "
                        "chaotic random body (train teacher-forced acc "
                        "high, test acc ~0, rollout emits the corpus "
                        "n-gram mode); hundreds of images force the "
                        "image-invariant echo-state solution")
    p.add_argument("--weight-decay", type=float, default=0.05,
                   help="optimizer weight decay (higher biases the readout "
                        "away from key-memorization)")
    p.add_argument("--prefill-chunks", type=int, default=3,
                   help="full profile eval: memory knob at real prompt "
                        "buckets (BENCH_NOTES: spec fits b24@1 / b32@3)")
    p.add_argument("--eval-kv", choices=["int8", "bf16"], default="int8",
                   help="full profile eval KV-cache dtype.  bf16 + "
                        "--prefill-chunks 1 is the VERDICT r4 #2 "
                        "diagnostic: the train forward never sees int8 KV "
                        "or chunked prefill, and an echo-state readout "
                        "over a random 32-layer body has ~zero noise "
                        "margin for eval-only numeric skew")
    p.add_argument("--skip-train", action="store_true",
                   help="reuse the workdir's existing checkpoint")
    p.add_argument("--train-no-bos", action="store_true",
                   help="train WITHOUT the bos embedding (model.train_add_bos"
                        "=False) so the TRAIN forward matches the bos-free "
                        "serving numerics exactly — the echo-state readout "
                        "over a random 32-layer body cannot absorb the "
                        "missing-bos feature shift a pretrained Vicuna "
                        "shrugs off (r4: bos-trained full-profile ckpt "
                        "generated byte garbage, templated_frac 0.0)")
    p.add_argument("--eval-bos", action="store_true",
                   help="serve WITH a bos embedding (model.bos_at_generate="
                        "True), aligning eval with the bos-trained forward "
                        "instead — the cheap diagnostic direction (reuses "
                        "the training checkpoint/compile; the serve path "
                        "deviates from the reference's bos-free semantics)")
    args = p.parse_args()

    tiny = args.profile == "tiny"
    if not tiny:
        # hold the chip fence across BOTH subprocess CLIs (they re-enter
        # via the inherited MYRIAD_TPU_LOCK_TOKEN) — the r4 contamination
        # was exactly this driver straddling the judge's bench window
        import atexit

        from myriad_tpu.common.tpu_lock import tpu_lock

        _lock = tpu_lock("train_to_spec", max_hold_s=18000.0, wait_s=3600.0)
        _lock.__enter__()
        atexit.register(_lock.__exit__, None, None, None)
    epochs = args.epochs or (3 if tiny else 2)
    iters = args.iters or (120 if tiny else 150)
    batch = args.batch or (8 if tiny else 8)
    lr = args.lr or (3e-3 if tiny else 1e-4)
    bs_eval = args.bs_eval or (8 if tiny else 24)
    max_new = args.max_new or (48 if tiny else 90)
    n_test = args.n_test or (24 if tiny else 340)
    img_size = 28 if tiny else 224
    device = "cpu" if tiny else "tpu"

    os.makedirs(args.workdir, exist_ok=True)
    data_root = os.path.join(args.workdir, "data")
    out_dir = os.path.join(args.workdir, "train_out")
    n_train = args.n_train or max(32, batch * 4)
    if not os.path.isdir(os.path.join(data_root, "mvtec")):
        from fixtures import make_ad_dataset

        make_ad_dataset(data_root, dataset="mvtec", classes=("bottle",),
                        n_train=n_train, n_test=n_test,
                        img_size=img_size, seed=0)

    summary = {"metric": f"train_to_spec ({args.profile})", "unit": "mixed",
               "n_train": n_train, "weight_decay": args.weight_decay}
    if args.train_no_bos:
        summary["train_add_bos"] = False
    if args.eval_bos:
        summary["eval_bos"] = True

    if not args.skip_train:
        train_cfg = os.path.join(args.workdir, "train.yaml")
        train_arch = TINY_ARCH if tiny else FULL_ARCH_TRAIN
        if args.train_no_bos:
            train_arch += "\n  train_add_bos: False"
        with open(train_cfg, "w") as f:
            f.write(TRAIN_YAML.format(
                arch_lines=train_arch,
                # train-time 96: the templated answers are <40 tokens and
                # the CE-logits + activation buffers scale with it (eval
                # keeps 160 — the serving profile)
                max_txt_len=64 if tiny else 96, img_size=img_size,
                data_root=data_root, device=device, lr=lr, epochs=epochs,
                iters=iters, batch=batch, out_dir=out_dir,
                weight_decay=args.weight_decay,
                warmup=min(50, iters // 2)))
        wall = run_cmd([sys.executable, os.path.join(ROOT, "train.py"),
                        "--cfg-path", train_cfg],
                       os.path.join(args.workdir, "train.log"),
                       timeout=3600 if tiny else 14400)
        summary["train_wall_s"] = round(wall, 1)
        # loss trajectory from the runner's json-line log
        losses = []
        for dirpath, _, files in os.walk(out_dir):
            if "log.txt" in files:
                for line in open(os.path.join(dirpath, "log.txt")):
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "train_loss" in row:
                        losses.append(float(row["train_loss"]))
        summary["train_loss_first"] = round(losses[0], 4) if losses else None
        summary["train_loss_last"] = round(losses[-1], 4) if losses else None

    ckpt = find_last_checkpoint(out_dir)
    summary["ckpt"] = ckpt

    eval_cfg = os.path.join(args.workdir, "eval.yaml")
    eval_arch = (TINY_ARCH if tiny
                 else FULL_ARCH_EVAL.format(chunks=args.prefill_chunks,
                                            kv=args.eval_kv))
    if args.eval_kv != "int8":
        summary["eval_kv"] = args.eval_kv
    summary["prefill_chunks"] = args.prefill_chunks
    if args.eval_bos:
        eval_arch += "\n  bos_at_generate: True"
    with open(eval_cfg, "w") as f:
        f.write(EVAL_YAML.format(
            arch_lines=eval_arch,
            max_txt_len=64 if tiny else 160, img_size=img_size, ckpt=ckpt,
            spec=args.spec, data_root=data_root, device=device))
    results = os.path.join(args.workdir, "results.jsonl")
    eval_log = os.path.join(args.workdir, "eval.log")
    wall = run_cmd([sys.executable,
                    os.path.join(ROOT, "evaluation_aqa_dataset.py"),
                    "--cfg-path", eval_cfg, "--task_type", "1cls",
                    "--split", "mvtec", "--bs", str(bs_eval),
                    "--save_path", results, "--bench", "--greedy",
                    "--max_new_tokens", str(max_new)],
                   eval_log, timeout=3600 if tiny else 10800)
    summary["eval_wall_s"] = round(wall, 1)

    bench_lines = [l for l in open(eval_log)
                   if l.startswith("{") and "images/sec" in l]
    if bench_lines:
        rec = json.loads(bench_lines[-1])
        summary["images_per_sec"] = rec["value"]
        summary["spec_acceptance"] = rec.get("spec_acceptance")
        summary["phase_means_s"] = rec.get("phase_means_s")
    rows = [json.loads(l) for l in open(results)]
    summary["n_results"] = len(rows)
    # do greedy generations actually template?  (the training target's
    # shared prefix — see datasets/anomaly_detection.py NORMAL/ABNORMAL)
    templated = sum(r["output"].strip().startswith(("Yes,", "No,"))
                    for r in rows)
    summary["templated_frac"] = round(templated / max(len(rows), 1), 3)
    summary["sample_outputs"] = [r["output"][:80] for r in rows[:3]]
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
