"""AQA/AD evaluation harness (reference evaluation_aqa_dataset.py:233-390,
same CLI and output jsonl schema).

Builds the model from --cfg-path, runs batched greedy decode over the
MVTec-AD / VisA test jsonl and writes one result row per image:
{image_id, image_path, is_anomaly, error, output, anomaly_score}.

Decode protocol matches the reference: max_new_tokens=90, stop on '###'
([835] / [2277,29937]), top_p=0.01 (≈greedy; pass --greedy for the exact
deterministic path the README pledges).  The dead task types of the
reference (aqa/roi/al/adroi reference missing dataset classes,
SURVEY.md §2.8) are rejected with a clear message.
"""

import argparse
import json
import os
import time
from datetime import datetime

import numpy as np

import myriad_tpu.datasets  # noqa: F401 - registration
import myriad_tpu.models  # noqa: F401 - registration
import myriad_tpu.processors  # noqa: F401 - registration
from myriad_tpu.common import dist
from myriad_tpu.common.config import Config
from myriad_tpu.common.logger import setup_logger
from myriad_tpu.common.registry import registry
from myriad_tpu.datasets.anomaly_detection import AnomalyDetectionDataset
from myriad_tpu.datasets.loaders import DataLoader
from myriad_tpu.processors.blip_processors import LocImageTrainProcessor
from myriad_tpu.processors import functional as F
from PIL import Image

LIVE_TASKS = ("ad", "ad_few", "1cls", "shot")
DEAD_TASKS = ("aqa", "roi", "al", "adroi")  # reference classes missing (SURVEY §2.8)

ANNO_FILES = {
    "ad": {"eval": "DC_MVTEC_test_normal.jsonl"},
    "ad_few": {"eval": "DC_VISA_test_normal.jsonl"},
    "1cls": {"visa": "DC_VISA_test_normal.jsonl", "mvtec": "DC_MVTEC_test_normal.jsonl"},
    "shot": {"visa": "DC_VISA_test_normal.jsonl", "mvtec": "DC_MVTEC_test_normal.jsonl"},
}


def parse_args():
    p = argparse.ArgumentParser(description="AQA evaluation")
    p.add_argument("--cfg-path", required=True)
    p.add_argument("--task_type", type=str, default="1cls",
                   choices=LIVE_TASKS + DEAD_TASKS)
    p.add_argument("--split", type=str, default="mvtec",
                   choices=["eval", "test", "train", "visa", "mvtec"])
    p.add_argument("--ckpt", type=int, default=-1)
    p.add_argument("--bs", type=int, default=1)
    p.add_argument("--round_index", type=int, default=14)
    p.add_argument("--k_shot", type=int, default=0)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--greedy", action="store_true",
                   help="deterministic argmax decode (default matches the "
                        "reference's top_p=0.01 sampling, which is ≈greedy)")
    p.add_argument("--max_new_tokens", type=int, default=90)
    p.add_argument("--engine", action="store_true",
                   help="drive the eval through the continuous-batching "
                        "serving engine (slots=--bs, block KV layout) "
                        "instead of fixed batches — same jsonl rows; "
                        "greedy decode (the engine is greedy-only; the "
                        "default top_p=0.01 is ~greedy and routed the "
                        "same way Myriad.generate routes it)")
    p.add_argument("--engine-segment", type=int, default=32,
                   help="engine decode steps per compiled tick")
    p.add_argument("--engine-block", type=int, default=8,
                   help="engine block KV layout size (0 = per-row)")
    p.add_argument("--engine-admit-chunk", type=int, default=8,
                   help="rows prefilled per admission chunk (engine "
                        "max_admit_chunk; 8 keeps the admission mini-KV "
                        "inside the ~2 GiB headroom at the d32 int8 "
                        "serving profile — r5 capacity finding)")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="batches dispatched ahead of the blocking flush "
                        "(async device queue depth).  1 = the r3 single-"
                        "deep pipeline; 2 (default) also hides the "
                        "~0.5 s/batch host tail the r5 phase split found")
    p.add_argument("--bench", action="store_true",
                   help="print a JSON throughput line (images/sec, excluding "
                        "the first compile batch) after the run")
    p.add_argument("--save_path", type=str, default="")
    p.add_argument("--options", nargs="+")
    return p.parse_args()


def build_dataset(args, ds_cfg, data_root: str):
    if args.task_type in DEAD_TASKS:
        raise SystemExit(
            f"task_type '{args.task_type}' references dataset classes that do "
            "not exist in the reference tree (SURVEY.md §2.8); live types: "
            f"{LIVE_TASKS}"
        )
    ad_cfg = ds_cfg.get("anomaly_detection", {})
    ann = ANNO_FILES[args.task_type][args.split]
    return AnomalyDetectionDataset(
        LocImageTrainProcessor(identity=True),
        None,
        data_root,
        ve_root=ad_cfg.get("build_info", {}).get("ve_storage", ""),
        ann_paths=[ann],
        img_size=ad_cfg.get("img_size", 224),
        crop_size=ad_cfg.get("crop_size", 224),
        with_mask=ad_cfg.get("with_mask", False),
        is_preload=ad_cfg.get("is_preload", True),
        stage="test",
    )


def load_reference_images(paths, size: int = 224):
    """ImageBind-style preprocessing for one-shot reference images
    (reference data.load_and_transform_vision_data: resize 224 bicubic,
    center-crop 224, CLIP normalize)."""
    imgs = []
    for p in paths:
        img = Image.open(p).convert("RGB")
        img = F.center_crop(F.resize_bicubic(img, size), size)
        imgs.append(F.normalize(F.to_float_hwc(img)))
    return np.stack(imgs)


def setup_vision_expert(model, dataset, data_root: str, round_index: int, k_shot: int):
    """Hoist the reference's per-forward text encode + per-step reference
    disk reads into one-time cache builds (SURVEY.md §7.3 risk 3)."""
    from myriad_tpu.models.vision_expert import ReferenceSpec

    ve = model.vision_expert
    if ve is None:
        return
    classes = sorted({ann["img_path"].split("/")[1] for ann in dataset.annotation})
    ve.class_names = classes
    ve.class_index = {c: i for i, c in enumerate(classes)}
    ve._text_feats = None
    ve._ref_bank = None
    ve.build_text_features()

    spec = ReferenceSpec(round_index=round_index, k_shot=k_shot)
    refs = {}
    ds_name = "visa" if dataset.is_visa else "mvtec"
    for cls in classes:
        good = os.path.join(data_root, ds_name, cls, "train", "good")
        names = spec.mvtec_names()
        paths = [os.path.join(good, n) for n in names if os.path.isfile(os.path.join(good, n))]
        if not paths and os.path.isdir(good):
            all_files = sorted(os.listdir(good))[: spec.effective_k]
            paths = [os.path.join(good, n) for n in all_files]
        if paths:
            refs[cls] = load_reference_images(paths, model.arch.imagebind.img_size)
    if refs:
        ve.build_reference_bank(refs)


def device_mem_mb() -> float:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / (1024 * 1024)
    except Exception:
        return 0.0


def run_engine_eval(args, model, dataloader, save_path):
    """Drive the eval through the continuous-batching serving engine
    (serving/myriad_adapter.py): every test image becomes a request, the
    engine keeps --bs slots busy across admission waves, and rows are
    written as requests finish.  Same jsonl schema as the fixed-batch
    loop; greedy transcripts are engine-exact w.r.t. Myriad.generate
    (tests/test_serving_myriad.py).  With llm_spec_k set on the model the
    engine verifies drafts per weight pass (per-row frontiers); otherwise
    the block KV layout keeps cache writes in place."""
    from myriad_tpu.serving.myriad_adapter import MyriadServing

    spec_k = model.spec_k
    block = 0 if spec_k else args.engine_block
    if block and args.bs % block:
        block = 0
    serving = MyriadServing(
        model, slots=args.bs, segment=args.engine_segment,
        max_new_tokens=args.max_new_tokens, admit_widths=(64, 160, 320),
        spec_k=spec_k, block_size=block,
        max_admit_chunk=args.engine_admit_chunk)
    # the engine may self-heal to per-row (LayoutCoordinationError
    # fallback) — report the EFFECTIVE layout, not the requested one
    block = serving.engine.block_size

    meta = {}
    t0 = time.time()
    n_submitted = 0
    for samples in dataloader:
        bs = len(samples["image_id"])
        rows = []
        for i in range(bs):
            row = {"image": np.asarray(samples["image"])[i:i + 1]}
            for k in ("scene", "question", "question2", "question3",
                      "img_path"):
                if k in samples:
                    v = samples[k][i]
                    row[k] = [v]
            rows.append(row)
        rids = serving.submit_batch(rows, lazy=True)
        for i, rid in enumerate(rids):
            meta[rid] = {
                "image_id": int(samples["image_id"][i]),
                "image_path": "/".join(samples["img_path"][i].split("/")[-5:]),
                "is_anomaly": bool(samples["is_anomaly"][i]),
            }
        n_submitted += bs
    print(f"engine eval: {n_submitted} requests over {args.bs} slots "
          f"(segment {args.engine_segment}, block {block}, spec {spec_k})")

    completions = []
    with open(save_path, "w") as writer:
        while serving.pending:
            for r in serving.step():
                m = meta.pop(r["request_id"])
                text = r["text"].split("###")[0]
                ok = (("Yes" in text and m["is_anomaly"])
                      or ("No" in text and not m["is_anomaly"]))
                item = {
                    "image_id": m["image_id"],
                    "image_path": m["image_path"],
                    "is_anomaly": m["is_anomaly"],
                    "output": text,
                    "error": "0" if ok else "1",
                }
                if "anomaly_score" in r:
                    item["anomaly_score"] = str(round(r["anomaly_score"], 4))
                writer.write(json.dumps(item) + "\n")
                completions.append(time.time())

    print("Device Memory:", device_mem_mb())
    stats = serving.stats
    print("Mean Time: ", (time.time() - t0) / max(stats["ticks"], 1))
    if args.bench and len(completions) > args.bs:
        # steady state: exclude everything up to the first finisher (the
        # compile-paying wave), same warmup protocol as the batch path
        secs = completions[-1] - completions[0]
        imgs = len(completions) - 1
        line = {
            "metric": "images/sec (AQA eval harness, serving engine, "
                      f"{args.max_new_tokens}-token decode"
                      + (f", spec K={spec_k}" if spec_k else "")
                      + (f", block {block}" if block else "") + ")",
            "value": round(imgs / max(secs, 1e-9), 4),
            "unit": "images/sec",
            "requests": len(completions),
            "slots": args.bs,
            "ticks": stats["ticks"],
            "decode_steps": stats["decode_steps"],
            "slot_occupancy": round(
                stats["live_row_steps"]
                / max(stats["decode_steps"] * args.bs, 1), 3),
            "compile_to_first_s": round(completions[0] - t0, 2),
        }
        if stats["spec_drafted"]:
            line["spec_acceptance"] = round(
                stats["spec_accepted"] / stats["spec_drafted"], 4)
        print(json.dumps(line))


def main():
    args = parse_args()
    cfg = Config(args)
    run = cfg.run_cfg if cfg.config.get("run") else {}
    dist.configure_platform(run.get("device"), run.get("host_devices"))
    setup_logger()
    if run.get("device") != "cpu":
        # TPU runs: reuse compiled programs across invocations (the driver's
        # bench harness otherwise pays the full ~6-min serving compile every
        # round) and serialize on the chip fence — re-entrant when we are
        # bench.py's / train_to_spec's subprocess (inherited lock token).
        import atexit

        from myriad_tpu.common.tpu_lock import tpu_lock

        dist.enable_compilation_cache()
        _lock = tpu_lock("eval_aqa", max_hold_s=10800.0, wait_s=1800.0)
        _lock.__enter__()
        atexit.register(_lock.__exit__, None, None, None)

    model_config = cfg.model_cfg
    model_config.round_index = args.round_index
    model_config.k_shot = args.k_shot
    if model_config.get("vit_precision") != "fp32":
        # serving stores frozen towers in bf16 directly (the reference's
        # fp16 conversion); fp32 init of the 8.6B set would OOM one chip
        model_config.setdefault("param_policy", "bf16_params")
    if args.ckpt != -1 and model_config.get("ckpt"):
        parts = model_config.ckpt.split("/")
        parts[-1] = f"checkpoint_{args.ckpt}"
        model_config.ckpt = "/".join(parts)

    model_cls = registry.get_model_class(model_config.arch)
    model = model_cls.from_config(model_config)

    ds_cfg = cfg.datasets_cfg
    data_root = ds_cfg.get("anomaly_detection", {}).get("build_info", {}).get(
        "storage", "./data/EvalADDataset"
    )
    dataset = build_dataset(args, ds_cfg, data_root)
    setup_vision_expert(model, dataset, data_root, args.round_index, args.k_shot)

    dataloader = DataLoader(dataset, batch_size=args.bs, num_workers=4)

    ckpt_name = os.path.basename(str(model_config.get("ckpt", "checkpoint_0")))
    num_ckpt = ckpt_name.split("_")[-1].split(".")[0] or "0"
    prefix = (
        f"results_ckpt{num_ckpt}_training={args.task_type}_split={args.split}"
        f"_kshot={args.k_shot}_roundindex={args.round_index}"
        f"_{datetime.now().strftime('%Y%m%d_%H%M')}"
    )
    save_path = args.save_path or os.path.join(".", f"{prefix}.jsonl")
    print(f"Results will be saved to {save_path}")

    if args.engine:
        run_engine_eval(args, model, dataloader, save_path)
        return

    generate_kwargs = {
        "max_new_tokens": args.max_new_tokens,
        "do_sample": not args.greedy,
        "top_p": 0.01,
        "temperature": 1.0,
    }

    t_loop0 = time.time()
    completions = []  # (wall time when the batch's results landed, real_images)
    spec_totals = {"accepted": 0, "drafted": 0, "rounds": 0}
    # per-batch phase walls (seconds, appended per batch) — decomposes the
    # harness-vs-fixed-batch gap (VERDICT r3 weak #3): `collate` = host
    # dataloader+padding before generate, `dispatch` = model.generate call
    # (host prep + async dispatch; compute NOT included), `wait` = blocked
    # on the device inside flush's first host copy, `hflush` = tokenizer
    # batch_decode + jsonl writes after the copy landed
    phases = {"collate": [], "dispatch": [], "wait": [], "hflush": []}

    def flush(writer, samples, outputs, real_bs):
        """Block on a batch's device results and write its jsonl rows."""
        t_w0 = time.time()
        if "spec_stats" in outputs:  # speculative decode acceptance counters
            for k in spec_totals:
                spec_totals[k] += int(np.asarray(outputs["spec_stats"][k]))
        token_ids = np.asarray(outputs["token_ids"])[:real_bs]
        phases["wait"].append(time.time() - t_w0)
        t_h0 = time.time()
        token_ids = np.clip(token_ids, 1, 40000)
        output_text = model.llama_tokenizer.batch_decode(token_ids)
        maps = np.asarray(outputs.get("ve_anomaly_maps"))
        for ind, text in enumerate(output_text):
            text = text.split("###")[0]
            is_anomaly = bool(samples["is_anomaly"][ind])
            item = {
                "image_id": int(samples["image_id"][ind]),
                "image_path": "/".join(samples["img_path"][ind].split("/")[-5:]),
                "is_anomaly": is_anomaly,
                "output": text,
            }
            if ("Yes" in text and is_anomaly) or ("No" in text and not is_anomaly):
                item["error"] = "0"
            else:
                item["error"] = "1"
            if maps is not None and maps.size:
                item["anomaly_score"] = str(round(float(maps[ind].max()), 4))
            writer.write(json.dumps(item) + "\n")
        phases["hflush"].append(time.time() - t_h0)
        completions.append((time.time(), real_bs))

    # N-deep software pipeline: dispatch up to `depth` batches (JAX queues
    # them asynchronously) BEFORE blocking on the oldest batch's tokens,
    # so host-side tokenize/jsonl/preprocessing overlaps device compute.
    # The reference loop (evaluation_aqa_dataset.py:310-390) fully
    # serializes CPU and GPU work; depth 1 restores the r3 behavior,
    # depth 2 (default) additionally hides the ~0.5 s/batch of host work
    # the r5 phase decomposition found outside the 1-deep window.
    from collections import deque

    depth = max(1, args.pipeline_depth)
    pending = deque()  # (samples, outputs, real_bs)
    with open(save_path, "w") as writer:
        t_c0 = time.time()
        for testid, samples in enumerate(dataloader):
            phases["collate"].append(time.time() - t_c0)
            if testid < args.start:
                t_c0 = time.time()
                continue
            # pad ragged final batches to the bucket size: a new batch shape
            # would recompile the fused decode program (minutes on TPU)
            real_bs = len(samples["image_id"])
            if real_bs < args.bs:
                pad = args.bs - real_bs
                for k, v in list(samples.items()):
                    if isinstance(v, np.ndarray):
                        samples[k] = np.concatenate(
                            [v, np.repeat(v[-1:], pad, axis=0)]
                        )
                    elif isinstance(v, list):
                        samples[k] = v + [v[-1]] * pad
            t_d0 = time.time()
            outputs = model.generate(samples, **generate_kwargs)
            phases["dispatch"].append(time.time() - t_d0)
            pending.append((samples, outputs, real_bs))
            if len(pending) > depth:
                flush(writer, *pending.popleft())
            t_c0 = time.time()
        while pending:
            flush(writer, *pending.popleft())

    n_batches = len(completions)
    print("Device Memory:", device_mem_mb())
    print("Mean Time: ", (time.time() - t_loop0) / max(n_batches, 1))
    if args.bench and n_batches > 2:
        # steady-state throughput between the completion of the first
        # (compile-paying) batch and the last; same warmup-exclusion
        # protocol as bench.py
        secs = completions[-1][0] - completions[0][0]
        imgs = sum(n for _, n in completions[1:])
        line = {
            "metric": "images/sec (AQA eval harness, fused generate, "
                      f"{args.max_new_tokens}-token decode"
                      + (f", spec K={model.spec_k}" if model.spec_k else "")
                      + ")",
            "value": round(imgs / max(secs, 1e-9), 4),
            "unit": "images/sec",
            "batches": n_batches - 1,
            "batch_size": args.bs,
            "compile_batch_s": round(completions[0][0] - t_loop0, 2),
            # steady-state per-batch phase means (first batch excluded, same
            # warmup protocol).  wait ≈ device compute not hidden by the
            # dispatch pipeline; collate/dispatch/hflush are host-side.
            # The residual completion-interval gap beyond their sum is the
            # remote tunnel's per-dispatch latency (~0.5 s/program —
            # depth-2 A/B identical, BENCH_NOTES r5 floor statement).
            "phase_means_s": {
                k: round(float(np.mean(v[1:])), 3) if len(v) > 1 else 0.0
                for k, v in phases.items()
            },
        }
        if spec_totals["drafted"]:
            # measured draft acceptance: where this run sits between the
            # n-gram floor and the oracle bound (BENCH_NOTES curve)
            line["spec_acceptance"] = round(
                spec_totals["accepted"] / spec_totals["drafted"], 4
            )
            line["spec_rounds"] = spec_totals["rounds"]
        print(json.dumps(line))


if __name__ == "__main__":
    main()
