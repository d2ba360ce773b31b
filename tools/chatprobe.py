"""Measure multi-turn chat latency: incremental KV-cache vs full re-prefill.

The incremental path (conversation.Chat, generation.continue_generate)
prefills only each turn's prompt delta from the resident device cache and
pads deltas into 64-wide buckets so an N-turn conversation compiles O(1)
programs; the full path re-embeds and re-prefills the whole concatenated
history every turn (the reference's conversation.py:215-229 shape).  This
probe runs the same scripted conversation through both Chats on the same
model and reports per-turn wall seconds (answer() syncs by host-copying
the tokens, per the CLAUDE.md timing rule).

Usage:
    python tools/chatprobe.py [--profile bench] [--turns 5] [--max-new 60]
    python tools/chatprobe.py --dry-run          # tiny model on CPU
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


QUESTIONS = [
    "Is there any anomaly in the image?",
    "Where exactly is the defect located in the picture?",
    "How severe does the anomaly look to you?",
    "Could this defect affect the function of the object?",
    "What should be inspected next on this production line?",
    "Summarize everything you observed about this object.",
    "Is the surface texture consistent across the whole part?",
    "Would you accept or reject this part in quality control?",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dry-run", action="store_true", help="tiny profile on CPU")
    p.add_argument("--profile", default=None,
                   choices=["bench", "bench16", "tiny", "full"])
    p.add_argument("--turns", type=int, default=5)
    p.add_argument("--max-new", type=int, default=60)
    p.add_argument("--quant", default="int8", choices=["none", "int8"])
    p.add_argument("--kv", default="int8", choices=["bf16", "int8"])
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="additionally time an incremental chat with "
                        "speculative decoding (verify K prompt-lookup "
                        "drafts per weight pass; transcript equality vs "
                        "the greedy paths asserted)")
    args = p.parse_args()

    import jax

    if args.dry_run:
        jax.config.update("jax_platforms", "cpu")
    else:
        from myriad_tpu.common.dist import enable_compilation_cache

        enable_compilation_cache()
    profile = args.profile or ("tiny" if args.dry_run else "bench")

    import dataclasses

    import numpy as np

    from bench import build_profile
    from myriad_tpu.conversation import CONV_VISION, Chat
    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.myriad import Myriad
    from myriad_tpu.processors.blip_processors import LocImageTrainProcessor

    arch = build_profile(profile)
    if args.quant == "int8":
        arch = dataclasses.replace(
            arch, llama=dataclasses.replace(arch.llama, weight_dtype="int8"),
            vit_weight_dtype="int8", qformer_weight_dtype="int8",
            imagebind=dataclasses.replace(arch.imagebind, weight_dtype="int8"),
        )
    arch = dataclasses.replace(
        arch, llama=dataclasses.replace(
            arch.llama, kv_cache_dtype="int8" if args.kv == "int8" else "bf16"))

    t0 = time.time()
    model = Myriad(arch=arch, use_ve=True,
                   policy=Policy.fp32() if args.dry_run else Policy.bf16_params(),
                   max_txt_len=160, end_sym="###", seed=0)
    ve = model.vision_expert
    ve.class_names = ["object"]
    ve.class_index = {"object": 0}
    ve.build_text_features()
    print(f"[chatprobe] profile={profile} init {time.time()-t0:.1f}s",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (arch.img_size, arch.img_size, 3),
                         dtype=np.uint8)
    questions = (QUESTIONS * (-(-args.turns // len(QUESTIONS))))[: args.turns]

    def run(incremental, spec_k=0):
        chat = Chat(model, LocImageTrainProcessor(identity=True),
                    incremental=incremental, spec_k=spec_k)
        conv = CONV_VISION.copy()
        img_list = []
        chat.upload_img(image, conv, img_list)
        times, texts = [], []
        for q in questions:
            chat.ask(q, conv)
            t = time.time()
            text, _ = chat.answer(conv, img_list,
                                  max_new_tokens=args.max_new)
            times.append(time.time() - t)
            texts.append(text)
        return times, texts

    # warm each path's compiles on turn-1 shapes, then measure fresh chats
    variants = [("incremental", dict(incremental=True)),
                ("full-reprefill", dict(incremental=False))]
    if args.spec:
        variants.insert(1, (f"incremental+spec{args.spec}",
                            dict(incremental=True, spec_k=args.spec)))
    transcripts = {}
    for label, kw in variants:
        t_compile = time.time()
        times, texts = run(**kw)
        print(f"[chatprobe] {label}: cold run {time.time()-t_compile:.1f}s "
              f"(includes compiles)", file=sys.stderr)
        times, texts2 = run(**kw)
        assert texts == texts2, "warm run diverged from cold run"
        transcripts[label] = texts
        per = " ".join(f"{t:.2f}" for t in times)
        print(f"{label}: turns [{per}] s; total {sum(times):.2f}s; "
              f"steady (last {max(1, len(times)-1)}) "
              f"{sum(times[1:]) / max(1, len(times)-1):.2f}s/turn")
    base = transcripts["incremental"]
    for label, texts in transcripts.items():
        assert texts == base, f"{label} transcripts diverged"
    print(f"transcripts: {' == '.join(transcripts)} (exact)")


if __name__ == "__main__":
    main()
