"""Continuous-batching engine probe: serving throughput + latency on TPU.

The batch bench (bench.py) measures the OFFLINE regime — fixed batches of
identical requests, every row starting and stopping together.  A deployed
endpoint sees the ONLINE regime: ragged arrivals, rows finishing at
different times, slots turning over.  This probe drives
serving.MyriadServing with synthetic AQA requests at the full bench
profile and reports:

  * req/s sustained (completed / wall from first admission)
  * per-request latency p50/p95 (submit wall -> finish wall)
  * slot occupancy (decode steps spent on live rows / total row-steps)

Arrival modes:
  burst    all N requests queued up front — the engine's peak (its answer
           to bench.py's fixed batch, but with per-row completion)
  trickle  `--arrive K` new requests per tick — open-loop arrivals; shows
           utilization holding up while slots churn

Usage: python tools/engineprobe.py [--requests 96] [--slots 48]
         [--segment 32] [--mode burst|trickle] [--arrive 8] [--dry-run]

One JSON line on stdout (sweep-queue convention, tools/sweep_r3c.sh).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mem_mb(peak: bool = False) -> float:
    """Current/peak device HBM use (0 when the backend has no stats —
    CPU).  Used to bracket the block-layout 48-slot runtime OOM (r5:
    warm drain succeeds, the measured 48-slot burst RESOURCE_EXHAUSTs)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        key = "peak_bytes_in_use" if peak else "bytes_in_use"
        return stats.get(key, 0) / (1 << 20)
    except Exception:
        return 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=96)
    p.add_argument("--slots", type=int, default=48)
    p.add_argument("--segment", type=int, default=32,
                   help="decode steps per compiled tick (amortizes the "
                        "~0.5 s remote-dispatch cost)")
    p.add_argument("--max-new", type=int, default=90)
    p.add_argument("--mode", type=str, default="burst",
                   choices=["burst", "trickle", "chat"])
    p.add_argument("--arrive", type=int, default=8,
                   help="trickle mode: requests arriving per tick")
    p.add_argument("--turns", type=int, default=4,
                   help="chat mode: turns per held conversation")
    p.add_argument("--spec", type=int, default=0, metavar="K",
                   help="speculative decoding inside the engine: verify K "
                        "prompt-lookup drafts per weight pass "
                        "(transcript-exact; reports acceptance)")
    p.add_argument("--block", type=int, default=None, metavar="B",
                   help="block KV layout: rows allocated in blocks of B "
                        "slots sharing one storage frontier (in-place "
                        "writes, no per-row pool rewrite).  Default: 8 "
                        "for greedy burst/trickle, 0 (per-row) for "
                        "spec/chat which need per-row frontiers")
    p.add_argument("--admit-chunk", type=int, default=16, metavar="N",
                   help="cap on rows prefilled per admission chunk "
                        "(engine max_admit_chunk).  8 halves admission "
                        "prefill temps — the r5 mitigation for the "
                        "48-slot block-layout RESOURCE_EXHAUSTED (pool + "
                        "params leave ~2 GiB headroom; a (320,16) "
                        "admission chunk's mini-KV + activations exceed "
                        "it)")
    p.add_argument("--ckpt", type=str, default="",
                   help="trained trainable-subtree checkpoint (e.g. the "
                        "tools/train_to_spec.py output) merged into the "
                        "model before serving — with --spec this measures "
                        "REAL draft acceptance instead of the random-weight "
                        "~0 floor.  Builds with use_lora + train_llm_head "
                        "to match the t2s trainable split")
    p.add_argument("--quant", type=str, default="int8",
                   choices=["none", "int8"])
    p.add_argument("--kv", type=str, default="int8", choices=["bf16", "int8"])
    p.add_argument("--sync-phases", action="store_true",
                   help="sync the device at each phase boundary so "
                        "submit/admit/decode walls attribute COMPUTE "
                        "(serializes the pipeline — throughput drops; "
                        "default is dispatch-side attribution)")
    p.add_argument("--dry-run", action="store_true",
                   help="tiny profile on CPU")
    args = p.parse_args()

    import jax

    if args.dry_run:
        jax.config.update("jax_platforms", "cpu")
    else:
        import atexit

        from myriad_tpu.common.dist import enable_compilation_cache
        from myriad_tpu.common.tpu_lock import tpu_lock

        enable_compilation_cache()
        _lock = tpu_lock("engineprobe", max_hold_s=7200.0, wait_s=1800.0)
        _lock.__enter__()
        atexit.register(_lock.__exit__, None, None, None)

    from bench import build_profile
    from myriad_tpu.models.layers import Policy
    from myriad_tpu.models.myriad import Myriad
    from myriad_tpu.serving.myriad_adapter import MyriadServing

    profile = "tiny" if args.dry_run else "bench"
    arch = build_profile(profile)
    if args.quant == "int8":
        arch = dataclasses.replace(
            arch, llama=dataclasses.replace(arch.llama, weight_dtype="int8"),
            vit_weight_dtype="int8", qformer_weight_dtype="int8",
            imagebind=dataclasses.replace(arch.imagebind, weight_dtype="int8"))
    arch = dataclasses.replace(
        arch, llama=dataclasses.replace(
            arch.llama, kv_cache_dtype="int8" if args.kv == "int8" else "bf16"))

    if args.dry_run:
        args.slots = min(args.slots, 4)
        args.requests = min(args.requests, 8)
        args.max_new = min(args.max_new, 8)
        args.segment = min(args.segment, 4)

    t0 = time.time()
    # with a trained checkpoint the construction must match train_to_spec's
    # TRAIN policy ('bf16': fp32 init draws, frozen cast after) — bf16_params
    # draws a different random frozen body and the echo-state readout
    # generates garbage (r4 t2s bug, train_to_spec.FULL_ARCH_EVAL note)
    policy = (Policy.fp32() if args.dry_run
              else Policy.bf16() if args.ckpt else Policy.bf16_params())
    model = Myriad(arch=arch, use_ve=True, policy=policy,
                   max_txt_len=160, end_sym="###", seed=0,
                   use_lora=bool(args.ckpt), train_llm_head=bool(args.ckpt))
    if args.ckpt:
        model.load_checkpoint(args.ckpt)
        print(f"[engineprobe] loaded ckpt {args.ckpt}", file=sys.stderr)
    ve = model.vision_expert
    ve.class_names = ["bottle"]
    ve.class_index = {"bottle": 0}
    ve.build_text_features()
    print(f"[engineprobe] init {time.time()-t0:.1f}s "
          f"params={model.show_n_params()}", file=sys.stderr)

    # the real AQA stage-1 question (bench.py prompt), 297-token prefix at
    # full scale -> admit width 320, bucket 416
    from myriad_tpu.datasets.anomaly_detection import QUESTION_PROMPTS

    question = "<Img><ImageHere></Img>" + QUESTION_PROMPTS[1]
    rng = np.random.default_rng(0)

    def make_request(i):
        return {
            "image": rng.normal(
                size=(1, arch.img_size, arch.img_size, 3)).astype(np.float32),
            "scene": ["bottle"],
            "question": [question], "question2": [question],
            "question3": [question],
        }

    requests = [make_request(i) for i in range(args.requests)]
    bucket = None
    if args.mode == "chat":
        ids = model.llama_tokenizer(TURN_TEXT, add_special_tokens=False)["input_ids"]
        delta = len(ids[0] if ids and isinstance(ids[0], list) else ids)
        # worst-case frontier: prompt + the INITIAL answer + (turns+1 incl.
        # warm) x (delta + answer), each answer overshooting by up to
        # spec_k; plus the final turn's decode budget slack
        bucket = -(-(320 + (args.turns + 2) * (delta + args.max_new + args.spec)
                     + 2 * args.spec + 1) // 32) * 32
        # size the conversation count from the KV budget: chat buckets are
        # 3-4x the single-turn 416, and slots x bucket x bytes/token must
        # leave room for the 8.4G int8 params (16 slots x 1472 = 12.3G of
        # KV measured OOM on the 15.75G chip)
        la = arch.llama
        bytes_per_tok = 2 * la.num_layers * la.hidden_size * (
            1 if args.kv == "int8" else 2)
        bytes_per_tok += 2 * la.num_layers * la.num_heads * 2  # scale planes
        kv_budget = (5.5 if not args.dry_run else 1) * (1 << 30)
        fit = max(1, int(kv_budget // (bucket * bytes_per_tok)))
        if fit < args.slots:
            print(f"[engineprobe] chat slots {args.slots} -> {fit} "
                  f"(bucket {bucket}, {bytes_per_tok/2**20:.2f} MiB/token-slot, "
                  f"{kv_budget/2**30:.1f} GiB KV budget)", file=sys.stderr)
        args.slots = min(args.slots, 16, fit)
    if args.block is None:
        args.block = 0 if (args.spec or args.mode == "chat") else 8
    if args.block and args.slots % args.block:
        # loud, not silent: an r5 sensitivity row requested block 16 over
        # 40 slots and measured the per-row layout without saying so
        print(f"[engineprobe] block {args.block} does not divide "
              f"{args.slots} slots -> per-row layout (block 0)",
              file=sys.stderr)
        args.block = 0
    serving = MyriadServing(
        model, slots=args.slots, segment=args.segment,
        max_new_tokens=args.max_new, bucket=bucket,
        admit_widths=(64, 160, 320), spec_k=args.spec,
        block_size=args.block, max_admit_chunk=args.admit_chunk)
    serving.engine.profile_sync = args.sync_phases

    def sync_submit():
        # force the embed forward to land before stamping submit wall
        # (block_until_ready is unreliable here — tiny dependent host copy)
        if args.sync_phases and serving.engine._queue:
            e = serving.engine._queue[-1].embeds
            if hasattr(e, "devices"):
                jax.device_get(e[0, 0, :1])
    # embed-group size the timed run will use — warm the SAME shapes, or
    # their compiles land inside the measured window
    group = min(16, args.arrive if args.mode == "trickle" else 16,
                args.requests)

    # warm every program (compile outside the timed window): 2*group-1
    # requests admit as chunks group, group/2, ..., 1 — every (width, n)
    # prefill/insert shape the timed run can hit — plus the embed group
    # shape and the segment program; then reset stats
    warm_n = min(2 * group - 1, args.slots)
    warm_reqs = [make_request(-1 - i) for i in range(warm_n)]
    wids = serving.submit_batch(warm_reqs, max_group=group)
    warm = serving.drain()
    assert sorted(r["request_id"] for r in warm) == sorted(wids)
    compile_s = time.time() - t0
    print(f"[engineprobe] warm {compile_s:.1f}s mem={_mem_mb():.0f}MB "
          f"peak={_mem_mb(peak=True):.0f}MB", file=sys.stderr)
    for k in serving.stats:
        serving.stats[k] = 0

    if args.mode == "chat":
        run_chat_mode(args, serving, requests, compile_s)
        return

    submit_wall = {}
    finish_wall = {}
    t_start = time.time()
    submit_s = 0.0
    if args.mode == "burst":
        # all requests arrive at t_start; the embed forward is part of
        # every latency sample (it is serving-path work)
        # lazy: groups wait host-side and embed just ahead of admission —
        # a 192-request burst otherwise stacks every group's embeds +
        # embed-forward temps in HBM on top of the KV pool (measured OOM)
        ids = serving.submit_batch(requests, max_group=group, lazy=True)
        sync_submit()
        submit_s = time.time() - t_start
        for rid in ids:
            submit_wall[rid] = t_start
        pending_arrivals = []
    else:
        pending_arrivals = list(requests)

    ticks = 0
    try:
        while serving.pending or pending_arrivals:
            if pending_arrivals:
                batch, pending_arrivals = (pending_arrivals[: args.arrive],
                                           pending_arrivals[args.arrive:])
                now = time.time()  # arrival stamp: before the embed forward
                for rid in serving.submit_batch(batch, max_group=group,
                                                lazy=True):
                    submit_wall[rid] = now
                sync_submit()
                submit_s += time.time() - now
            for r in serving.step():
                finish_wall[r["request_id"]] = time.time()
            ticks += 1
            assert ticks < 100_000
    except Exception:
        occ = sum(s is not None
                  for s in getattr(serving.engine, "_slot_req", []))
        print(f"[engineprobe] FAILED at tick {ticks} "
              f"(occupied {occ}/{args.slots}): "
              f"mem={_mem_mb():.0f}MB peak={_mem_mb(peak=True):.0f}MB",
              file=sys.stderr)
        raise
    wall = time.time() - t_start

    lat = np.asarray([finish_wall[r] - submit_wall[r] for r in finish_wall])
    n = len(finish_wall)
    throughput = n / wall
    stats = serving.stats
    spec_tag = f", spec {args.spec}" if args.spec else ""
    block_tag = f", block {args.block}" if args.block else ""
    result = {
        "metric": f"serving req/s ({args.mode} arrivals, {args.slots} slots, "
                  f"segment {args.segment}, {args.max_new}-token answers, "
                  f"weights {args.quant}, kv {args.kv}{spec_tag}{block_tag})",
        "value": round(throughput, 4),
        "unit": "requests/sec",
        "requests": n,
        "wall_s": round(wall, 2),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
        "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
        "ticks": stats["ticks"],
        "decode_steps": stats["decode_steps"],
        "slot_occupancy": round(
            stats["live_row_steps"] / max(stats["decode_steps"] * args.slots, 1),
            3),
        # phase attribution: embed forwards (submit), engine admission
        # prefills, decode segments + per-tick host sync.  WITHOUT
        # --sync-phases these are DISPATCH-side walls (the async backend
        # returns before compute lands; embed+prefill compute shows up in
        # decode_wall_s's device_get) — pass --sync-phases for compute-side
        # attribution at the cost of pipeline serialization.
        "phase_attribution": "compute" if args.sync_phases else "dispatch",
        "submit_wall_s": round(submit_s, 2),
        "admit_wall_s": round(stats.get("admit_wall_s", 0.0), 2),
        "decode_wall_s": round(stats.get("decode_wall_s", 0.0), 2),
        "compile_s": round(compile_s, 1),
    }
    if args.spec:
        result["spec_acceptance"] = round(
            stats["spec_accepted"] / max(stats["spec_drafted"], 1), 3)
    print(json.dumps(result))


TURN_TEXT = ("###Human: and what about the texture region, does it "
             "look defective there?###Assistant: ")


def run_chat_mode(args, serving, requests, compile_s):
    """C = slots concurrent held conversations x --turns turns each:
    every turn is an O(delta) in-place prefill against the resident cache
    while the other conversations' turns decode alongside.  Reports
    turns/sec and per-turn latency percentiles."""
    convs = min(args.slots, len(requests))
    turn_text = TURN_TEXT

    t0 = time.time()
    handles = [serving.submit_held(r) for r in requests[:convs]]
    for r in serving.drain():
        assert r["held"]
    # one warm turn (compiles the continuation + embed-id programs)
    handles = [serving.continue_request(h, turn_text, hold=True)
               for h in handles]
    for r in serving.drain():
        assert r["held"]
    warm_s = time.time() - t0
    print(f"[engineprobe] chat warm {warm_s:.1f}s", file=sys.stderr)

    lat = []
    t_start = time.time()
    done_turns = 0
    for _ in range(args.turns):
        t_turn = time.time()
        handles = [serving.continue_request(h, turn_text, hold=True)
                   for h in handles]
        finished = serving.drain()
        assert len(finished) == convs
        lat.append(time.time() - t_turn)
        done_turns += convs
    wall = time.time() - t_start

    lat = np.asarray(lat)
    result = {
        "metric": f"chat turns/s ({convs} concurrent conversations, "
                  f"{args.max_new}-token answers, segment {args.segment}"
                  f"{', spec ' + str(args.spec) if args.spec else ''})",
        "value": round(done_turns / wall, 4),
        "unit": "turns/sec",
        "turns": done_turns,
        "wall_s": round(wall, 2),
        "turn_round_p50_s": round(float(np.percentile(lat, 50)), 3),
        "turn_round_p95_s": round(float(np.percentile(lat, 95)), 3),
        "compile_s": round(compile_s + 0.0, 1),
    }
    if args.spec:
        s = serving.stats
        result["spec_acceptance"] = round(
            s["spec_accepted"] / max(s["spec_drafted"], 1), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
