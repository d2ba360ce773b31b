"""Myriad front-end for the continuous-batching engine.

Turns (image, question) anomaly-QA samples into LLM prompt embeddings —
zero-/one-shot VE maps + ``encode_img`` + prompt wrap, the same chain
``Myriad.generate`` compiles (models/myriad.py) — and streams them
through a ``ServingEngine`` over the model's Vicuna decoder.  Where
``Myriad.generate`` serves one fixed batch per call (the reference
evaluation protocol, reference evaluation_aqa_dataset.py), this front-end
serves an endpoint: requests arrive whenever, admit into free KV slots,
and finish independently.

Embedding programs are jit-cached per image/prompt shape (one program per
shape signature, like Myriad._jit_cache); the engine bounds its own
program count by the admission-width ladder.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from myriad_tpu.generation import GenerationConfig
from myriad_tpu.models.llama import LlamaForCausalLM, serving_cache_dtype
from myriad_tpu.serving.engine import ServingEngine


def _scene0(scene) -> str:
    """First scene of a sample's scene field, accepting a plain string
    (list('bottle')[0] would silently yield 'b')."""
    if isinstance(scene, str):
        return scene
    seq = list(scene)
    return seq[0] if seq else ""


class MyriadServing:
    """Continuous serving of anomaly-QA requests on a Myriad model.

    Args mirror ``ServingEngine``; generation defaults (stop ids,
    max_new_tokens, prompt handling, KV dtype) come from the wrapped
    model so transcripts match ``Myriad.generate``'s greedy path.
    """

    def __init__(
        self,
        myriad,
        *,
        slots: int = 8,
        bucket: Optional[int] = None,
        segment: int = 32,
        max_new_tokens: int = 90,
        admit_widths=(128, 256, 512),
        stage: int = 1,
        spec_k: int = 0,
        block_size: int = 0,
        max_admit_chunk: int = 16,
    ):
        self.myriad = myriad
        self.stage = stage
        self.cfg = GenerationConfig(max_new_tokens=max_new_tokens)
        llama = LlamaForCausalLM(myriad.arch.llama,
                                 myriad.policy.compute_dtype,
                                 myriad.policy.param_dtype)
        cache_dtype = serving_cache_dtype(myriad.arch.llama,
                                          myriad.policy.compute_dtype)
        if bucket is None:
            # round to the KV tile granularity (int8 cache payloads tile T
            # in 32s; unaligned buckets just waste a partial tile); slack
            # rationale: ServingEngine.submit
            bucket = -(-(max(admit_widths) + max_new_tokens + 2 * spec_k + 1)
                       // 32) * 32
        self.engine = ServingEngine(
            llama, {"params": myriad.params["llama"]},
            slots=slots, bucket=bucket, config=self.cfg,
            cache_dtype=cache_dtype, segment=segment,
            admit_widths=admit_widths, spec_k=spec_k,
            block_size=block_size, max_admit_chunk=max_admit_chunk)
        self._embed_progs: Dict[tuple, callable] = {}
        self._meta: Dict[int, Dict] = {}
        # per-group VE anomaly scores (max of the zero-/one-shot map, the
        # jsonl `anomaly_score` field): kept DEVICE-side at submit so the
        # score reduction never syncs the embed forward (dispatch-side
        # submission, engine._PendingBatch rationale); materialized to
        # host lazily at first render of the group — by then the group's
        # compute long finished, so the copy is a tiny (n,) transfer
        self._group_scores: Dict[int, object] = {}
        self._next_gid = 0
        # lazy-submission host queue: stacked sample groups waiting to be
        # embedded (see submit_batch(lazy=True)).  Entries are
        # (stacked_samples, promised_request_ids).
        self._host_queue: List[tuple] = []

    def _embed_prog(self, key, example_args):
        """(jitted fn, meta) — fn returns the prompt embeddings PADDED to
        the admission-ladder width, so the batch goes device→device into
        the engine's prefill with no host round-trip (an 84 MB-each-way
        tunnel copy per group dominated the first burst measurement).
        ``meta`` (true length / padded width) is computed EAGERLY at
        program-build time via ``jax.eval_shape`` — the jitted fn stays
        pure, so a future AOT/serialized path that skips tracing still
        finds meta populated (r3 advisor finding)."""
        if key in self._embed_progs:
            return self._embed_progs[key]
        module, stage = self.myriad.module, self.stage
        add_bos = self.myriad.bos_at_generate
        ladder = self.engine.admit_widths
        from myriad_tpu.models.myriad import MyriadModule

        def raw_embed(params, image, maps, before, after):
            return module.apply(
                {"params": params}, image, maps, before, after, stage,
                add_bos=add_bos, method=MyriadModule.prefill_embeds)

        t = int(jax.eval_shape(raw_embed, *example_args).shape[1])
        width = next((w for w in ladder if w >= t), None)
        if width is None:
            raise ValueError(
                f"prompt of {t} tokens exceeds the largest admission "
                f"width {ladder[-1]}")
        meta = {"t": t, "width": width}

        @jax.jit
        def embed(params, image, maps, before, after):
            emb = raw_embed(params, image, maps, before, after)
            return jnp.pad(emb, ((0, 0), (0, width - emb.shape[1]), (0, 0)))

        self._embed_progs[key] = (embed, meta)
        return embed, meta

    def submit(self, samples: Dict) -> int:
        """Enqueue one sample (dict with 'image' (1,H,W,C), 'question*',
        'scene'); returns the request id."""
        return self._submit_group(samples)[0]

    def submit_batch(self, samples_list: List[Dict],
                     max_group: int = 16, lazy: bool = False) -> List[int]:
        """Enqueue many single-image samples; same-shape/same-question runs
        share ONE embedding program call (the VE + encode_img forward is
        batched), which matters on the remote-TPU runtime where every
        dispatch costs ~0.5 s.  Groups cap at ``max_group`` rows — the
        embed forward's activation footprint must stay inside the
        validated envelope (the bench OOMs past batch ~48 at full scale;
        16 keeps admission bursts well clear while the engine cache is
        also resident).  Returns request ids in input order.

        ``lazy=True`` defers the embed forwards: groups wait HOST-side and
        are embedded just ahead of admission (one group of lookahead past
        the free slots, ``_pump``).  A deep burst then holds raw images in
        host RAM instead of stacking every group's prompt embeddings AND
        embed-forward temps in HBM on top of the KV pool — the measured
        r4 burst OOM at 192 requests x 48 slots.  Request ids are reserved
        up front, so arrival-time latency accounting is unchanged."""
        ids: List[int] = []
        group: List[Dict] = []
        q_key = {0: "question", 1: "question2", 2: "question3"}[self.stage]

        def gkey(s):
            img = np.asarray(s["image"])
            # the same stage-keyed prompt selection prepare_sample applies
            q = s.get(q_key) or s.get("question")
            q = q[0] if isinstance(q, (list, tuple)) else q
            return (img.shape[1:], img.dtype.str, q)

        def flush():
            if not group:
                return
            stacked = {
                "image": np.concatenate([np.asarray(s["image"]) for s in group]),
                "scene": [_scene0(s.get("scene", "")) for s in group],
            }
            for k in ("question", "question2", "question3", "img_path"):
                vals = [s[k] for s in group if k in s]
                if vals:
                    stacked[k] = [v[0] if isinstance(v, (list, tuple)) else v
                                  for v in vals]
            if lazy:
                rids = self.engine.reserve_ids(len(group))
                self._host_queue.append((stacked, rids))
                ids.extend(rids)
            else:
                ids.extend(self._submit_group(stacked))
            group.clear()

        for s in samples_list:
            if group and (gkey(group[-1]) != gkey(s) or len(group) >= max_group):
                flush()
            group.append(s)
        flush()
        if lazy:
            self._pump()
        return ids

    def _pump(self) -> None:
        """Embed host-queued groups only while the engine's admission queue
        does not already cover the free slots — bounds device-resident
        prompt bytes to ~one group past what can admit this tick, and the
        re-embeds overlap with decode ticks."""
        eng = self.engine
        while self._host_queue and eng.queued_rows <= eng.free_slot_count:
            stacked, rids = self._host_queue.pop(0)
            self._submit_group(stacked, request_ids=rids)

    def _submit_group(self, samples: Dict, hold: bool = False,
                      request_ids: Optional[List[int]] = None) -> List[int]:
        """Embed a same-question batch in one program call; enqueue rows."""
        m = self.myriad
        image, question, _, maps, one_maps = m.prepare_sample(
            samples, self.stage, training=False)
        use_maps = one_maps if m.k_shot > 0 else maps
        before, after = m.split_prompt(question)
        if (self.engine.spec_k and self.engine._lookup_ids is None
                and self.engine._segment_prog is None):
            # shared prompt-lookup corpus from the first request's question:
            # AQA serving is templated, so the post-image prompt + the
            # task's answer sentences draft well for every request
            # (proposals only — other questions just accept less)
            self.engine.set_lookup(m._spec_lookup_ids(after))
        key = (image.shape, np.asarray(image).dtype.str, before.shape,
               after.shape)
        args = (m.params, jnp.asarray(image), use_maps,
                jnp.asarray(before), jnp.asarray(after))
        fn, meta = self._embed_prog(key, args)
        embeds = fn(*args)
        n = int(embeds.shape[0])
        scenes = list(samples.get("scene", [""] * n))
        if len(scenes) != n:
            raise ValueError(
                f"{n} image rows but {len(scenes)} scenes — every row "
                "needs its scene (a short list would silently drop "
                "requests)")
        # device-resident group submission: the padded batch never touches
        # the host (engine._PendingBatch rationale)
        rids = self.engine.submit_group(embeds, meta["t"], hold=hold,
                                        request_ids=request_ids)
        gid, self._next_gid = self._next_gid, self._next_gid + 1
        # [scores, outstanding-render refcount] — dropped when every
        # non-held request of the group rendered (long-running engines
        # must not accumulate per-group score arrays)
        self._group_scores[gid] = [
            jnp.max(jnp.asarray(use_maps), axis=(1, 2, 3)), len(rids)]
        for row, (rid, scene) in enumerate(zip(rids, scenes)):
            self._meta[rid] = {"scene": scene, "question": question,
                               "_score_ref": (gid, row)}
        return rids

    def submit_held(self, samples: Dict) -> int:
        """submit() but the slot stays KV-resident after completion, for
        continue_request turns."""
        assert np.asarray(samples["image"]).shape[0] == 1, (
            "submit_held takes a single-image sample")
        return self._submit_group(samples, hold=True)[0]

    def continue_request(self, handle: int, text: str, *,
                         hold: bool = True,
                         request_id: Optional[int] = None) -> int:
        """Extend a held conversation with the next turn's TEXT.  The
        delta is just the new text's token embeddings — the previous
        turn's prompt and answer are already KV-resident (the engine's
        continue_generate-exact in-place prefill)."""
        tok = self.myriad.llama_tokenizer(text, add_special_tokens=False)
        ids = tok["input_ids"]
        if ids and isinstance(ids[0], list):
            ids = ids[0]
        ids = np.asarray(ids, np.int32)
        # embed through a width-bucketed program (bounded program count),
        # slice back to the true length host-side
        width = int(min(w for w in self.engine.admit_widths
                        if w >= max(len(ids), 1)))
        padded = np.zeros((1, width), np.int32)
        padded[0, : len(ids)] = ids
        key = ("embed_ids", width)
        if key not in self._embed_progs:
            model = self.engine.model
            self._embed_progs[key] = jax.jit(
                lambda p, i: model.apply(p, i, method=type(model).embed))
        emb = np.asarray(self._embed_progs[key](
            self.engine.params, jnp.asarray(padded)))[0, : len(ids)]
        rid = self.engine.continue_request(handle, emb, hold=hold,
                                           request_id=request_id)
        # inherit the scene, then retire the consumed handle's meta (held
        # metas are kept by _render exactly for this moment)
        prev_meta = self._meta.pop(handle, {})
        self._meta[rid] = {"question": text,
                           **{k: v for k, v in prev_meta.items()
                              if k == "scene"}}
        return rid

    def release(self, handle: int) -> None:
        self.engine.release(handle)
        self._meta.pop(handle, None)

    def step(self) -> List[Dict]:
        self._pump()
        return [self._render(f) for f in self.engine.step()]

    def drain(self, max_ticks: int = 10_000) -> List[Dict]:
        out: List[Dict] = []
        for _ in range(max_ticks):
            if not self.pending:
                return out
            out.extend(self.step())
        raise RuntimeError(f"drain did not converge in {max_ticks} ticks")

    def _render(self, finished) -> Dict:
        text = self.myriad.llama_tokenizer.decode(finished.tokens.tolist())
        if finished.held:  # keep meta: continue_request inherits the scene
            meta = dict(self._meta.get(finished.request_id, {}))
        else:
            meta = self._meta.pop(finished.request_id, {})
        ref = meta.pop("_score_ref", None)
        if ref is not None:
            gid, row = ref
            entry = self._group_scores[gid]
            if not isinstance(entry[0], np.ndarray):  # first touch: one
                entry[0] = np.asarray(entry[0])       # (n,) host copy
            meta["anomaly_score"] = float(entry[0][row])
            if not finished.held:
                entry[1] -= 1
                if entry[1] <= 0:
                    del self._group_scores[gid]
        return dict(request_id=finished.request_id, text=text,
                    token_ids=finished.tokens, held=finished.held,
                    raw_tokens=finished.raw_tokens, **meta)

    @property
    def pending(self) -> int:
        return self.engine.pending + sum(
            len(rids) for _, rids in self._host_queue)

    @property
    def stats(self):
        return self.engine.stats
