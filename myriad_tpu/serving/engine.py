"""Continuous-batching serving engine: static-shape slots + segment decode.

TPU-native continuous batching in the JetStream/vLLM spirit, built on the
per-row cache frontiers that speculative decoding already established
(generation.py): a fixed pool of ``slots`` KV-cache rows shares ONE
preallocated cache bucket, requests are admitted into free rows as they
arrive, and a single compiled decode loop advances every occupied row —
each with its own write frontier, stop state and output offset.  Finished
rows free their slot immediately; the next pending request takes it over
without recompiling anything.

Where the reference serves one batch at a time and re-prefills the whole
conversation per turn (reference minigpt4/conversation/conversation.py
``Chat.answer`` -> HF ``generate`` over the full concatenated prompt;
evaluation_aqa_dataset.py runs fixed batches), this engine keeps the chip
busy across ragged, asynchronously-arriving requests — the serving regime
a deployed anomaly-QA endpoint actually sees.  There is no reference
counterpart; this is beyond-parity infrastructure.

Design notes (TPU/XLA constraints drive everything):

* **Static shapes everywhere.** The slot pool (B), the KV bucket (T), the
  admission widths and the segment length are all compile-time constants;
  the *contents* (frontiers, stop flags, output offsets) are traced state.
  Program count is bounded: one prefill + one insert program per admission
  width, one segment program — regardless of traffic.
* **Per-row frontiers are already exact.** llama.py's single mask
  predicate (cache slot ``p`` attended iff ``p <= query position``) makes
  slot reuse safe with no explicit invalidation: a freed slot's stale KV
  lives at positions the new request's queries never admit, exactly the
  invariant speculative rollback relies on (llama.py mask note).
* **Admission = tiny prefill + row graft.** A new request prefills a
  fresh 1-row mini cache at its width bucket (right-padded, logits read
  at the last valid column — continue_generate's trick), then grafts into
  its slot with per-leaf ``dynamic_update_slice`` row writes.  Junk pad
  KV beyond ``valid`` is overwritten by decode before the mask ever
  admits it (generation.continue_generate invariant).
* **Segment decode amortizes dispatch.** One jitted ``while_loop`` runs
  up to ``segment`` steps for all rows (early-exits when every occupied
  row stops); the host syncs only tiny vectors between segments.  On the
  remote-TPU runtime each dispatch costs ~0.5 s, so throughput demands
  many decode steps per host round-trip (CLAUDE.md).
* **Donated state.** The engine state (cache included) is donated through
  insert/segment calls, so XLA updates the multi-GiB cache in place.

Token streams are bit-identical to ``generation.greedy_generate`` run
per-request (same select/stop/emit semantics; masked bucket tails
contribute exact zeros) — pinned by tests/test_serving_engine.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from myriad_tpu.generation import GenerationConfig, _select_token
from myriad_tpu.models.llama import LlamaForCausalLM, init_cache


@dataclasses.dataclass
class Finished:
    """A completed request: trimmed token ids (stop/eos/pad removed)."""

    request_id: int
    tokens: np.ndarray  # (n,) int32, n <= max_new_tokens
    n_prompt: int


@dataclasses.dataclass
class _Pending:
    request_id: int
    embeds: np.ndarray  # (T, D)


class ServingEngine:
    """Continuous-batching decode over a fixed slot pool.

    Args:
      model/params: a ``LlamaForCausalLM`` and its ``{"params": ...}`` tree
        (params are passed to every program, never closed over).
      slots: KV rows decoded together (the engine's max concurrency).
      bucket: per-slot KV capacity; every request needs
        ``prompt_len + max_new_tokens + 1 <= bucket``.
      config: ``GenerationConfig`` (stop ids / sampling / max_new_tokens).
      cache_dtype: KV dtype (e.g. ``jnp.bfloat16`` or ``"int8"``).
      segment: decode steps per compiled tick between host syncs.
      admit_widths: admission padding ladder; a prompt admits at the
        smallest width >= its length (one prefill program per width).
    """

    def __init__(
        self,
        model: LlamaForCausalLM,
        params,
        *,
        slots: int = 8,
        bucket: int = 512,
        config: Optional[GenerationConfig] = None,
        cache_dtype=jnp.bfloat16,
        segment: int = 32,
        admit_widths: Tuple[int, ...] = (64, 128, 256, 512),
        rng: Optional[jax.Array] = None,
    ):
        self.model = model
        self.params = params
        self.slots = int(slots)
        self.bucket = int(bucket)
        self.cfg = config or GenerationConfig()
        self.cache_dtype = cache_dtype
        self.segment = int(segment)
        self.admit_widths = tuple(sorted(w for w in admit_widths if w <= bucket))
        assert self.admit_widths, "no admission width fits the bucket"
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

        self._queue: List[_Pending] = []
        self._slot_req: List[Optional[int]] = [None] * self.slots
        self._slot_prompt_len: List[int] = [0] * self.slots
        self._next_id = 0
        self.stats = {"submitted": 0, "completed": 0, "ticks": 0,
                      "decode_steps": 0}

        self._state = self._init_state()
        self._prefill_progs: Dict[int, callable] = {}
        self._insert_prog = None
        self._segment_prog = None

    # ---------------------------------------------------------------- state
    def _init_state(self):
        cfg, max_new = self.cfg, self.cfg.max_new_tokens
        cache = init_cache(self.model.config, self.slots, self.bucket,
                           self.cache_dtype)
        # per-row frontiers from the start (init_cache's scalar 0 index
        # would take the fresh-cache zero-pad write path on first segment)
        cache = tuple(dict(c, index=jnp.zeros((self.slots,), jnp.int32))
                      for c in cache)
        return dict(
            cache=cache,
            length=jnp.zeros((self.slots,), jnp.int32),   # write frontier
            last=jnp.zeros((self.slots,), jnp.int32),     # next token to emit
            done=jnp.ones((self.slots,), bool),           # free slots are done
            n_emit=jnp.zeros((self.slots,), jnp.int32),
            # +1 slack column: finished rows park their writes at max_new
            tokens=jnp.full((self.slots, max_new + 1), cfg.pad_token_id,
                            jnp.int32),
            rng=self._rng,
        )

    # ------------------------------------------------------------- programs
    def _prefill_prog(self, width: int):
        """(params, embeds (1,width,D), valid, rng) -> (mini_cache, last0)."""
        if width in self._prefill_progs:
            return self._prefill_progs[width]
        model, cfg, cache_dtype = self.model, self.cfg, self.cache_dtype

        @jax.jit
        def prefill(params, embeds, valid, rng):
            # fresh mini cache built INSIDE the program: the concrete index-0
            # write takes llama.py's zero-pad path (no second cache copy)
            cache = init_cache(model.config, 1, width, cache_dtype)
            logits, cache = model.apply(
                params, embeds, cache=cache, last_index=valid - 1,
                method=LlamaForCausalLM.prefill)
            last = _select_token(logits[:, -1].astype(jnp.float32), cfg, rng)
            # rewind the frontier to the valid length: decode overwrites the
            # pad KV before the causal mask ever admits those slots
            cache = tuple(dict(c, index=jnp.asarray(valid, jnp.int32))
                          for c in cache)
            return cache, last[0]

        self._prefill_progs[width] = prefill
        return prefill

    def _make_insert(self):
        """(state, mini_cache, slot, last0, valid) -> state with the request
        grafted into row ``slot`` (re-traces once per admission width)."""
        cfg, max_new = self.cfg, self.cfg.max_new_tokens

        @functools.partial(jax.jit, donate_argnums=(0,))
        def insert(state, mini, slot, last0, valid):
            def put_row(big, small):
                start = (slot,) + (0,) * (big.ndim - 1)
                return jax.lax.dynamic_update_slice(
                    big, small.astype(big.dtype), start)

            def put1(vec, val, cast=None):
                val = jnp.asarray(val, vec.dtype if cast is None else cast)
                return jax.lax.dynamic_update_slice(vec, val[None], (slot,))

            cache = tuple(
                dict(
                    {k: put_row(bc[k], mc[k]) for k in bc if k != "index"},
                    index=put1(bc["index"], valid),
                )
                for bc, mc in zip(state["cache"], mini)
            )
            done0 = (last0 == cfg.eos_token_id) | (last0 == cfg.stop_single)
            tokens = jax.lax.dynamic_update_slice(
                state["tokens"],
                jnp.full((1, max_new + 1), cfg.pad_token_id, jnp.int32),
                (slot, jnp.int32(0)))
            return dict(
                cache=cache,
                length=put1(state["length"], valid),
                last=put1(state["last"], last0),
                done=put1(state["done"], done0),
                n_emit=put1(state["n_emit"], jnp.int32(0)),
                tokens=tokens,
                rng=state["rng"],
            )

        return insert

    def _make_segment(self):
        """(params, state) -> state advanced by up to ``segment`` decode
        steps (early-exit when every row is done/free).  Emit/stop
        semantics mirror generation._decode_loop exactly, with per-row
        output offsets instead of a shared step counter."""
        model, cfg = self.model, self.cfg
        max_new, steps = self.cfg.max_new_tokens, self.segment

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(params, state):
            def cond(st):
                return jnp.logical_and(st["step"] < steps,
                                       ~jnp.all(st["done"]))

            def body(st):
                active = ~st["done"]
                # emit `last` at each active row's own offset; done/free rows
                # park a pad write in the slack column
                offset = jnp.where(st["done"], max_new,
                                   jnp.minimum(st["n_emit"], max_new - 1))
                emit = jnp.where(active, st["last"], cfg.pad_token_id)
                tokens = jax.vmap(
                    lambda row, w, o: jax.lax.dynamic_update_slice(row, w, (o,))
                )(st["tokens"], emit[:, None], offset)

                embeds = model.apply(params, st["last"][:, None],
                                     method=LlamaForCausalLM.embed)
                cache = tuple(dict(c, index=st["length"])
                              for c in st["cache"])
                logits, cache = model.apply(
                    params, embeds, positions=st["length"][:, None],
                    cache=cache)
                rng, sub = jax.random.split(st["rng"])
                nxt = _select_token(logits[:, -1].astype(jnp.float32), cfg, sub)
                stopped = (
                    (nxt == cfg.eos_token_id)
                    | (nxt == cfg.stop_single)
                    | ((st["last"] == cfg.stop_pair[0])
                       & (nxt == cfg.stop_pair[1]))
                )
                n_emit = st["n_emit"] + active.astype(jnp.int32)
                done = st["done"] | stopped | (n_emit >= max_new)
                # frontiers advance only for rows that were active (done/free
                # rows re-write their frontier slot: junk the mask excludes)
                length = st["length"] + active.astype(jnp.int32)
                cache = tuple(dict(c, index=length) for c in cache)
                return dict(cache=cache, length=length,
                            last=jnp.where(active, nxt, st["last"]),
                            done=done, n_emit=n_emit, tokens=tokens, rng=rng,
                            step=st["step"] + 1)

            st = dict(state, step=jnp.int32(0))
            st = jax.lax.while_loop(cond, body, st)
            nsteps = st.pop("step")
            return st, nsteps

        return run

    # ----------------------------------------------------------------- API
    def submit(self, embeds, request_id: Optional[int] = None) -> int:
        """Enqueue a request. ``embeds``: (T, D) prompt embeddings."""
        embeds = np.asarray(embeds)
        assert embeds.ndim == 2, "submit expects a single (T, D) prompt"
        t = embeds.shape[0]
        if t + self.cfg.max_new_tokens + 1 > self.bucket:
            raise ValueError(
                f"prompt of {t} tokens + max_new {self.cfg.max_new_tokens} "
                f"does not fit the {self.bucket}-token bucket")
        if t > self.admit_widths[-1]:
            raise ValueError(
                f"prompt of {t} tokens exceeds the largest admission width "
                f"{self.admit_widths[-1]}")
        rid = self._next_id if request_id is None else request_id
        self._next_id = max(self._next_id, rid) + 1
        self._queue.append(_Pending(rid, embeds))
        self.stats["submitted"] += 1
        return rid

    def _admit(self, slot: int, req: _Pending) -> None:
        t, d = req.embeds.shape
        width = next(w for w in self.admit_widths if w >= t)
        padded = np.zeros((1, width, d), req.embeds.dtype)
        padded[0, :t] = req.embeds
        self._rng, sub = jax.random.split(self._rng)
        mini, last0 = self._prefill_prog(width)(
            self.params, jnp.asarray(padded), jnp.int32(t), sub)
        if self._insert_prog is None:
            self._insert_prog = self._make_insert()
        self._state = self._insert_prog(self._state, mini, jnp.int32(slot),
                                        last0, jnp.int32(t))
        self._slot_req[slot] = req.request_id
        self._slot_prompt_len[slot] = t

    def step(self) -> List[Finished]:
        """One scheduler tick: admit pending requests into free slots, run
        one decode segment, collect finished rows.  Returns the requests
        that completed this tick."""
        for slot in range(self.slots):
            if not self._queue:
                break
            if self._slot_req[slot] is None:
                self._admit(slot, self._queue.pop(0))

        occupied = [s for s in range(self.slots) if self._slot_req[s] is not None]
        if not occupied:
            return []
        if self._segment_prog is None:
            self._segment_prog = self._make_segment()
        self._state, nsteps = self._segment_prog(self.params, self._state)
        self.stats["ticks"] += 1
        self.stats["decode_steps"] += int(nsteps)

        done = np.asarray(self._state["done"])
        finished: List[Finished] = []
        if any(done[s] for s in occupied):
            tokens = np.asarray(self._state["tokens"])
            for s in occupied:
                if not done[s]:
                    continue
                finished.append(Finished(
                    request_id=self._slot_req[s],
                    tokens=self._trim(tokens[s]),
                    n_prompt=self._slot_prompt_len[s]))
                self._slot_req[s] = None
            self.stats["completed"] += len(finished)
        return finished

    def drain(self, max_ticks: int = 10_000) -> List[Finished]:
        """Run ticks until the queue and every slot are empty."""
        out: List[Finished] = []
        for _ in range(max_ticks):
            if not self._queue and all(r is None for r in self._slot_req):
                return out
            out.extend(self.step())
        raise RuntimeError("drain did not converge (stuck request?)")

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(r is not None for r in self._slot_req)

    def _trim(self, row: np.ndarray) -> np.ndarray:
        """Trim a raw output row at stop/eos/pad, matching
        generation.decode_stop_trimmed's id-level semantics."""
        cfg = self.cfg
        ids: List[int] = []
        prev = None
        for t in row.tolist()[: cfg.max_new_tokens]:
            if t in (cfg.eos_token_id, cfg.stop_single, cfg.pad_token_id):
                break
            if prev == cfg.stop_pair[0] and t == cfg.stop_pair[1]:
                ids.pop()
                break
            ids.append(t)
            prev = t
        return np.asarray(ids, np.int32)
