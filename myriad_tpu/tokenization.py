"""LLaMA tokenizer access with a deterministic weightless fallback.

The reference uses HF ``LlamaTokenizer.from_pretrained(vicuna_dir)``
(myriad.py:183-184).  When a Vicuna/LLaMA tokenizer directory is configured
it is used verbatim (exact '###' id parity: [835] / [2277, 29937]).  For
weightless runs and tests, ``ByteTokenizer`` provides a reversible
byte-level encoding in the same 32000-id space.
"""

from __future__ import annotations

from typing import List, Optional


class ByteTokenizer:
    """Reversible byte-level tokenizer in LLaMA's id conventions.

    ids: 0=pad/unk, 1=bos, 2=eos, bytes b -> 3 + b (3..258).  Everything the
    framework needs (deterministic encode/decode, bos/eos/pad ids) without a
    sentencepiece model.
    """

    vocab_size = 32000
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 2  # reference sets pad = eos (myriad.py:184)

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = [3 + b for b in text.encode("utf-8")]
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def __call__(self, text, add_special_tokens: bool = False,
                 max_length: Optional[int] = None, **_unused):
        if isinstance(text, str):
            text = [text]
        out = [self.encode(t, add_special_tokens) for t in text]
        if max_length is not None:
            out = [ids[:max_length] for ids in out]
        return {"input_ids": out}

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        raw = bytearray()
        for i in ids:
            i = int(i)
            if i >= 3:
                raw.append(min(i - 3, 255))
            elif not skip_special_tokens:
                pass
        return raw.decode("utf-8", errors="replace")

    def batch_decode(self, rows, **kw) -> List[str]:
        return [self.decode(r, **kw) for r in rows]


def load_llama_tokenizer(path: str = ""):
    """HF tokenizer when available, ByteTokenizer otherwise."""
    if path:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(path, use_fast=False)
            if tok.pad_token is None:
                tok.pad_token = tok.eos_token
            return tok
        except Exception as e:  # pragma: no cover - depends on local files
            import logging

            logging.warning("failed to load tokenizer from %s (%s); using ByteTokenizer", path, e)
    return ByteTokenizer()
