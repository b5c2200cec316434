"""Deterministic offline tokenizer for data-pipeline tests and
benchmarks. Lives in its own module so dataloader WORKER processes can
import it without pulling in jax/flax (spawn-start cost + no accidental
device runtime in a data worker) — the full tiny-model test kit is in
mllm_npu_tpu.utils.testing."""

from __future__ import annotations

import zlib

import numpy as np


class FakeTokenizer:
    """Deterministic offline tokenizer for data-pipeline tests: special
    tokens (incl. the <img_xxxxx> ladder and <patch> spans) map to single
    dedicated ids; words hash into the remaining vocab."""

    def __init__(self, vocab_size: int = 4096, num_img_tokens: int = 100):
        from mllm_npu_tpu.constant import (BOI_TOKEN, BOP_TOKEN, EOI_TOKEN,
                                           EOP_TOKEN, IMG_TOKEN)
        self.vocab_size = vocab_size
        self.bos_token_id, self.eos_token_id, self.pad_token_id = 1, 2, 0
        self.bos_token, self.eos_token = "<s>", "</s>"
        self.special = {"<s>": 1, "</s>": 2, "<unk>": 0,
                        BOI_TOKEN: 10, EOI_TOKEN: 11,
                        BOP_TOKEN: 12, EOP_TOKEN: 13}
        for i in range(num_img_tokens):
            self.special[IMG_TOKEN.format(i)] = 20 + i
        self._rev = {v: k for k, v in self.special.items()}
        import re
        self._pattern = re.compile(
            "(" + "|".join(re.escape(t) for t in sorted(
                self.special, key=len, reverse=True)) + ")")
        self._word_base = 20 + num_img_tokens

    def encode(self, text: str, add_special_tokens: bool = False):
        ids = []
        for part in self._pattern.split(text):
            if not part:
                continue
            if part in self.special:
                ids.append(self.special[part])
            else:
                for w in part.split():
                    # crc32, not hash(): stable across processes (str
                    # hash is randomized per interpreter, which would
                    # break parent-vs-spawn-worker sequence equality)
                    h = (zlib.crc32(w.encode("utf-8"))
                         % (self.vocab_size - self._word_base))
                    ids.append(self._word_base + h)
        return ids

    def __call__(self, text, max_length=None, add_special_tokens=False,
                 truncation=False, padding=None, return_tensors=None):
        ids = self.encode(text, add_special_tokens=add_special_tokens)
        if truncation and max_length:
            ids = ids[:max_length]
        attn = [1] * len(ids)
        if padding == "max_length" and max_length:
            pad = max_length - len(ids)
            ids = ids + [self.pad_token_id] * pad
            attn = attn + [0] * pad
        out = {"input_ids": np.asarray([ids]),
               "attention_mask": np.asarray([attn])}
        return out

    def decode(self, ids, skip_special_tokens=False):
        toks = []
        for i in list(ids):
            i = int(i)
            if i in self._rev:
                if not skip_special_tokens:
                    toks.append(self._rev[i])
            else:
                toks.append(f"w{i}")
        return " ".join(toks)
