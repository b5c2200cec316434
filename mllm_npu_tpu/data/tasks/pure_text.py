"""Pure-text LM task: jsonl {'text': ...} → padded samples
(reference data/tasks/pure_text.py:11-92)."""

from __future__ import annotations

import random
from typing import Iterator, Optional

import numpy as np

from mllm_npu_tpu.constant import IGNORE_INDEX
from mllm_npu_tpu.data import streams
from mllm_npu_tpu.data.utils import collate_static


def decode_text_pretrain(record: dict, tokenizer, max_length=512) -> dict:
    text = record.get("text")
    if text is None or text.strip(" ;,[]{}'\".?:") == "":
        return {}
    ids = ([tokenizer.bos_token_id]
           + tokenizer.encode(text, add_special_tokens=False)
           + [tokenizer.eos_token_id])
    ids = ids[:max_length]
    attn = [1] * len(ids)
    pad = max_length - len(ids)
    input_ids = np.asarray(ids + [tokenizer.pad_token_id] * pad, np.int32)
    attention_mask = np.asarray(attn + [0] * pad, np.int32)
    labels = input_ids.copy()
    labels[attention_mask == 0] = IGNORE_INDEX
    zeros = np.zeros((max_length,), bool)
    return {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "labels": labels.astype(np.int32),
        "ids_gen_mask": zeros,
        "ids_cmp_mask": zeros.copy(),
        "embeds_gen_mask": None,
        "embeds_cmp_mask": None,
        "images": None,
        "text": text,
    }


def build_text_datapipes(data_dir, tokenizer=None, image_transform=None,
                         max_length=512, batch_size=None, cycle_count=None,
                         dataset_name=None, image_size=448, seed=888,
                         max_images_per_batch=1, shard_for_host=True, **kw):
    rng = random.Random(seed)

    def sample_iter() -> Iterator[dict]:
        files = streams.list_files(data_dir, "*.jsonl")
        if shard_for_host:
            files = streams.shard_for_host(files)
        for path in streams.shuffled(streams.cycle(files, cycle_count),
                                     16, rng):
            for _key, rec in streams.iter_jsonl(path):
                s = decode_text_pretrain(rec, tokenizer, max_length)
                if "input_ids" in s:
                    yield s

    if batch_size is None:
        return sample_iter()

    def batch_iter() -> Iterator[dict]:
        buf = []
        for s in streams.shuffled(sample_iter(), 512, rng):
            buf.append(s)
            if len(buf) == batch_size:
                yield collate_static(
                    buf, max_length=max_length,
                    max_images=max_images_per_batch, image_size=image_size,
                    pad_token_id=tokenizer.pad_token_id,
                    dataset_name=dataset_name)
                buf = []

    return batch_iter()


# reference alias (pure_text.py builder name)
build_text_pretrain_datapipes_for_llm = build_text_datapipes
