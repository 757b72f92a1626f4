"""Batch preparers: dataset sample dicts → model kwarg arrays.

The reference tokenizes inside each model forward (tokenizers are module
attributes, blip2_t5_instruct.py:149-179); jit-compiled models consume
ids, so tokenization lives here — host-side, overlapped with device
compute by PrefetchLoader.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from vlm_compression_tpu.datasets.tokenization import (
    batch_encode,
    batch_labels,
    pack_qa,
)


def make_t5_batch_preparer(tokenizer, qformer_tokenizer=None,
                           max_txt_len: int = 128,
                           max_output_len: int = 256,
                           prompt: str = "") -> Callable:
    """InstructBLIP-T5: encoder text + qformer instruction + T5 labels."""
    qtok = qformer_tokenizer or tokenizer

    def prepare(samples: Dict) -> Dict[str, np.ndarray]:
        text_in = [prompt + t for t in samples["text_input"]]
        text_out = samples.get("text_output", samples["text_input"])
        input_ids, attn = batch_encode(tokenizer, text_in, max_txt_len)
        labels = batch_labels(tokenizer, text_out, max_output_len)
        q_ids, q_mask = batch_encode(qtok, text_in, max_txt_len)
        return {
            "image": np.asarray(samples["image"], np.float32),
            "input_ids": input_ids, "attention_mask": attn,
            "labels": labels,
            "qformer_input_ids": q_ids, "qformer_attention_mask": q_mask,
        }

    return prepare


def make_vicuna_batch_preparer(tokenizer, qformer_tokenizer=None,
                               max_txt_len: int = 128,
                               max_output_len: int = 256,
                               prompt: str = "") -> Callable:
    """InstructBLIP-Vicuna: packed prompt⊕answer + -100 labels
    (reference concat_text_input_output, blip2_vicuna_instruct.py:117-139)."""
    qtok = qformer_tokenizer or tokenizer

    def prepare(samples: Dict) -> Dict[str, np.ndarray]:
        prompts = [prompt + t for t in samples["text_input"]]
        answers = list(samples.get("text_output", samples["text_input"]))
        ids, mask, labels = pack_qa(tokenizer, prompts, answers,
                                    max_txt_len, max_output_len)
        q_ids, q_mask = batch_encode(qtok, prompts, max_txt_len)
        return {
            "image": np.asarray(samples["image"], np.float32),
            "text_input_ids": ids, "text_attention_mask": mask,
            "labels": labels,
            "qformer_input_ids": q_ids, "qformer_attention_mask": q_mask,
        }

    return prepare
