"""Tokenizer wrappers + batch collation into model-ready id arrays.

The reference tokenizes inside each model forward with HF tokenizers
(blip2_t5_instruct.py:149-170); here models consume ids, so tokenization
happens in the collator (host-side, overlappable with device compute).

HF tokenizers load from a LOCAL path when given (the image has no network
egress); otherwise ``SimpleTokenizer`` — a deterministic whitespace+hash
vocabulary — keeps the whole pipeline runnable offline and in tests.

``pack_qa`` reproduces ``concat_text_input_output``
(blip2_vicuna_instruct.py:117-139): per-sample concatenation of prompt and
answer with no pad gap, plus the -100 label mask over prompt/pads.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Tuple

import numpy as np


class SimpleTokenizer:
    """Deterministic fallback: token id = stable hash into the vocab.

    ids 0..3 reserved: pad=0, eos=1, bos=2, unk=3 (llama-style layout)."""

    def __init__(self, vocab_size: int = 32000, pad_token_id: int = 0,
                 eos_token_id: int = 1, bos_token_id: int = 2):
        self.vocab_size = vocab_size
        self.pad_token_id = pad_token_id
        self.eos_token_id = eos_token_id
        self.bos_token_id = bos_token_id

    def _tok(self, w: str) -> int:
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        return 4 + h % (self.vocab_size - 4)

    def encode(self, text: str, add_bos: bool = False,
               add_eos: bool = False) -> List[int]:
        ids = [self._tok(w) for w in text.split()]
        if add_bos:
            ids = [self.bos_token_id] + ids
        if add_eos:
            ids = ids + [self.eos_token_id]
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(f"<{i}>" for i in ids
                        if i not in (self.pad_token_id, self.eos_token_id,
                                     self.bos_token_id))


def load_tokenizer(name_or_path: Optional[str] = None, **kw):
    """HF tokenizer from a local snapshot path, else SimpleTokenizer."""
    if name_or_path:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(name_or_path,
                                             local_files_only=True, **kw)
    return SimpleTokenizer(**kw)


def _enc(tokenizer, text, max_len, add_bos=False, add_eos=False):
    if isinstance(tokenizer, SimpleTokenizer):
        ids = tokenizer.encode(text, add_bos=add_bos, add_eos=add_eos)
    else:
        ids = tokenizer.encode(text, add_special_tokens=False)
        if add_bos and tokenizer.bos_token_id is not None:
            ids = [tokenizer.bos_token_id] + ids
        if add_eos and tokenizer.eos_token_id is not None:
            ids = ids + [tokenizer.eos_token_id]
    return ids[:max_len]


def batch_encode(tokenizer, texts: Sequence[str], max_len: int,
                 pad_id: Optional[int] = None, left_pad: bool = False,
                 add_bos: bool = False, add_eos: bool = False
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """(ids (b, L), mask (b, L)) right- (or left-) padded to the batch max,
    clipped at max_len."""
    pad_id = pad_id if pad_id is not None else tokenizer.pad_token_id
    encs = [_enc(tokenizer, t, max_len, add_bos, add_eos) for t in texts]
    L = max(1, min(max(map(len, encs), default=1), max_len))
    ids = np.full((len(texts), L), pad_id, np.int32)
    mask = np.zeros((len(texts), L), np.int32)
    for i, e in enumerate(encs):
        e = e[:L]
        if left_pad:
            ids[i, L - len(e):] = e
            mask[i, L - len(e):] = 1
        else:
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
    return ids, mask


def batch_labels(tokenizer, texts: Sequence[str], max_len: int,
                 add_eos: bool = True) -> np.ndarray:
    """T5-style labels: -100 padded (reference masks pad targets,
    blip2_t5_instruct.py:176-179)."""
    encs = [_enc(tokenizer, t, max_len, add_eos=add_eos) for t in texts]
    L = max(1, min(max(map(len, encs), default=1), max_len))
    out = np.full((len(texts), L), -100, np.int32)
    for i, e in enumerate(encs):
        out[i, : min(len(e), L)] = e[:L]
    return out


def pack_qa(tokenizer, prompts: Sequence[str], answers: Sequence[str],
            max_txt_len: int, max_output_len: int
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decoder-only packing (reference concat_text_input_output):
    returns (text_input_ids, text_attention_mask, labels) with labels
    -100 on the prompt tokens and pads, answer tokens (with EOS)
    supervised."""
    packed, lbl = [], []
    for p, a in zip(prompts, answers):
        pi = _enc(tokenizer, p, max_txt_len, add_bos=True)
        ai = _enc(tokenizer, a, max_output_len, add_eos=True)
        packed.append(pi + ai)
        lbl.append([-100] * len(pi) + ai)
    L = max(map(len, packed))
    pad = (tokenizer.pad_token_id
           if tokenizer.pad_token_id is not None else 0)
    ids = np.full((len(packed), L), pad, np.int32)
    mask = np.zeros((len(packed), L), np.int32)
    labels = np.full((len(packed), L), -100, np.int32)
    for i, (e, l) in enumerate(zip(packed, lbl)):
        ids[i, : len(e)] = e
        mask[i, : len(e)] = 1
        labels[i, : len(l)] = l
    return ids, mask, labels
