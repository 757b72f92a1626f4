"""Image / text processors.

Counterpart of ``lavis/processors/blip_processors.py``: registry names
``blip2_image_train`` (random-resized-crop + hflip + normalize),
``blip_image_eval`` (resize + normalize), ``blip_caption`` (prompt +
max-words truncation), ``blip_question`` (lowercase/strip cleaning).

torchvision is not in the image, so the transforms are PIL + numpy with
identical semantics (bicubic interpolation, CLIP-style normalization
constants).  Outputs are float32 HWC arrays — the towers take (b, h, w, 3).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from vlm_compression_tpu.common.registry import registry

# OpenAI-CLIP normalization used by every BLIP-2 processor
MEAN = (0.48145466, 0.4578275, 0.40821073)
STD = (0.26862954, 0.26130258, 0.27577711)


def _to_float(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (arr - np.asarray(MEAN, np.float32)) / np.asarray(STD, np.float32)


class BaseProcessor:
    @classmethod
    def from_config(cls, cfg=None):
        cfg = cfg or {}
        get = cfg.get if hasattr(cfg, "get") else lambda k, d=None: d
        return cls(**{k: get(k) for k in cls.cfg_keys if get(k) is not None})

    cfg_keys: Sequence[str] = ()


@registry.register_processor("blip_image_eval")
@registry.register_processor("blip2_image_eval")
class BlipImageEvalProcessor(BaseProcessor):
    cfg_keys = ("image_size",)

    def __init__(self, image_size: int = 224):
        self.image_size = image_size

    def __call__(self, img: Image.Image) -> np.ndarray:
        img = img.resize((self.image_size, self.image_size), Image.BICUBIC)
        return _to_float(img)


@registry.register_processor("blip2_image_train")
class Blip2ImageTrainProcessor(BaseProcessor):
    """RandomResizedCrop(scale=(0.5, 1.0)) + horizontal flip + normalize."""

    cfg_keys = ("image_size", "min_scale", "max_scale")

    def __init__(self, image_size: int = 224, min_scale: float = 0.5,
                 max_scale: float = 1.0, rng: Optional[np.random.Generator] = None):
        self.image_size = image_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: Image.Image) -> np.ndarray:
        w, h = img.size
        area = w * h
        for _ in range(10):
            target = area * self.rng.uniform(self.min_scale, self.max_scale)
            ratio = np.exp(self.rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target * ratio)))
            ch = int(round(np.sqrt(target / ratio)))
            if 0 < cw <= w and 0 < ch <= h:
                x = int(self.rng.integers(0, w - cw + 1))
                y = int(self.rng.integers(0, h - ch + 1))
                img = img.crop((x, y, x + cw, y + ch))
                break
        else:  # fallback: center crop of the short side
            s = min(w, h)
            x, y = (w - s) // 2, (h - s) // 2
            img = img.crop((x, y, x + s, y + s))
        img = img.resize((self.image_size, self.image_size), Image.BICUBIC)
        if self.rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return _to_float(img)


def pre_caption(caption: str, max_words: Optional[int] = None) -> str:
    """Reference text cleaning (blip_processors.py): strip punctuation
    classes, collapse whitespace, truncate to max_words."""
    caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
    caption = re.sub(r"\s{2,}", " ", caption)
    caption = caption.rstrip("\n").strip(" ")
    if max_words is not None:
        caption = " ".join(caption.split(" ")[:max_words])
    return caption


def pre_question(question: str, max_words: Optional[int] = None) -> str:
    question = re.sub(r"([.!\"()*#:;~])", "", question.lower())
    question = question.rstrip(" ")
    if max_words is not None:
        question = " ".join(question.split(" ")[:max_words])
    return question


@registry.register_processor("blip_caption")
class BlipCaptionProcessor(BaseProcessor):
    cfg_keys = ("prompt", "max_words")

    def __init__(self, prompt: str = "", max_words: int = 50):
        self.prompt = prompt
        self.max_words = max_words

    def __call__(self, caption: str) -> str:
        return self.prompt + pre_caption(caption, self.max_words)


@registry.register_processor("blip_question")
class BlipQuestionProcessor(BaseProcessor):
    cfg_keys = ("max_words",)

    def __init__(self, max_words: int = 50):
        self.max_words = max_words

    def __call__(self, question: str) -> str:
        return pre_question(question, self.max_words)


def load_processor(name: str, cfg=None):
    return registry.get_processor_class(name).from_config(cfg)
