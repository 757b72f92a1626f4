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

    def _crop_flip_pil(self, img: Image.Image) -> Image.Image:
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
        return img

    def __call__(self, img: Image.Image) -> np.ndarray:
        return _to_float(self._crop_flip_pil(img))


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


# ---------------------------------------------------------------------------
# RandAugment (lavis/processors/randaugment.py, 398 LoC of cv2 affine code)
# — PIL-native equivalent over the same op list blip_image_train uses.
# ---------------------------------------------------------------------------

from PIL import ImageEnhance, ImageOps  # noqa: E402


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0))


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0))


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, v * img.size[0], 0, 1, 0))


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, v * img.size[1]))


_RA_OPS = {
    "Identity": lambda img, v: img,
    "AutoContrast": lambda img, v: ImageOps.autocontrast(img),
    "Equalize": lambda img, v: ImageOps.equalize(img),
    "Brightness": lambda img, v: ImageEnhance.Brightness(img).enhance(
        1.0 + 0.6 * v),
    "Sharpness": lambda img, v: ImageEnhance.Sharpness(img).enhance(
        1.0 + 0.6 * v),
    "ShearX": lambda img, v: _shear_x(img, 0.3 * v),
    "ShearY": lambda img, v: _shear_y(img, 0.3 * v),
    "TranslateX": lambda img, v: _translate_x(img, 0.2 * v),
    "TranslateY": lambda img, v: _translate_y(img, 0.2 * v),
    "Rotate": lambda img, v: img.rotate(30 * v),
}


class RandomAugment:
    """N ops at magnitude M/10, signed (the blip_image_train augs list)."""

    def __init__(self, n: int = 2, m: int = 5, augs=None, rng=None):
        self.n = n
        self.m = m
        self.augs = list(augs or _RA_OPS)
        self.rng = rng or np.random.default_rng()

    def __call__(self, img: Image.Image) -> Image.Image:
        for name in self.rng.choice(self.augs, self.n):
            v = (self.m / 10.0) * self.rng.choice((-1.0, 1.0))
            img = _RA_OPS[name](img, float(v))
        return img


@registry.register_processor("blip_image_train")
class BlipImageTrainProcessor(Blip2ImageTrainProcessor):
    """BLIP-1 train transform: blip2_image_train + RandAugment(2, 5)
    over the reference's op list (blip_processors.py:108-135)."""

    def __init__(self, image_size: int = 384, min_scale: float = 0.5,
                 max_scale: float = 1.0, rng=None):
        super().__init__(image_size, min_scale, max_scale, rng)
        self.randaug = RandomAugment(2, 5, rng=self.rng)

    def __call__(self, img: Image.Image) -> np.ndarray:
        # the parent's RandomResizedCrop+flip on PIL, with RandAugment
        # inserted before normalization
        img = self._crop_flip_pil(img)
        img = self.randaug(img.convert("RGB"))
        return _to_float(img)


@registry.register_processor("clip_image_eval")
class ClipImageEvalProcessor(BaseProcessor):
    """Resize shorter side + center crop (clip processors)."""

    cfg_keys = ("image_size",)

    def __init__(self, image_size: int = 224):
        self.image_size = image_size

    def __call__(self, img: Image.Image) -> np.ndarray:
        w, h = img.size
        scale = self.image_size / min(w, h)
        img = img.resize((max(self.image_size, int(round(w * scale))),
                          max(self.image_size, int(round(h * scale)))),
                         Image.BICUBIC)
        w, h = img.size
        x = (w - self.image_size) // 2
        y = (h - self.image_size) // 2
        img = img.crop((x, y, x + self.image_size, y + self.image_size))
        return _to_float(img)


@registry.register_processor("clip_image_train")
class ClipImageTrainProcessor(Blip2ImageTrainProcessor):
    """RandomResizedCrop(scale=(0.9, 1.0)) — clip processors train cfg."""

    def __init__(self, image_size: int = 224, min_scale: float = 0.9,
                 max_scale: float = 1.0, rng=None):
        super().__init__(image_size, min_scale, max_scale, rng)


class _AlproVideoBase(BaseProcessor):
    """Video transforms over (t, h, w, c) stacks / lists of PIL frames
    (alpro_processors.py); the spatial transform is applied consistently
    across frames and frames are uniformly subsampled to n_frms."""

    cfg_keys = ("image_size", "n_frms")

    def __init__(self, image_size: int = 224, n_frms: int = 8, rng=None):
        self.image_size = image_size
        self.n_frms = n_frms
        self.rng = rng or np.random.default_rng()

    def _frames(self, video):
        if isinstance(video, np.ndarray):
            frames = [Image.fromarray(
                (np.clip(f, 0, 1) * 255).astype(np.uint8)
                if f.dtype != np.uint8 else f) for f in video]
        else:
            frames = list(video)
        t = len(frames)
        # always exactly n_frms (short clips repeat frames): ragged
        # per-sample frame counts would break the batch stack
        idx = np.linspace(0, t - 1, self.n_frms).round().astype(int)
        return [frames[i] for i in idx]


@registry.register_processor("alpro_video_eval")
class AlproVideoEvalProcessor(_AlproVideoBase):
    def __call__(self, video) -> np.ndarray:
        out = [np.asarray(_to_float(
            f.resize((self.image_size, self.image_size), Image.BICUBIC)))
            for f in self._frames(video)]
        return np.stack(out).astype(np.float32)


@registry.register_processor("alpro_video_train")
class AlproVideoTrainProcessor(_AlproVideoBase):
    def __call__(self, video) -> np.ndarray:
        frames = self._frames(video)
        w, h = frames[0].size
        s = min(w, h)
        x = int(self.rng.integers(0, w - s + 1))
        y = int(self.rng.integers(0, h - s + 1))
        flip = self.rng.random() < 0.5
        out = []
        for f in frames:
            f = f.crop((x, y, x + s, y + s)).resize(
                (self.image_size, self.image_size), Image.BICUBIC)
            if flip:
                f = f.transpose(Image.FLIP_LEFT_RIGHT)
            out.append(_to_float(f))
        return np.stack(out).astype(np.float32)


@registry.register_processor("gpt_dialogue")
class GPTDialogueProcessor(BaseProcessor):
    """AVSD dialogue → GPT token streams (gpt_processors.py:45-120):
    [caption ⊕ history turns ⊕ answer], each segment EOS-terminated;
    token_type ids mark caption/speaker1/speaker2 segments; labels mask
    everything but the answer.  The tokenizer is injectable (the
    reference hardcodes GPT2Tokenizer, which needs hub access)."""

    cfg_keys = ("max_turns", "use_caption")

    # special ids appended past the tokenizer vocab, reference
    # SPECIAL_TOKENS order: <bos> <eos> <speaker1> <speaker2> <cap>
    def __init__(self, max_turns: int = 3, use_caption: bool = True,
                 tokenizer=None):
        from vlm_compression_tpu.datasets.tokenization import SimpleTokenizer

        self.max_turns = max_turns
        self.use_caption = use_caption
        self.tokenizer = tokenizer or SimpleTokenizer(vocab_size=8192)
        base = getattr(self.tokenizer, "vocab_size", 8192)
        (self.bos, self.eos, self.speaker1, self.speaker2,
         self.cap) = range(base, base + 5)

    def _encode(self, text):
        tok = self.tokenizer
        ids = (tok.encode(text) if hasattr(tok, "encode") else tok(text))
        if isinstance(ids, dict):
            ids = ids["input_ids"]
        return [int(t) for t in ids]

    def sample_sequence(self, caption, history, answer):
        seqs = [caption] + history + [answer]
        seqs = [s + [self.eos] for s in seqs]
        input_ids = [t for s in seqs for t in s]
        token_type = [self.cap] * len(seqs[0]) + [
            self.speaker2 if i % 2 else self.speaker1
            for i, s in enumerate(seqs[1:]) for _ in s]
        labels = [-1] * sum(len(s) for s in seqs[:-1]) + seqs[-1]
        assert len(input_ids) == len(token_type) == len(labels)
        return {"input_ids": np.asarray(input_ids, np.int32),
                "token_type_ids": np.asarray(token_type, np.int32),
                "labels": np.asarray(labels, np.int32)}

    def __call__(self, ann):
        caption = (self._encode(" ".join(
            [ann.get("caption", ""), ann.get("summary", "")]))
            if self.use_caption else [])
        history = []
        for turn in ann.get("dialog", [])[-self.max_turns:]:
            history.append(self._encode(turn["question"]))
            history.append(self._encode(turn["answer"]))
        history.append(self._encode(ann["question"]))
        return self.sample_sequence(caption, history,
                                    self._encode(ann["answer"]))


@registry.register_processor("gpt_video_ft")
class GPTVideoFeatureProcessor(BaseProcessor):
    """Load pre-extracted per-clip feature stacks (gpt_processors.py:121-
    164): ``{ft_root}/{ft_name}/{vname}.npy`` per feature, concatenated
    along time with an all-ones attention mask."""

    cfg_keys = ("visual_ft", "audio_ft")

    def __init__(self, visual_ft=("i3d_rgb",), audio_ft=("vggish",)):
        self.visual_ft = list(visual_ft)
        self.audio_ft = list(audio_ft)

    def __call__(self, ft_root: str, vname: str) -> dict:
        import os

        fts = []
        for name in self.visual_ft + self.audio_ft:
            path = os.path.join(ft_root, name, f"{vname}.npy")
            fts.append(np.load(path).astype(np.float32))
        min_t = min(f.shape[0] for f in fts)
        feat = np.concatenate([f[:min_t] for f in fts], axis=-1)
        return {"video_fts": feat,
                "attention_mask": np.ones((feat.shape[0],), np.int32)}
