"""Dataset item classes.

The reference snapshot is MISSING ``lavis/datasets/datasets/`` (SURVEY.md
§2 row 5) — these classes are reconstructed from the builder/task
call-sites: samples are dicts with ``image`` (float32 HWC), text fields,
and ids (``image_id`` for captioning, ``question_id`` for VQA,
``instance_id`` everywhere for dedup in save_result).

Annotations are JSON lists of dicts (LAVIS format):
  caption:   {"image": rel_path, "caption": str | [str], "image_id": ...}
  vqa:       {"image": rel_path, "question": str, "question_id": ...,
              "answer": [str] | str}  (+ optional "weights")
  retrieval: {"image": rel_path, "caption": [str]}
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional

import numpy as np
from PIL import Image


def _load_ann(paths) -> List[dict]:
    if isinstance(paths, str):
        paths = [paths]
    out = []
    for p in paths:
        with open(p) as f:
            data = json.load(f)
        out.extend(data if isinstance(data, list) else data["annotations"])
    return out


class BaseItemDataset:
    def __init__(self, vis_processor, text_processor, vis_root: str,
                 ann_paths, max_samples: Optional[int] = None):
        self.vis_processor = vis_processor
        self.text_processor = text_processor
        self.vis_root = vis_root
        self.annotation = _load_ann(ann_paths)
        if max_samples is not None:
            self.annotation = self.annotation[:max_samples]
        for i, ann in enumerate(self.annotation):
            ann.setdefault("instance_id", i)

    def __len__(self):
        return len(self.annotation)

    def _image(self, ann) -> np.ndarray:
        path = os.path.join(self.vis_root, ann["image"])
        with Image.open(path) as img:
            return self.vis_processor(img)

    def collater(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k in samples[0]:
            vals = [s[k] for s in samples]
            if isinstance(vals[0], np.ndarray):
                out[k] = np.stack(vals)
            else:
                out[k] = vals
        return out


class CaptionDataset(BaseItemDataset):
    """train split: one (image, caption) pair per annotation."""

    def __getitem__(self, i):
        ann = self.annotation[i]
        cap = ann["caption"]
        cap = cap[0] if isinstance(cap, list) else cap
        return {
            "image": self._image(ann),
            "text_input": self.text_processor(cap),
            "text_output": self.text_processor(cap),
            "image_id": ann.get("image_id", ann["instance_id"]),
            "instance_id": ann["instance_id"],
        }


class CaptionEvalDataset(BaseItemDataset):
    def __getitem__(self, i):
        ann = self.annotation[i]
        return {
            "image": self._image(ann),
            "image_id": ann.get("image_id", ann["instance_id"]),
            "instance_id": ann["instance_id"],
        }


class VQADataset(BaseItemDataset):
    """train: majority answer; samples carry the full answer list too."""

    def __getitem__(self, i):
        ann = self.annotation[i]
        answers = ann.get("answer", ann.get("answers", []))
        if isinstance(answers, str):
            answers = [answers]
        best = max(set(answers), key=answers.count) if answers else ""
        return {
            "image": self._image(ann),
            "text_input": self.text_processor(ann["question"]),
            "text_output": best,
            "answers": answers,
            "question_id": ann.get("question_id", ann["instance_id"]),
            "instance_id": ann["instance_id"],
        }


class VQAEvalDataset(VQADataset):
    pass


class GQADataset(VQADataset):
    pass


class RetrievalDataset(BaseItemDataset):
    """Flickr30k-style: exposes parallel image/text lists for sim-matrix
    scoring (runner_base.py:1000-1120)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.text: List[str] = []
        self.image_paths: List[str] = []
        self.txt2img: List[int] = []
        self.img2txt: Dict[int, List[int]] = {}
        for img_i, ann in enumerate(self.annotation):
            self.image_paths.append(ann.get("image", ann.get("video")))
            self.img2txt[img_i] = []
            caps = ann["caption"]
            caps = caps if isinstance(caps, list) else [caps]
            for c in caps:
                self.img2txt[img_i].append(len(self.text))
                self.text.append(self.text_processor(c))
                self.txt2img.append(img_i)

    def __getitem__(self, i):
        ann = self.annotation[i]
        return {
            "image": self._image(ann),
            "index": i,
            "instance_id": ann["instance_id"],
        }


class PrefixCaptionDataset(CaptionDataset):
    """CC3M/CC12M/SBU prefix-LM pretraining data — the RESSA calibration +
    retrain corpus (prefix_language_pretraining_builder.py).  Identical
    sample schema; the task decides how the text is split/prompted."""


class TextDataset(BaseItemDataset):
    """Text-only corpus (C4 — reference c4_dataset_builder) for the
    language-modeling task.  Annotations carry {"text": ...}; no images."""

    def _image(self, ann):  # pragma: no cover - never called
        raise RuntimeError("text-only dataset has no images")

    def __getitem__(self, i):
        ann = self.annotation[i]
        txt = ann.get("text", ann.get("text_input", ""))
        return {
            "text_input": self.text_processor(txt),
            "instance_id": ann["instance_id"],
        }


class ClassificationDataset(BaseItemDataset):
    """(image, label) items — ImageNet / CIFAR-100 style folders
    (reference imagefolder_builder.py / cifar100_builder.py), driven by a
    JSON annotation list [{"image": ..., "label": int}]."""

    def __getitem__(self, i):
        ann = self.annotation[i]
        return {
            "image": self._image(ann),
            "label": int(ann["label"]),
            "instance_id": ann["instance_id"],
        }


class NLVRDataset(BaseItemDataset):
    """NLVR2 pairs: two images + a statement + true/false label
    (reference nlvr builder; legacy ALBEF/BLIP NLVR models)."""

    def __getitem__(self, i):
        ann = self.annotation[i]
        return {
            "image0": self.vis_processor(
                Image.open(os.path.join(self.vis_root, ann["images"][0]))),
            "image1": self.vis_processor(
                Image.open(os.path.join(self.vis_root, ann["images"][1]))),
            "text_input": self.text_processor(ann["sentence"]),
            "label": 1 if str(ann.get("label", "")).lower() == "true" else 0,
            "instance_id": ann["instance_id"],
        }


class VisualEntailmentDataset(BaseItemDataset):
    """SNLI-VE: image + sentence → {entailment, neutral, contradiction}."""

    LABELS = {"entailment": 0, "neutral": 1, "contradiction": 2}

    def __getitem__(self, i):
        ann = self.annotation[i]
        lab = ann.get("label", 0)
        if isinstance(lab, str):
            lab = self.LABELS[lab.strip().lower()]
        return {
            "image": self._image(ann),
            "text_input": self.text_processor(
                ann.get("sentence", ann.get("caption", ""))),
            "label": int(lab),
            "instance_id": ann["instance_id"],
        }


# ---------------------------------------------------------------------------
# video item datasets (frame stacks)
# ---------------------------------------------------------------------------


class _VideoFramesMixin:
    """Frame loading for video datasets (VERDICT round-1 item 6).

    The reference's video datasets decode with decord (its snapshot is
    missing the item classes entirely — SURVEY.md §2 row 5); offline we
    load pre-extracted frames.  ``ann["video"]`` may point at:

    * a directory of frame images (sorted filenames),
    * a ``.npy`` stack of shape (t, h, w, c) in [0, 255] or [0, 1],
    * a list of frame image paths.

    Frames are uniformly subsampled/padded to ``num_frames`` and each is
    run through the image processor, yielding a (t, h, w, c) float32
    stack — the 5-dim model input once the collater adds the batch dim.
    """

    num_frames = 4

    def _frame_paths(self, spec):
        if isinstance(spec, list):
            return [os.path.join(self.vis_root, p) for p in spec]
        path = os.path.join(self.vis_root, spec)
        if os.path.isdir(path):
            names = sorted(os.listdir(path))
            return [os.path.join(path, n) for n in names
                    if n.lower().endswith((".jpg", ".jpeg", ".png"))]
        return [path]

    def _video(self, ann) -> np.ndarray:
        spec = ann.get("video", ann.get("image"))
        if isinstance(spec, str) and spec.endswith(".npy"):
            stack = np.load(os.path.join(self.vis_root, spec))
            if stack.dtype == np.uint8:
                u8 = stack
            else:
                # float stacks may be [0,1] or [0,255]; decide by range,
                # not dtype
                arr = stack.astype(np.float32)
                if arr.max() > 1.5:
                    u8 = np.clip(arr, 0, 255).astype(np.uint8)
                else:
                    u8 = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            if hasattr(self.vis_processor, "n_frms"):
                # whole-video processor (alpro_video_*): takes the (t,h,w,c)
                # stack and does its own temporal subsampling
                return np.asarray(self.vis_processor(u8), np.float32)
            frames = [self.vis_processor(Image.fromarray(f)) for f in u8]
        else:
            paths = self._frame_paths(spec)
            if hasattr(self.vis_processor, "n_frms"):
                pils = [Image.open(p).convert("RGB") for p in paths]
                out = np.asarray(self.vis_processor(pils), np.float32)
                for im in pils:
                    im.close()
                return out
            frames = []
            for p in paths:
                with Image.open(p) as img:
                    frames.append(self.vis_processor(img))
        # uniform temporal subsample / repeat-pad to num_frames
        t = len(frames)
        idx = np.linspace(0, t - 1, self.num_frames).round().astype(int)
        return np.stack([frames[i] for i in idx]).astype(np.float32)


class VideoCaptionDataset(_VideoFramesMixin, CaptionDataset):
    def __getitem__(self, i):
        out = super().__getitem__(i)
        return out

    def _image(self, ann):
        return self._video(ann)


class VideoCaptionEvalDataset(_VideoFramesMixin, CaptionEvalDataset):
    def _image(self, ann):
        return self._video(ann)


class VideoRetrievalDataset(_VideoFramesMixin, RetrievalDataset):
    """MSRVTT/DiDeMo retrieval: parallel video/caption lists — the ALPRO
    sim-matrix eval reads ``dataset.text`` / ``txt2img`` / ``img2txt``
    (alpro_retrieval.py:242-260) and batches under the ``video`` key."""

    def __getitem__(self, i):
        ann = self.annotation[i]
        return {
            "video": self._video(ann),
            "index": i,
            "instance_id": ann["instance_id"],
        }


class VideoQADataset(_VideoFramesMixin, VQADataset):
    def _image(self, ann):
        return self._video(ann)


class VideoQAEvalDataset(VideoQADataset):
    pass


class VideoDialogueDataset(_VideoFramesMixin, BaseItemDataset):
    """AVSD-style: dialogue history as instruction, response as target."""

    def __getitem__(self, i):
        ann = self.annotation[i]
        history = ann.get("dialog", ann.get("history", []))
        if isinstance(history, list):
            history = " ".join(
                (f"{h.get('question', '')} {h.get('answer', '')}"
                 if isinstance(h, dict) else str(h)) for h in history)
        return {
            "image": self._video(ann),
            "text_input": self.text_processor(history),
            "text_output": ann.get("answer", ann.get("caption", "")),
            "instance_id": ann["instance_id"],
        }


def expand_braces(pattern: str) -> List[str]:
    """Expand EVERY webdataset-style ``{00000..01743}`` numeric brace range
    (the reference's laion storage pattern,
    configs/datasets/laion/defaults_2B_multi.yaml); multiple ranges
    expand as a cross product."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if m is None:
        return [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    heads = [pattern[: m.start()] + str(i).zfill(width)
             for i in range(int(lo), int(hi) + 1)]
    return [h + tail for h in heads
            for tail in expand_braces(pattern[m.end():])]


class LaionDataset:
    """Streaming (image, caption) pairs from local webdataset tar shards —
    counterpart of ``lavis/datasets/datasets/laion_dataset.py`` (absent
    from the snapshot; rebuilt from the builder call-site
    ``image_text_pair_builder.py:48-76``: location = brace-glob of .tar
    shards, train-only, the builder returns the inner iterable).

    TPU-native design: plain ``tarfile`` streaming — no torch/webdataset
    dependency — yielding the same sample schema as ``CaptionDataset`` so
    ``collater`` and the prefix-LM tasks consume it unchanged.  Shards
    are sharded across hosts by ``process_index``/``process_count`` so a
    multi-host data-parallel job streams disjoint data.
    """

    def __init__(self, vis_processor, text_processor, location,
                 process_index: int = 0, process_count: int = 1,
                 max_samples: Optional[int] = None):
        self.vis_processor = vis_processor
        self.text_processor = text_processor
        pats = [location] if isinstance(location, str) else list(location)
        shards: List[str] = []
        for p in pats:
            shards.extend(expand_braces(p))
        if shards and not any(os.path.exists(s) for s in shards):
            raise FileNotFoundError(
                f"no laion shard exists under {pats} "
                f"({len(shards)} candidates, first: {shards[0]})")
        self.shards = shards[process_index::process_count]
        # per-host cap: build_datasets splits --max_train_samples across
        # builders, each host stops after its own max_samples
        self.max_samples = max_samples
        self.collater = BaseItemDataset.collater.__get__(self)

    def _decode(self, key, blobs) -> Optional[Dict[str, Any]]:
        img_blob = next((blobs[e] for e in (".jpg", ".jpeg", ".png", ".webp")
                         if e in blobs), None)
        if img_blob is None:
            return None
        caption = ""
        if ".json" in blobs:
            try:
                caption = json.loads(blobs[".json"].decode()).get("caption", "")
            except (ValueError, AttributeError):
                caption = ""
        elif ".txt" in blobs:
            caption = blobs[".txt"].decode("utf-8", "replace")
        import io

        with Image.open(io.BytesIO(img_blob)) as img:
            image = self.vis_processor(img.convert("RGB"))
        return {"image": image,
                "text_input": self.text_processor(caption),
                "text_output": self.text_processor(caption),
                "image_id": key, "instance_id": key}

    def __iter__(self):
        import tarfile
        import warnings

        yielded = 0
        for shard in self.shards:
            if not os.path.exists(shard):
                warnings.warn(f"laion shard missing, skipping: {shard}")
                continue
            with tarfile.open(shard) as tf:
                cur_key, blobs = None, {}
                for member in tf:
                    if not member.isfile():
                        continue
                    base = os.path.basename(member.name)
                    key, ext = os.path.splitext(base)
                    if cur_key is not None and key != cur_key:
                        s = self._decode(cur_key, blobs)
                        if s is not None:
                            yield s
                            yielded += 1
                            if (self.max_samples is not None
                                    and yielded >= self.max_samples):
                                return
                        blobs = {}
                    cur_key = key
                    blobs[ext.lower()] = tf.extractfile(member).read()
                if cur_key is not None:
                    s = self._decode(cur_key, blobs)
                    if s is not None:
                        yield s
                        yielded += 1
                        if (self.max_samples is not None
                                and yielded >= self.max_samples):
                            return
