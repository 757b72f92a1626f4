"""Dataset builders — registry shells binding configs to item datasets.

Counterpart of ``lavis/datasets/builders/``: each builder resolves
processors from its config, instantiates train/eval item datasets from
annotation paths + image roots, and honors ``max_train_samples``
(base_dataset_builder.py:43, base_task.py:47-66).

Config schema (dict or OmegaConf-like):
  build_info:
    annotations: {train: [paths], val: [...], test: [...]}
    images: {storage: vis_root}
  vis_processor: {train: {name, ...}, eval: {name, ...}}
  text_processor: {train: {name, ...}, eval: {name, ...}}
"""

from __future__ import annotations

from typing import Dict, Optional

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.datasets import items as I
from vlm_compression_tpu.datasets.processors import load_processor


def _get(cfg, key, default=None):
    if cfg is None:
        return default
    if hasattr(cfg, "get"):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


class BaseDatasetBuilder:
    train_dataset_cls = I.CaptionDataset
    eval_dataset_cls = I.CaptionEvalDataset

    def __init__(self, cfg=None):
        self.config = cfg or {}

    def _processor(self, kind: str, split: str):
        pcfg = _get(self.config, f"{kind}_processor", {}) or {}
        scfg = _get(pcfg, split) or _get(pcfg, "eval") or {}
        name = _get(scfg, "name")
        if name is None:
            name = ("blip2_image_train" if kind == "vis" and split == "train"
                    else "blip_image_eval" if kind == "vis"
                    else "blip_caption")
        return load_processor(name, scfg)

    def build_datasets(self, max_train_samples: Optional[int] = None
                       ) -> Dict[str, object]:
        info = _get(self.config, "build_info", {}) or {}
        anns = _get(info, "annotations", {}) or {}
        vis_root = _get(_get(info, "images", {}) or {}, "storage", "")
        out = {}
        for split in ("train", "val", "test"):
            paths = _get(anns, split)
            if not paths:
                continue
            cls = (self.train_dataset_cls if split == "train"
                   else self.eval_dataset_cls)
            out[split] = cls(
                vis_processor=self._processor("vis", split),
                text_processor=self._processor("text", split),
                vis_root=vis_root, ann_paths=paths,
                max_samples=max_train_samples if split == "train" else None)
        return out


def _register(name, train_cls, eval_cls):
    cls = type(f"{name}_builder", (BaseDatasetBuilder,),
               {"train_dataset_cls": train_cls, "eval_dataset_cls": eval_cls})
    registry.register_builder(name)(cls)
    return cls


# captioning (caption_builder.py)
COCOCapBuilder = _register("coco_caption", I.CaptionDataset,
                           I.CaptionEvalDataset)
NoCapsBuilder = _register("nocaps", I.CaptionDataset, I.CaptionEvalDataset)

# VQA (vqa_builder.py)
COCOVQABuilder = _register("coco_vqa", I.VQADataset, I.VQAEvalDataset)
OKVQABuilder = _register("ok_vqa", I.VQADataset, I.VQAEvalDataset)
AOKVQABuilder = _register("aok_vqa", I.VQADataset, I.VQAEvalDataset)
GQABuilder = _register("gqa", I.GQADataset, I.GQADataset)
VGVQABuilder = _register("vg_vqa", I.VQADataset, I.VQAEvalDataset)

# retrieval (retrieval_builder.py)
FlickrRetBuilder = _register("flickr30k", I.RetrievalDataset,
                             I.RetrievalDataset)
COCORetBuilder = _register("coco_retrieval", I.RetrievalDataset,
                           I.RetrievalDataset)

# prefix-LM pretraining corpora — RESSA calibration + retrain data
# (prefix_language_pretraining_builder.py:16-82).  The second group are
# the reference's exact registry names, so its project yamls port
# unchanged; the first are this framework's original short names.
for _n in ("cc3m_prefix", "cc12m_prefix", "sbu_prefix", "vg_prefix",
           "coco_prefix", "conceptual_caption_3m", "conceptual_caption_12m",
           "sbu_caption", "vg_caption", "coco_caption_pretrain",
           "prefix_conceptual_caption_3m", "prefix_conceptual_caption_12m",
           "prefix_sbu_caption", "prefix_vg_caption", "prefix_coco_caption",
           "instruct_cc3m_caption", "instruct_coco_caption",
           "instruct_vg_caption"):
    _register(_n, I.PrefixCaptionDataset, I.CaptionEvalDataset)


def load_builder(name: str, cfg=None) -> BaseDatasetBuilder:
    return registry.get_builder_class(name)(cfg)


# language-modeling corpus (c4_dataset_builder.py) + classification folders
# (imagefolder_builder.py — ImageNet et al. — and cifar100_builder.py)
C4Builder = _register("c4", I.TextDataset, I.TextDataset)
ImageNetBuilder = _register("imagenet", I.ClassificationDataset,
                            I.ClassificationDataset)
CIFAR100Builder = _register("cifar100", I.ClassificationDataset,
                            I.ClassificationDataset)

# classification / entailment (classification_builder.py)
NLVRBuilder = _register("nlvr", I.NLVRDataset, I.NLVRDataset)
SNLIVEBuilder = _register("snli_ve", I.VisualEntailmentDataset,
                          I.VisualEntailmentDataset)

# video-dataset registry names (video_qa_builder.py, dialogue_builder.py,
# retrieval/caption video builders).  Item classes load pre-extracted
# frame stacks → (t, h, w, c) per sample; the collater batches to the
# 5-dim (b, t, h, w, c) video input of the instruct models.
for _n in ("msrvtt_caption", "msvd_caption", "vatex_caption"):
    _register(_n, I.VideoCaptionDataset, I.VideoCaptionEvalDataset)
for _n in ("msrvtt_retrieval", "didemo_retrieval"):
    # eval exposes text/txt2img/img2txt for the ALPRO sim-matrix task
    _register(_n, I.VideoCaptionDataset, I.VideoRetrievalDataset)
for _n in ("msrvtt_qa", "msvd_qa"):
    _register(_n, I.VideoQADataset, I.VideoQAEvalDataset)
AVSDBuilder = _register("avsd_dialogue", I.VideoDialogueDataset,
                        I.VideoDialogueDataset)


@registry.register_builder("laion2B_multi")
class Laion2BMultiBuilder(BaseDatasetBuilder):
    """Streaming webdataset corpus (image_text_pair_builder.py:48-76):
    train-only, ``build_info.storage`` is a brace-glob of .tar shards;
    the reference returns the inner wds pipeline — here a tarfile-backed
    `LaionDataset` iterable with the standard sample schema."""

    train_dataset_cls = I.LaionDataset

    def build_datasets(self, max_train_samples: Optional[int] = None):
        import jax

        info = _get(self.config, "build_info", {}) or {}
        storage = _get(info, "storage", "")
        # --max_train_samples is a GLOBAL budget (map-style builders
        # truncate annotations before rank slicing) — split it across
        # hosts so the streamed total matches
        per_host = None
        if max_train_samples is not None:
            per_host = -(-max_train_samples // jax.process_count())
        ds = I.LaionDataset(
            vis_processor=self._processor("vis", "train"),
            text_processor=self._processor("text", "train"),
            location=storage,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            max_samples=per_host)
        return {"train": ds}
