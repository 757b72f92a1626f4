"""Captioning task (COCO / NoCaps).

Counterpart of ``lavis/tasks/captioning.py``: generate with beam search
(reference :53), evaluate with COCO metrics; ``agg_metrics = CIDEr +
BLEU-4`` (:99).  Ground-truth captions are collected from the eval
dataset annotations at setup time (the reference downloads the COCO-eval
json; offline we build gts from the dataset itself)."""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.datasets.tokenization import batch_encode
from vlm_compression_tpu.evaluation.caption_metrics import coco_caption_eval
from vlm_compression_tpu.models.generation import GenerationConfig
from vlm_compression_tpu.tasks.base import BaseTask


@registry.register_task("captioning")
class CaptionTask(BaseTask):
    def __init__(self, num_beams: int = 5, max_len: int = 30,
                 min_len: int = 8, prompt: str = "a photo of",
                 tokenizer=None, qformer_tokenizer=None, gts=None):
        super().__init__()
        self.num_beams = num_beams
        self.max_len = max_len
        self.min_len = min_len
        self.prompt = prompt
        if tokenizer is None:
            # config-driven setup provides no tokenizer object; use the
            # standard loader (HF snapshot when available, offline
            # SimpleTokenizer fallback — datasets/tokenization.py)
            from vlm_compression_tpu.datasets.tokenization import (
                load_tokenizer,
            )

            tokenizer = load_tokenizer()
        self.tokenizer = tokenizer
        self.qformer_tokenizer = qformer_tokenizer or tokenizer
        self.gts = gts or {}

    @classmethod
    def setup_task(cls, cfg=None, **kw):
        run = getattr(cfg, "run_cfg", None) if cfg is not None else None
        g = (run.get if hasattr(run, "get") else lambda k, d=None: d)
        return cls(num_beams=int(g("num_beams", 5)),
                   max_len=int(g("max_len", 30)),
                   min_len=int(g("min_len", 8)),
                   prompt=str(g("prompt", "a photo of")))

    def before_evaluation(self, model, dataset, **kw):
        """Collect ground-truth captions from eval datasets."""
        def pull(ds):
            for ann in getattr(ds, "annotation", []):
                caps = ann.get("caption")
                if caps is None:
                    continue
                caps = caps if isinstance(caps, list) else [caps]
                key = ann.get("image_id", ann.get("instance_id"))
                self.gts.setdefault(key, []).extend(caps)

        if isinstance(dataset, dict):
            for by_split in dataset.values():
                for ds in (by_split.values()
                           if isinstance(by_split, dict) else []):
                    pull(ds)
        else:
            pull(dataset)

    def valid_step(self, model, samples) -> List[Dict]:
        from vlm_compression_tpu.models.blip2_t5_instruct import (
            Blip2T5Instruct,
            generate_t5,
        )

        b = len(samples["image_id"])
        prompts = [self.prompt] * b
        image = jnp.asarray(samples["image"], jnp.float32)
        ids, mask = batch_encode(self.tokenizer, prompts, 32)
        q_ids, q_mask = batch_encode(self.qformer_tokenizer, prompts, 32)
        assert isinstance(model.module, Blip2T5Instruct), \
            "captioning currently drives the T5 composition"
        seqs = generate_t5(
            model.module, model.variables, image, jnp.asarray(ids),
            jnp.asarray(mask), jnp.asarray(q_ids), jnp.asarray(q_mask),
            gen_cfg=GenerationConfig(num_beams=self.num_beams,
                                     max_length=self.max_len + 1,
                                     min_length=self.min_len,
                                     repetition_penalty=1.0))
        caps = []
        tok = self.tokenizer
        for row in np.asarray(seqs):
            ids_row = [int(t) for t in row[1:]]
            if tok.eos_token_id in ids_row:
                ids_row = ids_row[: ids_row.index(tok.eos_token_id)]
            caps.append(tok.decode(ids_row).strip())
        return [{"image_id": samples["image_id"][i], "caption": caps[i]}
                for i in range(b)]

    def after_evaluation(self, val_result, split_name="test", epoch="eval",
                         result_dir="result", **kw):
        f = self.save_result(val_result, result_dir,
                             f"{split_name}_caption_result",
                             remove_duplicate="image_id")
        with open(f) as fh:
            results = json.load(fh)
        if not self.gts:
            return {"agg_metrics": 0.0}
        metrics = coco_caption_eval(results, self.gts)
        logging.info("%s caption metrics: %s", split_name, metrics)
        with open(os.path.join(result_dir, "..", "evaluate.txt"), "a") as fh:
            fh.write(json.dumps({split_name: metrics}) + "\n")
        return metrics
