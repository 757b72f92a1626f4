"""Image-text retrieval task (Flickr30k / COCO).

Counterpart of ``lavis/tasks/retrieval.py`` + the runner's
``compute_sim_matrix`` (runner_base.py:1000-1120): encode the full image
and caption sets with the stage-1 Q-Former, ITC-rank (+ optional ITM
rerank with ``k_test``), report R@1/5/10 both directions."""

from __future__ import annotations

import json
import logging
import os

import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.datasets.tokenization import batch_encode
from vlm_compression_tpu.evaluation.retrieval_metrics import itm_eval
from vlm_compression_tpu.models.blip2_qformer import (
    Blip2Qformer,
    compute_sim_matrix,
)
from vlm_compression_tpu.tasks.base import BaseTask


@registry.register_task("retrieval")
@registry.register_task("ret_flickr_eval")
@registry.register_task("ret_coco_eval")
class RetrievalTask(BaseTask):
    def __init__(self, k_test: int = 0, tokenizer=None, max_txt_len: int = 35):
        super().__init__()
        self.k_test = k_test
        self.tokenizer = tokenizer
        self.max_txt_len = max_txt_len

    @classmethod
    def setup_task(cls, cfg=None, **kw):
        run = getattr(cfg, "run_cfg", None) if cfg is not None else None
        g = (run.get if hasattr(run, "get") else lambda k, d=None: d)
        return cls(k_test=int(g("k_test", 0)))

    def evaluation(self, model, data_loader, **kw):
        """data_loader wraps a RetrievalDataset (txt2img/img2txt maps)."""
        assert isinstance(model.module, Blip2Qformer), \
            "retrieval eval drives the stage-1 Q-Former model"
        ds = data_loader.dataset if hasattr(data_loader, "dataset") else None
        if ds is None:   # IterLoader wrapping
            ds = data_loader._loader.dataset
        text_ids, text_mask = batch_encode(self.tokenizer, ds.text,
                                           self.max_txt_len)
        image_batches = (jnp.asarray(b["image"], jnp.float32)
                         for b in data_loader)
        score_i2t, score_t2i = compute_sim_matrix(
            model.module, model.variables, image_batches,
            jnp.asarray(text_ids), jnp.asarray(text_mask),
            k_test=self.k_test)
        return {"score_i2t": score_i2t, "score_t2i": score_t2i,
                "txt2img": ds.txt2img, "img2txt": ds.img2txt}

    def after_evaluation(self, val_result, split_name="test", epoch="eval",
                         result_dir="result", **kw):
        metrics = itm_eval(val_result["score_i2t"], val_result["score_t2i"],
                           val_result["txt2img"], val_result["img2txt"])
        logging.info("%s retrieval: %s", split_name, metrics)
        os.makedirs(result_dir, exist_ok=True)
        with open(os.path.join(result_dir, "..", "evaluate.txt"), "a") as fh:
            fh.write(json.dumps({split_name: metrics}) + "\n")
        return metrics
