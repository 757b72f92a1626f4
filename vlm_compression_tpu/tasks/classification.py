"""Multimodal classification + language-modeling eval tasks.

Counterparts of ``lavis/tasks/multimodal_classification.py`` (accuracy
over ``predict_class`` candidate ranking) and
``lavis/tasks/language_modeling.py`` (C4 perplexity over the language
tower)."""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.datasets.tokenization import batch_encode, batch_labels
from vlm_compression_tpu.tasks.base import BaseTask


@registry.register_task("multimodal_classification")
class MultimodalClassificationTask(BaseTask):
    """Rank per-sample class candidates by decoder NLL
    (reference valid_step → model.predict_class)."""

    def __init__(self, tokenizer=None, qformer_tokenizer=None,
                 class_names: List[str] = None, max_len: int = 8):
        super().__init__()
        self.tokenizer = tokenizer
        self.qformer_tokenizer = qformer_tokenizer or tokenizer
        self.class_names = class_names or []
        self.max_len = max_len

    @classmethod
    def setup_task(cls, cfg=None, **kw):
        return cls()

    def valid_step(self, model, samples) -> List[Dict]:
        from vlm_compression_tpu.models.blip2_t5_instruct import (
            predict_class_t5,
        )

        cands = batch_labels(self.tokenizer, self.class_names, self.max_len)
        ids, mask = batch_encode(self.tokenizer, samples["text_input"], 64)
        q_ids, q_mask = batch_encode(self.qformer_tokenizer,
                                     samples["text_input"], 64)
        nll = predict_class_t5(
            model.module, model.variables,
            jnp.asarray(samples["image"], jnp.float32),
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(cands),
            jnp.asarray(q_ids), jnp.asarray(q_mask))
        pred = np.asarray(jnp.argmin(nll, axis=-1))
        out = []
        for i, p in enumerate(pred):
            rec = {"instance_id": samples["instance_id"][i],
                   "prediction": self.class_names[int(p)]}
            if "label" in samples:
                rec["label"] = samples["label"][i]
            out.append(rec)
        return out

    def after_evaluation(self, val_result, split_name="test", epoch="eval",
                         result_dir="result", **kw):
        scored = [r for r in val_result if "label" in r]
        acc = (100.0 * sum(r["prediction"] == r["label"] for r in scored)
               / max(len(scored), 1))
        metrics = {"agg_metrics": acc, "acc": acc}
        # model-size accounting (reference multimodal_classification.py:92-93)
        if "orig_total_size" in kw and "distilled_total_size" in kw:
            metrics["orig_size"] = \
                f"{kw['orig_total_size'] / 10 ** 9:.3f} B"
            metrics["dist_size"] = \
                f"{kw['distilled_total_size'] / 10 ** 9:.3f} B"
        logging.info("%s classification acc: %.2f", split_name, acc)
        os.makedirs(result_dir, exist_ok=True)
        with open(os.path.join(result_dir, "..", "evaluate.txt"), "a") as fh:
            fh.write(json.dumps({split_name: metrics}) + "\n")
        return metrics


@registry.register_task("language_modeling")
class LanguageModelingTask(BaseTask):
    """Perplexity of the language tower over raw text (C4 in the
    reference)."""

    def __init__(self, tokenizer=None, max_len: int = 128):
        super().__init__()
        self.tokenizer = tokenizer
        self.max_len = max_len

    @classmethod
    def setup_task(cls, cfg=None, **kw):
        return cls()

    def valid_step(self, model, samples) -> List[Dict]:
        import jax

        texts = samples["text_input"]
        ids, mask = batch_encode(self.tokenizer, texts, self.max_len,
                                 add_bos=True, add_eos=True)
        labels = np.where(mask.astype(bool), ids, -100)
        module = model.module
        # decoder-only tower: llm_model subtree; T5: full seq2seq denoising
        if hasattr(module, "llm_model"):
            from vlm_compression_tpu.models.llama import LlamaForCausalLM

            llm = LlamaForCausalLM(module.cfg.llm)
            lv = {c: t["llm_model"] for c, t in model.variables.items()
                  if isinstance(t, dict) and "llm_model" in t}
            out = llm.apply(lv, jnp.asarray(ids), jnp.asarray(mask),
                            labels=jnp.asarray(labels))
        else:
            from vlm_compression_tpu.models.t5 import (
                T5ForConditionalGeneration,
            )

            t5 = T5ForConditionalGeneration(module.cfg.t5)
            tv = {c: t["t5_model"] for c, t in model.variables.items()
                  if isinstance(t, dict) and "t5_model" in t}
            out = t5.apply(tv, jnp.asarray(ids), jnp.asarray(mask),
                           labels=jnp.asarray(labels))
        n_tok = int(np.sum(mask))
        return [{"loss": float(out["loss"]), "n_tokens": n_tok}]

    def after_evaluation(self, val_result, split_name="test", **kw):
        tot = sum(r["n_tokens"] for r in val_result)
        avg = (sum(r["loss"] * r["n_tokens"] for r in val_result)
               / max(tot, 1))
        ppl = float(np.exp(min(avg, 20)))
        metrics = {"agg_metrics": -ppl, "ppl": ppl, "loss": avg}
        logging.info("%s perplexity: %.3f", split_name, ppl)
        return metrics


# DialogueTask / VQARCTask / GQARCTask live in tasks/dialogue_rc.py.
