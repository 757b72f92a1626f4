"""VQA / GQA tasks — generation-based answering + official metrics.

Counterpart of ``lavis/tasks/vqa.py``: ``valid_step`` formats the question
with the model prompt, generates short answers (``predict_answers``,
reference :99-117 → blip2_t5_instruct.predict_answers :434-480), and
``after_evaluation`` runs the official VQAEval protocol (:143-184) or GQA
exact match (:186-250).

Ground-truth answers ride along in the sample dicts (the offline data
layer keeps them; the reference re-reads annotation files instead).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.datasets.tokenization import batch_encode
from vlm_compression_tpu.evaluation.vqa_eval import VQAEval, gqa_exact_match
from vlm_compression_tpu.models.generation import GenerationConfig
from vlm_compression_tpu.tasks.base import BaseTask


@registry.register_task("vqa")
@registry.register_task("aok_vqa")
class VQATask(BaseTask):
    def __init__(self, num_beams: int = 5, max_len: int = 10,
                 min_len: int = 1, prompt: str = "",
                 tokenizer=None, qformer_tokenizer=None,
                 sample_id_key: str = "question_id",
                 apply_lemmatizer: bool = False,
                 speculative_gamma: int = 0, **kw):
        super().__init__()
        self.num_beams = num_beams
        # speculative_gamma > 0: greedy draft-and-verify serving — the
        # compressed student (masked) drafts, the DENSE teacher verifies;
        # answers are the teacher's greedy outputs (beyond-reference)
        self.speculative_gamma = speculative_gamma
        self.max_len = max_len
        self.min_len = min_len
        self.prompt = prompt
        self.tokenizer = tokenizer
        self.qformer_tokenizer = qformer_tokenizer or tokenizer
        self.sample_id_key = sample_id_key
        self.apply_lemmatizer = apply_lemmatizer
        self.answer_list = None

    @classmethod
    def setup_task(cls, cfg=None, **kw):
        run = getattr(cfg, "run_cfg", None) if cfg is not None else None
        g = (run.get if hasattr(run, "get") else lambda k, d=None: d)
        # the reference carries apply_lemmatizer on the MODEL config
        # (okvqa eval yamls set model.apply_lemmatizer: True and
        # blip2_t5_instruct.predict_answers applies it :477-478)
        model = getattr(cfg, "model_cfg", None) if cfg is not None else None
        mg = (model.get if hasattr(model, "get") else lambda k, d=None: d)
        return cls(num_beams=int(g("num_beams", 5)),
                   max_len=int(g("max_len", 10)),
                   min_len=int(g("min_len", 1)),
                   prompt=str(g("prompt", "")),
                   apply_lemmatizer=bool(mg("apply_lemmatizer", False)
                                         or g("apply_lemmatizer", False)),
                   speculative_gamma=int(g("speculative_gamma", 0)))

    # ------------------------------------------------------------------
    def _decode(self, seqs) -> List[str]:
        tok = self.tokenizer
        out = []
        for row in np.asarray(seqs):
            ids = [int(t) for t in row[1:]]
            if hasattr(tok, "eos_token_id") and tok.eos_token_id in ids:
                ids = ids[: ids.index(tok.eos_token_id)]
            text = tok.decode(ids) if not hasattr(tok, "batch_decode") else \
                tok.decode(ids, skip_special_tokens=True)
            out.append(text.strip())
        return out

    def valid_step(self, model, samples) -> List[Dict]:
        """model: FlaxModel of an InstructBLIP composition.

        With ``answer_list`` set, answers are RANKED by decoder NLL over
        the candidate list instead of generated (the reference's
        predict_answers(answer_list=...) ranking path)."""
        from vlm_compression_tpu.models.blip2_t5_instruct import (
            Blip2T5Instruct,
            generate_t5,
        )

        if self.answer_list:
            return self._rank_step(model, samples)
        from vlm_compression_tpu.models.blip2_vicuna_instruct import (
            generate_vicuna,
        )

        questions = [self.prompt.format(q) if "{}" in self.prompt
                     else self.prompt + q for q in samples["text_input"]]
        image = jnp.asarray(samples["image"], jnp.float32)
        gen_cfg = GenerationConfig(
            num_beams=self.num_beams, max_length=self.max_len + 1,
            min_length=self.min_len)
        q_ids, q_mask = batch_encode(self.qformer_tokenizer, questions, 128)

        from vlm_compression_tpu.models.blip2_opt import (
            Blip2OPT,
            generate_opt,
        )

        def _spec(gen_cfg):
            """(gen_cfg, extra generate kwargs) for speculative serving:
            all three families take the same knobs — masked student
            drafts, dense teacher verifies."""
            if self.speculative_gamma <= 0:
                return gen_cfg, {}
            if self.num_beams > 1:
                logging.warning(
                    "speculative_gamma=%d replaces num_beams=%d with "
                    "greedy draft-and-verify (answers = the dense "
                    "teacher's GREEDY decode, not beam search)",
                    self.speculative_gamma, self.num_beams)
            return (dataclasses.replace(gen_cfg, num_beams=1),
                    dict(llm_mode="dense", draft_llm_mode="masked",
                         speculative_gamma=self.speculative_gamma))

        if isinstance(model.module, Blip2T5Instruct):
            ids, mask = batch_encode(self.tokenizer, questions, 128)
            gen_cfg, spec_kw = _spec(gen_cfg)
            seqs = generate_t5(model.module, model.variables, image,
                               jnp.asarray(ids), jnp.asarray(mask),
                               jnp.asarray(q_ids), jnp.asarray(q_mask),
                               gen_cfg=gen_cfg, **spec_kw)
        elif isinstance(model.module, Blip2OPT):
            ids, mask = batch_encode(self.tokenizer, questions, 128,
                                     left_pad=True, add_bos=True)
            gen_cfg = GenerationConfig(
                num_beams=self.num_beams, max_length=self.max_len + 1,
                min_length=self.min_len, eos_token_id=2, pad_token_id=1)
            gen_cfg, spec_kw = _spec(gen_cfg)
            seqs = generate_opt(model.module, model.variables, image,
                                jnp.asarray(ids), jnp.asarray(mask),
                                gen_cfg=gen_cfg, **spec_kw)
        else:
            ids, mask = batch_encode(self.tokenizer, questions, 128,
                                     left_pad=True, add_bos=True)
            gen_cfg = GenerationConfig(
                num_beams=self.num_beams, max_length=self.max_len + 1,
                min_length=self.min_len,
                eos_token_id=model.module.cfg.llm.eos_token_id)
            gen_cfg, spec_kw = _spec(gen_cfg)
            seqs = generate_vicuna(model.module, model.variables, image,
                                   jnp.asarray(ids), jnp.asarray(mask),
                                   jnp.asarray(q_ids), jnp.asarray(q_mask),
                                   gen_cfg=gen_cfg, **spec_kw)
        answers = self._decode(seqs)
        if self.apply_lemmatizer:
            from vlm_compression_tpu.evaluation.lemmatize import lemmatize

            answers = lemmatize(answers)
        out = []
        for i, ans in enumerate(answers):
            rec = {"question_id": samples[self.sample_id_key][i],
                   "answer": ans}
            if "answers" in samples:
                rec["gt_answers"] = samples["answers"][i]
            out.append(rec)
        return out

    def _rank_step(self, model, samples) -> List[Dict]:
        from vlm_compression_tpu.datasets.tokenization import batch_labels
        from vlm_compression_tpu.models.blip2_t5_instruct import (
            Blip2T5Instruct,
            predict_class_t5,
        )

        questions = [self.prompt.format(q) if "{}" in self.prompt
                     else self.prompt + q for q in samples["text_input"]]
        ids, mask = batch_encode(self.tokenizer, questions, 128)
        q_ids, q_mask = batch_encode(self.qformer_tokenizer, questions, 128)
        if isinstance(model.module, Blip2T5Instruct):
            cands = batch_labels(self.tokenizer, self.answer_list,
                                 self.max_len)
            nll = predict_class_t5(
                model.module, model.variables,
                jnp.asarray(samples["image"], jnp.float32),
                jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(cands),
                jnp.asarray(q_ids), jnp.asarray(q_mask))
        else:
            from vlm_compression_tpu.models.blip2_vicuna_instruct import (
                predict_class_vicuna,
            )

            c_ids, c_mask = batch_encode(self.tokenizer, self.answer_list,
                                         self.max_len)
            nll = predict_class_vicuna(
                model.module, model.variables,
                jnp.asarray(samples["image"], jnp.float32),
                jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(c_ids), jnp.asarray(c_mask),
                jnp.asarray(q_ids), jnp.asarray(q_mask))
        best = np.asarray(jnp.argmin(nll, axis=-1))
        out = []
        for i, b in enumerate(best):
            rec = {"question_id": samples[self.sample_id_key][i],
                   "answer": self.answer_list[int(b)]}
            if "answers" in samples:
                rec["gt_answers"] = samples["answers"][i]
            out.append(rec)
        return out

    # ------------------------------------------------------------------
    def after_evaluation(self, val_result, split_name="test", epoch="eval",
                         result_dir="result", **kw):
        f = self.save_result(val_result, result_dir,
                             f"{split_name}_vqa_result",
                             remove_duplicate="question_id")
        # reference vqa.py:135-137 stores the runner-computed model-size
        # accounting for the metric report
        self._sizes = {k: kw[k] for k in
                       ("orig_total_size", "distilled_total_size") if k in kw}
        return self._report_metrics(f, split_name, result_dir)

    def _size_metrics(self) -> Dict:
        s = getattr(self, "_sizes", {})
        if not s:
            return {}
        # reference formatting (vqa.py:163-164): billions, 3 decimals
        return {"orig_size": f"{s['orig_total_size'] / 10 ** 9:.3f} B",
                "dist_size": f"{s['distilled_total_size'] / 10 ** 9:.3f} B"}

    def _report_metrics(self, result_file, split_name, result_dir):
        with open(result_file) as fh:
            results = json.load(fh)
        scored = [r for r in results if "gt_answers" in r]
        if not scored:
            return {"agg_metrics": 0.0}
        ev = VQAEval()
        acc = ev.evaluate(scored)
        metrics = {**self._size_metrics(),
                   "agg_metrics": acc["overall"], **acc}
        logging.info("%s VQA accuracy: %s", split_name, acc)
        with open(os.path.join(result_dir, "..", "evaluate.txt"), "a") as fh:
            fh.write(json.dumps({split_name: metrics}) + "\n")
        return metrics


@registry.register_task("gqa")
class GQATask(VQATask):
    def _report_metrics(self, result_file, split_name, result_dir):
        with open(result_file) as fh:
            results = json.load(fh)
        scored = [r for r in results if "gt_answers" in r]
        acc = gqa_exact_match(scored)
        metrics = {**self._size_metrics(), "agg_metrics": acc, "acc": acc}
        logging.info("%s GQA accuracy: %.2f", split_name, acc)
        with open(os.path.join(result_dir, "..", "evaluate.txt"), "a") as fh:
            fh.write(json.dumps({split_name: metrics}) + "\n")
        return metrics
