"""Image-text retrieval task (Flickr30k / COCO).

Counterpart of ``lavis/tasks/retrieval.py`` + the runner's
``compute_sim_matrix`` (runner_base.py:1000-1120): encode the full image
and caption sets with the stage-1 Q-Former, ITC-rank (+ optional ITM
rerank with ``k_test``), report R@1/5/10 both directions."""

from __future__ import annotations

import json
import logging
import os

import jax
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


def zoo_sim_matrix(module, variables, image_batches, text_ids, text_mask,
                   k_test: int = 0, enc_token_id=None):
    """Sim matrix for the legacy-zoo retrieval models.

    BLIP-1 / ALBEF (blip_retrieval.py eval via the shared
    albef_models/__init__.py:80-199 compute_sim_matrix): ITC ranking from
    the unimodal projections, plus an ITM rerank of the ``k_test``
    ITC-best candidates per row when k_test > 0.  ALPRO
    (alpro_retrieval.py:242-395): same shape over video batches with the
    fusion-encoder VTM head.  CLIP / EVA-CLIP: pure ITC over
    encode_image/encode_text (the reference's clip eval has no ITM head).

    Rerank scoring mirrors the reference exactly: score matrix initialized
    at -100.0 (albef_models/__init__.py:131-133), reranked entries get the
    RAW fp32 itm_head logit column 1 added to the ITC sim
    (albef_models/__init__.py:158,186 — not a softmax probability), and
    BLIP-1 swaps token 0 to the tokenizer's enc_token_id before the ITM
    fusion pass (albef_models/__init__.py:111-112)."""
    import numpy as np

    if hasattr(module, "encode_text"):        # CLIP family
        ft = np.asarray(module.apply(
            variables, text_ids, method=lambda m, t: m.encode_text(t)))
        fis = [np.asarray(module.apply(
            variables, b, method=lambda m, im: m.encode_image(im)))
            for b in image_batches]
        fi = np.concatenate(fis, axis=0)
        s = fi @ ft.T
        return s, s.T

    # BLIP-1 / ALBEF / ALPRO trunk: unimodal features (+ hidden states for
    # the ITM fusion pass, whose text argument differs per family — BLIP-1
    # fuses from token ids, ALBEF/ALPRO from the unimodal text hidden
    # states)
    from vlm_compression_tpu.models.albef import AlbefBase
    from vlm_compression_tpu.models.alpro import AlproBase

    fuse_hidden = isinstance(module, (AlbefBase, AlproBase))

    def text_fn(m, ids, mask):
        txt = m.unimodal_text(ids, mask)
        ft = m.text_proj(txt[:, 0].astype(jnp.float32))
        return ft / jnp.linalg.norm(ft, axis=-1, keepdims=True), txt

    def img_fn(m, image):
        img = (m.encode_video(image) if isinstance(m, AlproBase)
               else m.encode_image(image))
        fi = m.vision_proj(img[:, 0].astype(jnp.float32))
        return fi / jnp.linalg.norm(fi, axis=-1, keepdims=True), img

    ft, txt_hidden = module.apply(variables, text_ids, text_mask,
                                  method=text_fn)
    ft = np.asarray(ft)
    fi_list, emb_list = [], []
    for b in image_batches:
        f, e = module.apply(variables, b, method=img_fn)
        fi_list.append(np.asarray(f))
        emb_list.append(np.asarray(e))
    fi = np.concatenate(fi_list, axis=0)
    img_embeds = jnp.concatenate(emb_list, axis=0)
    sim = fi @ ft.T                                  # (n_img, n_txt)
    if not k_test:
        return sim, sim.T

    # BLIP-1: the reference substitutes the [ENC] token at position 0 of
    # every caption before the ITM pass (albef_models/__init__.py:111-112);
    # ITC above used the original [CLS] ids.
    itm_text_ids = text_ids
    if not fuse_hidden and enc_token_id is not None:
        itm_text_ids = text_ids.at[:, 0].set(jnp.int32(enc_token_id))

    def itm_fn(m, t_arg, mask, img):
        return m.itm_logits(t_arg, mask, img)

    def rerank(base, pick_text):
        out = np.full_like(base, -100.0)
        k = min(k_test, base.shape[1])
        for row in range(base.shape[0]):
            topk = np.argsort(base[row])[::-1][:k].copy()
            if pick_text:      # i2t: one image row, k texts
                t_arg = (txt_hidden[topk] if fuse_hidden
                         else itm_text_ids[topk])
                msk = text_mask[topk]
                img = jnp.repeat(img_embeds[row:row + 1], k, axis=0)
            else:              # t2i: one text row, k images
                t_arg = jnp.repeat(
                    (txt_hidden if fuse_hidden else itm_text_ids)
                    [row:row + 1], k, axis=0)
                msk = jnp.repeat(text_mask[row:row + 1], k, axis=0)
                img = img_embeds[topk]
            logits = module.apply(variables, t_arg, msk, img, method=itm_fn)
            itm = np.asarray(logits.astype(jnp.float32))[:, 1]
            out[row, topk] = base[row, topk] + itm
        return out

    return rerank(sim, True), rerank(sim.T, False)


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
        ds = data_loader.dataset if hasattr(data_loader, "dataset") else None
        if ds is None:   # IterLoader wrapping
            ds = data_loader._loader.dataset
        from vlm_compression_tpu.models.alpro import AlproBase

        text_ids, text_mask = batch_encode(self.tokenizer, ds.text,
                                           self.max_txt_len)
        vis_key = ("video" if isinstance(model.module, AlproBase)
                   else "image")
        image_batches = (jnp.asarray(b[vis_key], jnp.float32)
                         for b in data_loader)
        if isinstance(model.module, Blip2Qformer):
            score_i2t, score_t2i = compute_sim_matrix(
                model.module, model.variables, image_batches,
                jnp.asarray(text_ids), jnp.asarray(text_mask),
                k_test=self.k_test)
        else:
            # legacy-zoo models: BLIP-1 / ALBEF / ALPRO (ITC + optional
            # ITM rerank) and CLIP / EVA-CLIP (pure ITC)
            score_i2t, score_t2i = zoo_sim_matrix(
                model.module, model.variables, image_batches,
                jnp.asarray(text_ids), jnp.asarray(text_mask),
                k_test=self.k_test,
                enc_token_id=getattr(self.tokenizer, "enc_token_id", None))
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
