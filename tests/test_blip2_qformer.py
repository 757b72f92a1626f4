"""Stage-1 Blip2 Q-Former: ITC/ITM/LM losses, sim matrix, retrieval task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.compression.pruners.base import FlaxModel
from vlm_compression_tpu.datasets.tokenization import SimpleTokenizer
from vlm_compression_tpu.models.blip2_qformer import (
    Blip2Qformer,
    Blip2QformerConfig,
    compute_sim_matrix,
)
from vlm_compression_tpu.tasks.retrieval import RetrievalTask

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny():
    cfg = Blip2QformerConfig.tiny()
    model = Blip2Qformer(cfg)
    b = 4
    batch = dict(
        image=jnp.asarray(np.random.RandomState(0).rand(b, 28, 28, 3),
                          jnp.float32),
        text_ids=jnp.asarray(
            np.random.RandomState(1).randint(4, 60, (b, 6)), jnp.int32),
        text_mask=jnp.ones((b, 6), jnp.int32),
    )
    variables = dict(model.init(jax.random.key(0), **batch))
    return model, variables, batch


def test_stage1_losses(tiny):
    model, variables, batch = tiny
    out = model.apply(variables, **batch)
    for k in ("loss", "loss_itc", "loss_itm", "loss_lm"):
        assert np.isfinite(float(out[k])), k
    assert float(out["loss"]) == pytest.approx(
        float(out["loss_itc"] + out["loss_itm"] + out["loss_lm"]), rel=1e-5)


def test_stage1_trainable(tiny):
    """One grad step on all params decreases the objective."""
    import optax

    model, variables, batch = tiny
    tx = optax.adam(1e-3)
    params = variables["params"]
    frozen = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        return model.apply({"params": p, **frozen}, **batch)["loss"]

    state = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(5):
        g = jax.grad(loss_fn)(params)
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0


def test_lm_causality(tiny):
    """Changing a later text token must not affect earlier LM hidden."""
    model, variables, batch = tiny
    embeds = model.apply(variables, batch["image"],
                         method=Blip2Qformer.image_embeds)

    def lm_hidden(ids):
        return model.apply(
            variables, embeds, ids, batch["text_mask"], True, "masked",
            method=lambda m, e, i, msk, c, mode: m.qformer.forward_multimodal(
                e, i, msk, causal_text=c, mode=mode))

    h1 = lm_hidden(batch["text_ids"])
    ids2 = batch["text_ids"].at[:, -1].set(7)
    h2 = lm_hidden(ids2)
    nq = model.cfg.qformer.num_query_tokens
    np.testing.assert_allclose(
        np.asarray(h1[:, nq: -1], np.float32),
        np.asarray(h2[:, nq: -1], np.float32), rtol=1e-3, atol=1e-4)


def test_sim_matrix_and_rerank(tiny):
    model, variables, batch = tiny
    imgs = [batch["image"][:2], batch["image"][2:]]
    i2t, t2i = compute_sim_matrix(model, variables, imgs,
                                  batch["text_ids"], batch["text_mask"])
    assert i2t.shape == (4, 4) and t2i.shape == (4, 4)
    np.testing.assert_allclose(i2t, t2i.T, rtol=1e-5)

    i2t_r, t2i_r = compute_sim_matrix(
        model, variables, imgs, batch["text_ids"], batch["text_mask"],
        k_test=2)
    assert not np.allclose(i2t_r, i2t)  # rerank changed top-k scores


def test_retrieval_task_end_to_end(tiny, tmp_path):
    model, variables, batch = tiny

    class DS:
        text = [f"caption {i}" for i in range(4)]
        txt2img = [0, 1, 2, 3]
        img2txt = {i: [i] for i in range(4)}

    class Loader:
        dataset = DS()

        def __iter__(self):
            yield {"image": np.asarray(batch["image"][:2])}
            yield {"image": np.asarray(batch["image"][2:])}

    task = RetrievalTask(k_test=0, tokenizer=SimpleTokenizer(vocab_size=64))
    res = task.evaluation(FlaxModel(model, variables), Loader())
    rd = tmp_path / "result"
    rd.mkdir()
    metrics = task.after_evaluation(res, result_dir=str(rd))
    assert "txt_r1" in metrics and "agg_metrics" in metrics


def test_extract_features_modes(tiny):
    """blip2_feature_extractor API (reference blip2_qformer.py:371-470)."""
    model, variables, batch = tiny
    nq = model.cfg.qformer.num_query_tokens
    e = model.cfg.embed_dim

    fi = model.apply(variables, {"image": batch["image"]}, "image",
                     method=Blip2Qformer.extract_features)
    assert fi["image_embeds"].shape[:2] == (4, nq)
    assert fi["image_embeds_proj"].shape == (4, nq, e)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(fi["image_embeds_proj"]), axis=-1),
        1.0, atol=1e-5)
    assert fi["text_embeds"] is None and fi["multimodal_embeds"] is None

    ft = model.apply(variables, {"text_ids": batch["text_ids"],
                                 "text_mask": batch["text_mask"]}, "text",
                     method=Blip2Qformer.extract_features)
    assert ft["text_embeds_proj"].shape == (4, e)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ft["text_embeds_proj"]), axis=-1),
        1.0, atol=1e-5)

    fm = model.apply(variables, {"image": batch["image"],
                                 "text_ids": batch["text_ids"],
                                 "text_mask": batch["text_mask"]},
                     "multimodal", method=Blip2Qformer.extract_features)
    assert fm["multimodal_embeds"].shape[:2] == (4, nq)
    assert fm["image_embeds"] is None
