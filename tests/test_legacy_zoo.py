"""Legacy LAVIS model zoo (SURVEY §2.3 last row): registry surface +
tiny-config forward smoke for every family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.models import _ensure_zoo_imported, load_model
from vlm_compression_tpu.common.registry import registry

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow


LEGACY_NAMES = [
    "albef_classification", "albef_feature_extractor", "albef_nlvr",
    "albef_pretrain", "albef_retrieval", "albef_vqa",
    "alpro_qa", "alpro_retrieval",
    "blip_caption", "blip_classification", "blip_feature_extractor",
    "blip_image_text_matching", "blip_nlvr", "blip_pretrain",
    "blip_retrieval", "blip_vqa",
    "clip", "clip_feature_extractor", "eva_clip",
    "eva_clip_feature_extractor", "gpt_dialogue", "img2prompt_vqa",
    "pnp_unifiedqav2_fid", "pnp_vqa", "t5",
    "blip2_image_text_matching",
]


def test_registry_covers_reference_names():
    _ensure_zoo_imported()
    missing = [n for n in LEGACY_NAMES if registry.get_model_class(n) is None]
    assert not missing, f"unregistered archs: {missing}"


def _loss_models():
    return [
        "blip_caption", "blip_vqa", "blip_retrieval", "blip_pretrain",
        "blip_nlvr", "blip_classification",
        "albef_retrieval", "albef_vqa", "albef_nlvr",
        "albef_classification", "albef_pretrain",
        "alpro_retrieval", "alpro_qa", "clip", "gpt_dialogue", "t5",
        "pnp_unifiedqav2_fid", "pnp_vqa",
    ]


@pytest.mark.parametrize("arch", _loss_models())
def test_tiny_forward_loss(arch):
    from vlm_compression_tpu.models.factory import example_batch

    module, variables = load_model(arch, tiny=True, seed=0)
    batch = example_batch(arch, module.cfg, batch=2)
    # replace zeros images with noise so contrastive losses are non-degenerate
    rng = np.random.RandomState(0)
    batch = {k: (jnp.asarray(rng.standard_normal(v.shape), jnp.float32)
                 if v.dtype == jnp.float32 else v)
             for k, v in batch.items()}
    out = module.apply(variables, **batch)
    assert "loss" in out, f"{arch} returned no loss"
    assert np.isfinite(float(out["loss"])), f"{arch} loss not finite"


@pytest.mark.parametrize("arch,feat_key", [
    ("blip_feature_extractor", "multimodal_embeds"),
    ("albef_feature_extractor", "multimodal_embeds"),
])
def test_feature_extractors(arch, feat_key):
    from vlm_compression_tpu.models.factory import example_batch

    module, variables = load_model(arch, tiny=True, seed=0)
    batch = example_batch(arch, module.cfg, batch=2)
    batch.pop("extract_mode", None)
    out = module.apply(variables, **batch)
    assert feat_key in out
    img = module.apply(variables, image=batch["image"],
                       extract_mode="image")
    assert "image_features" in img
    nrm = np.linalg.norm(np.asarray(img["image_features"]), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, rtol=1e-4)


def test_clip_contrastive_features_unit_norm():
    from vlm_compression_tpu.models.factory import example_batch

    module, variables = load_model("clip", tiny=True, seed=0)
    batch = example_batch("clip", module.cfg, batch=3)
    out = module.apply(variables, **batch)
    fi = np.asarray(out["image_features"])
    np.testing.assert_allclose(np.linalg.norm(fi, axis=-1), 1.0, rtol=1e-4)
    assert out["logits"].shape == (3, 3)


def test_eva_clip_uses_eva_tower():
    module, variables = load_model("eva_clip", tiny=True, seed=0)
    assert "visual" in variables["params"]
    # EVA blocks carry fused qkv with q/v biases — distinct from plain ViT
    blk = variables["params"]["visual"]["blocks_0"]
    assert "attn" in blk or "qkv" in str(blk.keys())


def test_blip_itm_heads():
    from vlm_compression_tpu.models.factory import example_batch

    module, variables = load_model("blip_image_text_matching", tiny=True,
                                   seed=0)
    batch = example_batch("blip_image_text_matching", module.cfg, batch=2)
    batch.pop("match_head", None)
    itm = module.apply(variables, **batch, match_head="itm")
    assert itm.shape == (2, 2)
    itc = module.apply(variables, **batch, match_head="itc")
    assert itc.shape == (2,)


def test_blip2_itm_heads():
    from vlm_compression_tpu.models.factory import example_batch

    module, variables = load_model("blip2_image_text_matching", tiny=True,
                                   seed=0)
    batch = example_batch("blip2_image_text_matching", module.cfg, batch=2)
    batch.pop("match_head", None)
    itm = module.apply(variables, **batch, match_head="itm")
    assert itm.shape == (2, 2)
    itc = module.apply(variables, **batch, match_head="itc")
    assert itc.shape == (2,)


def test_blip_vqa_rank_answers():
    from vlm_compression_tpu.models.blip1 import BlipVQA
    from vlm_compression_tpu.models.factory import example_batch

    module, variables = load_model("blip_vqa", tiny=True, seed=0)
    batch = example_batch("blip_vqa", module.cfg, batch=2)
    cand = jnp.asarray([[2, 5, 1], [2, 7, 1]], jnp.int32)
    cmask = jnp.ones_like(cand)
    scores = module.apply(variables, batch["image"], batch["input_ids"],
                          batch["attention_mask"], cand, cmask,
                          method=BlipVQA.rank_answers)
    assert scores.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_timesformer_output_shape():
    from vlm_compression_tpu.models.alpro import (
        TimeSformer,
        TimeSformerConfig,
    )

    cfg = TimeSformerConfig.tiny()
    m = TimeSformer(cfg)
    video = jnp.zeros((2, cfg.num_frames, cfg.img_size, cfg.img_size, 3))
    variables = m.init(jax.random.key(0), video)
    out = m.apply(variables, video)
    patches = (cfg.img_size // cfg.patch_size) ** 2
    assert out.shape == (2, 1 + cfg.num_frames * patches, cfg.embed_dim)


def test_gpt_dialogue_video_regression_loss():
    from vlm_compression_tpu.models.factory import example_batch

    module, variables = load_model("gpt_dialogue", tiny=True, seed=0)
    batch = example_batch("gpt_dialogue", module.cfg, batch=2)
    out = module.apply(variables, **batch)
    assert "video_loss" in out
    assert np.isfinite(float(out["loss"]))


def test_img2prompt_build_prompt():
    from vlm_compression_tpu.models.pnp_vqa import Img2PromptVQA

    p = Img2PromptVQA.build_prompt(
        ["a cat on a mat", "a sleeping cat"], "what animal is this?",
        exemplars=[("what color?", "black")])
    assert "Contexts: a cat on a mat" in p
    assert p.endswith("Answer:")


def test_legacy_models_are_prunable():
    """Every zoo model exposes SparseLinear kernels: the wanda mask kernel
    applies directly to a blip_caption layer."""
    from vlm_compression_tpu.ops.masks import unstructured_mask, wanda_metric

    module, variables = load_model("blip_caption", tiny=True, seed=0)
    k = variables["params"]["text_encoder"]["layers_0"]["attention"][
        "query"]["kernel"]
    met = wanda_metric(jnp.asarray(k).T, jnp.ones((k.shape[0],)))
    keep = unstructured_mask(met, 0.5)
    assert abs(float(keep.mean()) - 0.5) < 0.1
