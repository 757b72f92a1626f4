"""Registry parity: every name the reference registers must resolve here.

The list below is the frozen set of ACTIVE (uncommented) registrations in
the reference snapshot, extracted from ``@registry.register_*("<name>")``
decorators across ``lavis/`` (109 decorator sites → 108 unique names;
``prefix_laion2B_multi`` exists only as commented-out code and is not
counted).  When ``/root/reference`` is present the list is re-derived
live and cross-checked so drift in either direction fails loudly.

Exclusions (documented, intentional):
  - model ``blip2_vicuna_xinstruct``: registered in its own file but the
    reference comments the import out of ``lavis/models/__init__.py``, so
    the name never actually resolves at runtime upstream either.
"""

import os
import re

import pytest

REFERENCE_ROOT = "/root/reference/lavis"

EXCLUDED = {("model", "blip2_vicuna_xinstruct")}

REFERENCE_NAMES = [
    ("builder", "aok_vqa"), ("builder", "avsd_dialogue"), ("builder", "c4"),
    ("builder", "cifar100"), ("builder", "coco_caption"),
    ("builder", "coco_retrieval"), ("builder", "coco_vqa"),
    ("builder", "conceptual_caption_12m"),
    ("builder", "conceptual_caption_3m"), ("builder", "didemo_retrieval"),
    ("builder", "flickr30k"), ("builder", "gqa"), ("builder", "imagenet"),
    ("builder", "instruct_cc3m_caption"), ("builder", "instruct_coco_caption"),
    ("builder", "instruct_vg_caption"), ("builder", "laion2B_multi"),
    ("builder", "msrvtt_caption"), ("builder", "msrvtt_qa"),
    ("builder", "msrvtt_retrieval"), ("builder", "msvd_caption"),
    ("builder", "msvd_qa"), ("builder", "nlvr"), ("builder", "nocaps"),
    ("builder", "ok_vqa"), ("builder", "prefix_coco_caption"),
    ("builder", "prefix_conceptual_caption_12m"),
    ("builder", "prefix_conceptual_caption_3m"),
    ("builder", "prefix_sbu_caption"), ("builder", "prefix_vg_caption"),
    ("builder", "sbu_caption"), ("builder", "snli_ve"),
    ("builder", "vatex_caption"), ("builder", "vg_caption"),
    ("builder", "vg_vqa"),
    ("lr_scheduler", "linear_warmup_cosine_lr"),
    ("lr_scheduler", "linear_warmup_step_lr"),
    ("model", "albef_classification"), ("model", "albef_feature_extractor"),
    ("model", "albef_nlvr"), ("model", "albef_pretrain"),
    ("model", "albef_retrieval"), ("model", "albef_vqa"),
    ("model", "alpro_qa"), ("model", "alpro_retrieval"),
    ("model", "blip2"), ("model", "blip2_feature_extractor"),
    ("model", "blip2_image_text_matching"), ("model", "blip2_opt"),
    ("model", "blip2_t5"), ("model", "blip2_t5_instruct"),
    ("model", "blip2_vicuna_instruct"), ("model", "blip2_vicuna_xinstruct"),
    ("model", "blip_caption"), ("model", "blip_classification"),
    ("model", "blip_feature_extractor"),
    ("model", "blip_image_text_matching"), ("model", "blip_nlvr"),
    ("model", "blip_pretrain"), ("model", "blip_retrieval"),
    ("model", "blip_vqa"), ("model", "clip"),
    ("model", "clip_feature_extractor"), ("model", "eva_clip"),
    ("model", "eva_clip_feature_extractor"), ("model", "gpt_dialogue"),
    ("model", "img2prompt_vqa"), ("model", "pnp_unifiedqav2_fid"),
    ("model", "pnp_vqa"), ("model", "t5"),
    ("processor", "alpro_video_eval"), ("processor", "alpro_video_train"),
    ("processor", "blip2_image_train"), ("processor", "blip_caption"),
    ("processor", "blip_image_eval"), ("processor", "blip_image_train"),
    ("processor", "blip_question"), ("processor", "clip_image_eval"),
    ("processor", "clip_image_train"), ("processor", "gpt_dialogue"),
    ("processor", "gpt_video_ft"),
    ("pruner", "blipt5_aobd_pruner"), ("pruner", "blipt5_dsnot_pruner"),
    ("pruner", "blipt5_mag_pruner"), ("pruner", "blipt5_mezo_pruner"),
    ("pruner", "blipt5_rand_pruner"), ("pruner", "blipt5_sparsegpt_pruner"),
    ("pruner", "blipt5_wanda_pruner"), ("pruner", "t5_dsnot_pruner"),
    ("pruner", "t5_sparsegpt_pruner"), ("pruner", "t5_wanda_pruner"),
    ("pruner", "vit_dsnot_pruner"), ("pruner", "vit_sparsegpt_pruner"),
    ("pruner", "vit_wanda_pruner"),
    ("runner", "runner_base"), ("runner", "runner_iter"),
    ("task", "aok_vqa"), ("task", "captioning"), ("task", "dialogue"),
    ("task", "gqa"), ("task", "gqa_reading_comprehension"),
    ("task", "image_text_pretrain"), ("task", "image_text_retrain"),
    ("task", "language_modeling"), ("task", "multimodal_classification"),
    ("task", "retrieval"), ("task", "vqa"),
    ("task", "vqa_reading_comprehension"),
]


@pytest.fixture(scope="module")
def full_registry():
    import vlm_compression_tpu.common.optims  # noqa: F401
    import vlm_compression_tpu.compression  # noqa: F401
    import vlm_compression_tpu.datasets.builders  # noqa: F401
    import vlm_compression_tpu.datasets.processors  # noqa: F401
    import vlm_compression_tpu.models as M
    import vlm_compression_tpu.runners  # noqa: F401
    import vlm_compression_tpu.runners.runner_iter  # noqa: F401
    import vlm_compression_tpu.tasks  # noqa: F401

    M._ensure_zoo_imported()
    from vlm_compression_tpu.common.registry import registry

    return registry


def test_every_reference_name_resolves(full_registry):
    missing = [(cat, name) for cat, name in REFERENCE_NAMES
               if (cat, name) not in EXCLUDED
               and name not in full_registry._maps[cat]]
    assert not missing, f"reference registry names absent here: {missing}"


def test_exclusions_are_still_absent(full_registry):
    """If an excluded name lands later, remove it from EXCLUDED."""
    for cat, name in EXCLUDED:
        assert name not in full_registry._maps[cat]


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference snapshot not available")
def test_frozen_list_matches_reference_source():
    pat = re.compile(
        r'^\s*@registry\.register_'
        r'(model|task|builder|processor|pruner|lr_scheduler|runner)'
        r'\("([^"]+)"\)')
    live = set()
    for dirpath, _dirs, files in os.walk(REFERENCE_ROOT):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            with open(os.path.join(dirpath, fn), errors="replace") as f:
                for line in f:
                    m = pat.match(line)
                    if m:
                        live.add((m.group(1), m.group(2)))
    assert live == set(REFERENCE_NAMES)
