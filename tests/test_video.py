"""Video (5-dim) path: per-frame encode + query-output concat in the
instruct models, frame-stack item datasets (VERDICT round-1 item 6;
reference blip2_t5_instruct.py:347-377)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vlm_compression_tpu.datasets.items import (
    VideoDialogueDataset,
    VideoQADataset,
)
from vlm_compression_tpu.datasets.processors import load_processor

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_t5():
    from vlm_compression_tpu.models.blip2_t5_instruct import (
        Blip2T5Instruct,
        Blip2T5InstructConfig,
    )

    cfg = Blip2T5InstructConfig.tiny()
    model = Blip2T5Instruct(cfg)
    b = 2
    batch = dict(
        image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
        input_ids=jnp.ones((b, 6), jnp.int32),
        attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=jnp.ones((b, 5), jnp.int32),
        qformer_input_ids=jnp.ones((b, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 6), jnp.int32),
    )
    variables = dict(model.init(jax.random.key(0), **batch))
    return model, variables, batch


def test_video_forward_t5(tiny_t5):
    model, variables, batch = tiny_t5
    vid_batch = dict(batch)
    # (b, t, h, w, c) with t=3 frames
    vid_batch["image"] = jnp.ones((2, 3, 28, 28, 3), jnp.float32) * 0.1
    out = model.apply(variables, **vid_batch)
    assert np.isfinite(float(out["loss"]))


def test_video_prefix_length_is_frames_times_queries(tiny_t5):
    model, variables, _ = tiny_t5
    nq = model.cfg.qformer.num_query_tokens
    for t in (1, 3):
        vid = jnp.ones((2, t, 28, 28, 3), jnp.float32)
        prefix = model.apply(
            variables, vid, "masked",
            jnp.ones((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32),
            method=type(model).encode_image)
        assert prefix.shape[:2] == (2, t * nq)


def test_video_frames_match_per_frame_encoding(tiny_t5):
    """The folded batch encode must equal encoding each frame alone."""
    model, variables, _ = tiny_t5
    rng = np.random.RandomState(0)
    vid = jnp.asarray(rng.standard_normal((1, 2, 28, 28, 3)), jnp.float32)
    q_ids = jnp.ones((1, 4), jnp.int32)
    q_mask = jnp.ones((1, 4), jnp.int32)
    full = model.apply(variables, vid, "masked", q_ids, q_mask,
                       method=type(model).encode_image)
    per = [model.apply(variables, vid[:, i], "masked", q_ids, q_mask,
                       method=type(model).encode_image) for i in range(2)]
    np.testing.assert_allclose(np.asarray(full, np.float32),
                               np.asarray(jnp.concatenate(per, axis=1),
                                          np.float32), rtol=2e-2, atol=1e-3)


def test_video_generate_t5(tiny_t5):
    from vlm_compression_tpu.models.blip2_t5_instruct import generate_t5
    from vlm_compression_tpu.models.generation import GenerationConfig

    model, variables, _ = tiny_t5
    vid = jnp.ones((2, 3, 28, 28, 3), jnp.float32)
    ids = jnp.ones((2, 5), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    seqs = generate_t5(model, variables, vid, ids, mask, ids, mask,
                       gen_cfg=GenerationConfig(num_beams=2, max_length=5))
    assert seqs.shape == (2, 5)


def test_video_forward_vicuna():
    from vlm_compression_tpu.models.blip2_vicuna_instruct import (
        Blip2VicunaInstruct,
        Blip2VicunaInstructConfig,
    )

    cfg = Blip2VicunaInstructConfig.tiny()
    model = Blip2VicunaInstruct(cfg)
    b = 2
    batch = dict(
        image=jnp.ones((b, 2, 28, 28, 3), jnp.float32) * 0.1,
        text_input_ids=jnp.ones((b, 6), jnp.int32),
        text_attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=jnp.ones((b, 6), jnp.int32),
        qformer_input_ids=jnp.ones((b, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 6), jnp.int32),
    )
    variables = dict(model.init(jax.random.key(0), **batch))
    out = model.apply(variables, **batch)
    assert np.isfinite(float(out["loss"]))


# ---------------------------------------------------------------------------
# frame-stack datasets
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("video_data")
    rng = np.random.RandomState(0)
    # clip as frame directory
    clip = root / "clip0"
    clip.mkdir()
    for j in range(6):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            clip / f"frame_{j:03d}.jpg")
    # clip as npy stack
    np.save(root / "clip1.npy",
            rng.randint(0, 255, (5, 32, 32, 3)).astype(np.uint8))
    qa = [{"video": "clip0", "question": "what is moving?",
           "answer": ["car"], "question_id": 1},
          {"video": "clip1.npy", "question": "who is there?",
           "answer": ["person"], "question_id": 2}]
    with open(root / "qa.json", "w") as f:
        json.dump(qa, f)
    dial = [{"video": "clip0",
             "dialog": [{"question": "hi", "answer": "hello"}],
             "answer": "a person waves"}]
    with open(root / "dial.json", "w") as f:
        json.dump(dial, f)
    return root


def test_video_qa_dataset_frame_stack(video_root):
    proc = load_processor("blip_image_eval", {"image_size": 16})
    ds = VideoQADataset(proc, lambda s: s, str(video_root),
                        str(video_root / "qa.json"))
    s0, s1 = ds[0], ds[1]
    assert s0["image"].shape == (4, 16, 16, 3)   # dir-of-frames, t=4
    assert s1["image"].shape == (4, 16, 16, 3)   # npy stack subsampled
    batch = ds.collater([s0, s1])
    assert batch["image"].shape == (2, 4, 16, 16, 3)
    assert batch["question_id"] == [1, 2]


def test_video_dialogue_dataset(video_root):
    proc = load_processor("blip_image_eval", {"image_size": 16})
    ds = VideoDialogueDataset(proc, lambda s: s, str(video_root),
                              str(video_root / "dial.json"))
    s = ds[0]
    assert s["image"].shape == (4, 16, 16, 3)
    assert "hi" in s["text_input"] and "hello" in s["text_input"]
    assert s["text_output"] == "a person waves"


def test_video_builders_registered():
    from vlm_compression_tpu.common.registry import registry
    from vlm_compression_tpu.datasets import builders  # noqa: F401

    for name in ("msrvtt_qa", "msvd_qa", "msrvtt_caption",
                 "avsd_dialogue"):
        assert registry.get_builder_class(name) is not None, name
