"""Legacy-zoo config surface (VERDICT r2 task 7).

The reference ships 113 ``lavis/projects/*`` yamls; the 64 non-blip2
ones (albef/alpro/blip/clip/eva_clip/gpt/pnp-vqa) plus the zoo
model-default yamls and bert/med/clip json hyperparameter files are
mirrored name-for-name under ``configs/`` (scripts/gen_configs.py).
Tests here prove the tree RESOLVES — every arch, task, builder and
processor name in every yaml maps to a registered implementation, every
arch builds a tiny model — and drive one zoo model end-to-end through
the evaluate CLI from a project yaml.
"""

import glob
import json
import os

import numpy as np
import pytest
import yaml

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")
ZOO_FAMILIES = ("albef", "alpro", "blip", "clip", "eva_clip", "gpt",
                "pnp-vqa")

pytestmark = pytest.mark.slow  # model init compiles


def _zoo_project_files():
    out = []
    for fam in ZOO_FAMILIES:
        out += sorted(glob.glob(os.path.join(CONFIGS, "projects", fam,
                                             "**", "*.yaml"),
                                recursive=True))
    return out


def test_zoo_project_tree_complete():
    files = _zoo_project_files()
    assert len(files) == 64, len(files)  # the reference's non-blip2 count


def test_zoo_projects_resolve():
    """Every arch/task/builder/processor name in every zoo project yaml
    resolves in the registries; every arch composes a tiny config."""
    from vlm_compression_tpu.common.registry import registry
    from vlm_compression_tpu.models import _ensure_zoo_imported
    from vlm_compression_tpu.models.factory import build_model_config
    from vlm_compression_tpu.models.model_zoo import default_config_path
    import vlm_compression_tpu.datasets.builders  # noqa: F401
    import vlm_compression_tpu.datasets.processors  # noqa: F401
    import vlm_compression_tpu.tasks  # noqa: F401

    _ensure_zoo_imported()
    problems = []
    archs_seen = set()
    for f in _zoo_project_files():
        tree = yaml.safe_load(open(f)) or {}
        rel = os.path.relpath(f, CONFIGS)
        model = tree.get("model") or {}
        arch = model.get("arch")
        if registry.get_model_class(arch) is None:
            problems.append((rel, "arch", arch))
        else:
            archs_seen.add((arch, model.get("model_type")))
        task = (tree.get("run") or {}).get("task")
        if registry.get_task_class(task) is None:
            problems.append((rel, "task", task))
        for ds, node in (tree.get("datasets") or {}).items():
            if registry.get_builder_class(ds) is None:
                problems.append((rel, "builder", ds))
            for kind in ("vis_processor", "text_processor"):
                for split_cfg in ((node or {}).get(kind) or {}).values():
                    name = (split_cfg or {}).get("name")
                    if name and registry.get_processor_class(name) is None:
                        problems.append((rel, "processor", name))
    assert not problems, problems

    # every (arch, model_type) composes a tiny config and has a default
    # model yaml resolvable via the PRETRAINED_MODEL_CONFIG_DICT mirror
    for arch, mtype in sorted(archs_seen, key=str):
        _, cfg = build_model_config({"arch": arch, "model_type": mtype,
                                     "tiny": True})
        assert cfg is not None, arch
        assert default_config_path(arch, mtype) or \
            default_config_path(arch), (arch, mtype)


def test_zoo_model_defaults_parse_and_map():
    """All zoo model-default yamls parse; MODEL_CONFIG_PATHS targets all
    exist; the bert/med json hyperparameter files are valid json."""
    from vlm_compression_tpu.models.model_zoo import (
        MODEL_CONFIG_PATHS, _CONFIGS_ROOT)

    for arch, types in MODEL_CONFIG_PATHS.items():
        for mtype, rel in types.items():
            path = os.path.join(_CONFIGS_ROOT, rel)
            assert os.path.exists(path), (arch, mtype, rel)
            tree = yaml.safe_load(open(path))
            assert (tree.get("model") or {}).get("arch"), rel
    for j in glob.glob(os.path.join(CONFIGS, "models", "**", "*.json"),
                       recursive=True):
        json.load(open(j))


def test_default_config_merges_under_user_yaml(tmp_path):
    """Config(defaults=default_config_path) merges the model defaults
    UNDER the project yaml (reference config.py:57-99)."""
    from vlm_compression_tpu.common.config import Config
    from vlm_compression_tpu.models.model_zoo import default_config_path

    p = tmp_path / "cfg.yaml"
    yaml.safe_dump({"model": {"arch": "albef_retrieval",
                              "model_type": "coco",
                              "queue_size": 1},
                    "run": {"task": "retrieval"}}, open(p, "w"))
    cfg = Config(cfg_path=str(p), defaults=default_config_path)
    m = cfg.model_cfg
    assert m.get("queue_size") == 1          # user override wins
    assert m.get("vit_type") == "base"       # default merged under
    assert m.get("image_size") == 384


def test_evaluate_cli_drives_zoo_model_from_yaml(tmp_path):
    """End-to-end: the evaluate CLI runs a legacy-zoo model
    (blip_retrieval) from a project-schema yaml — build model from
    config, build dataset, ITC+ITM sim matrix, R@k metrics into
    evaluate.txt."""
    from PIL import Image

    from vlm_compression_tpu.cli.evaluate import main

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    anns = []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            img_dir / f"i{i}.jpg")
        anns.append({"image": f"i{i}.jpg",
                     "caption": [f"a photo number {i}",
                                 f"picture {i} of something"]})
    ann = tmp_path / "ret.json"
    json.dump(anns, ann.open("w"))

    cfg = {
        "model": {"arch": "blip_retrieval", "model_type": "coco",
                  "tiny": True},
        "datasets": {"coco_retrieval": {
            "build_info": {
                "annotations": {"test": [str(ann)]},
                "images": {"storage": str(img_dir)},
            },
            "vis_processor": {
                "eval": {"name": "blip_image_eval", "image_size": 28}},
            "text_processor": {"eval": {"name": "blip_caption"}},
        }},
        "run": {"task": "retrieval", "k_test": 2,
                "batch_size_eval": 2, "test_splits": ["test"],
                "output_dir": str(tmp_path / "out")},
    }
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, cfg_path.open("w"))

    stats = main(["--cfg-path", str(cfg_path), "--job_id", "zoo1",
                  "--tiny"])
    res = stats["eval_results"]["test"]
    for k in ("txt_r1", "img_r1", "agg_metrics"):
        assert k in res, res
    evaluate_txt = tmp_path / "out" / "evaluate.txt"
    assert evaluate_txt.exists()
