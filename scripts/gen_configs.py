"""Generate the project-config matrix (configs/projects/{eval,train},
configs/models) mirroring the reference's lavis/projects/blip2 tree.

Reference files: 37 eval + 13 train yamls (SURVEY.md §2.8) over the model
grid {flant5xl, flant5xl_instruct, flant5xxl_instruct, opt2.7b, opt6.7b,
vicuna7b_instruct} × the task grid {vqav2, okvqa, gqa, nocaps,
caption_coco, ret_coco, ret_flickr} + prune/continue-stage2 +
derivative-compute configs.  Run fields carry the reference's inference
settings (beams, lengths, prompts — e.g. vqav2 yaml: num_beams 5,
max_len 10, prompt "Question: {} Short answer:").

Rerun after schema changes:  python scripts/gen_configs.py
"""

import os

import yaml

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

MODELS = {
    "flant5xl": {"arch": "blip2_t5", "model_type": "flant5xl"},
    "flant5xl_instruct": {"arch": "blip2_t5_instruct",
                          "model_type": "flant5xl"},
    "flant5xxl_instruct": {"arch": "blip2_t5_instruct",
                           "model_type": "flant5xxl"},
    "opt2.7b": {"arch": "blip2_opt", "model_type": "pretrain_opt2.7b"},
    "opt6.7b": {"arch": "blip2_opt", "model_type": "pretrain_opt6.7b"},
    "vicuna_instruct": {"arch": "blip2_vicuna_instruct",
                        "model_type": "vicuna7b"},
    "vicuna13b_instruct": {"arch": "blip2_vicuna_instruct",
                           "model_type": "vicuna13b"},
}

VIS_EVAL = {"eval": {"name": "blip_image_eval", "image_size": 224}}
VIS_TRAIN = {"train": {"name": "blip2_image_train", "image_size": 224},
             "eval": {"name": "blip_image_eval", "image_size": 224}}


def _write(rel, tree):
    path = os.path.join(ROOT, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(tree, f, sort_keys=False)
    return path


def eval_cfg(model_key, dataset, task, run_extra, text_proc="blip_caption",
             splits=("val",)):
    return {
        "model": dict(MODELS[model_key]),
        "datasets": {dataset: {
            "vis_processor": VIS_EVAL,
            "text_processor": {"eval": {"name": text_proc}},
        }},
        "run": {
            "task": task,
            "batch_size_eval": 64,
            "num_workers": 4,
            "seed": 42,
            "evaluate": True,
            "test_splits": list(splits),
            "output_dir": f"output/eval/{dataset}_{model_key}",
            **run_extra,
        },
    }


VQA_RUN = {"num_beams": 5, "max_len": 10, "min_len": 1,
           "inference_method": "generate",
           "prompt": "Question: {} Short answer:"}
CAP_RUN = {"num_beams": 5, "max_len": 30, "min_len": 8}

EVAL_GRID = [
    # (file stem, dataset, task, run extras, text processor, splits)
    ("vqav2_zeroshot", "coco_vqa", "vqa", VQA_RUN, "blip_question", ("val",)),
    ("okvqa_zeroshot", "ok_vqa", "vqa", VQA_RUN, "blip_question", ("test",)),
    ("gqa_zeroshot", "gqa", "gqa", VQA_RUN, "blip_question", ("val",)),
    ("nocaps", "nocaps", "captioning", CAP_RUN, "blip_caption", ("val",)),
    ("caption_coco", "coco_caption", "captioning", CAP_RUN, "blip_caption",
     ("test",)),
]


def main():
    written = []
    for stem, dataset, task, run, tp, splits in EVAL_GRID:
        for mk in ("flant5xl", "flant5xl_instruct", "opt2.7b", "opt6.7b",
                   "vicuna_instruct"):
            tree = eval_cfg(mk, dataset, task, run, tp, splits)
            if stem == "okvqa_zeroshot":
                # reference okvqa eval yamls: model.apply_lemmatizer True
                tree["model"]["apply_lemmatizer"] = True
            written.append(_write(
                f"projects/eval/{stem}_{mk}_eval.yaml", tree))

    # retrieval (stage-1 blip2 model computes the sim matrix)
    for name, dataset in (("ret_coco", "coco_retrieval"),
                          ("ret_flickr", "flickr30k")):
        for mk, arch in (("", "blip2"), ("_instruct", "blip2_t5_instruct")):
            tree = eval_cfg("flant5xl", dataset, "retrieval",
                            {"k_test": 128}, "blip_caption", ("test",))
            tree["model"] = ({"arch": "blip2", "model_type": "coco"}
                             if arch == "blip2" else
                             dict(MODELS["flant5xl_instruct"]))
            written.append(_write(
                f"projects/eval/{name}{mk}_eval.yaml", tree))

    # prune_stage2 (calibration-data config: the prefix-LM corpus at eval
    # batch sizes — reference prune_stage2*.yaml, task image_text_pretrain)
    for mk, suffix in (("flant5xl", ""), ("opt2.7b", "_opt2.7b"),
                       ("opt6.7b", "_opt6.7b"),
                       ("flant5xl_instruct", "_t5_instruct"),
                       ("vicuna_instruct", "_vicuna_instruct")):
        tree = {
            "model": dict(MODELS[mk]),
            "datasets": {"prefix_conceptual_caption_3m": {
                "vis_processor": VIS_TRAIN,
                "text_processor": {"train": {"name": "blip_caption"},
                                   "eval": {"name": "blip_caption"}},
            }},
            "run": {"task": "image_text_pretrain",
                    "batch_size_train": 32, "batch_size_eval": 160,
                    "num_workers": 4, "seed": 42,
                    "output_dir": f"output/prune_stage2{suffix}"},
        }
        written.append(_write(f"projects/eval/prune_stage2{suffix}.yaml",
                              tree))

    # derivative-compute configs (c4 / cc prefix — allocator first stage)
    for stem, dataset in (("c4_prefix_derivative_compute", "c4"),
                          ("cc_prefix_derivative_compute",
                           "prefix_conceptual_caption_3m"),
                          ("cc_prefix_derivative_compute_t5_instruct",
                           "instruct_cc3m_caption")):
        mk = ("flant5xl_instruct" if "t5_instruct" in stem else "flant5xl")
        tree = {
            "model": dict(MODELS[mk]),
            "datasets": {dataset: {
                "vis_processor": VIS_TRAIN,
                "text_processor": {"train": {"name": "blip_caption"}},
            }},
            "run": {"task": ("language_modeling" if dataset == "c4"
                             else "image_text_pretrain"),
                    "batch_size_train": 1, "batch_size_eval": 1,
                    "num_workers": 4, "seed": 42,
                    "output_dir": f"output/{stem}"},
        }
        written.append(_write(f"projects/eval/{stem}.yaml", tree))

    # train configs: continue_stage2 (RESSA retraining — the KD task) and
    # pretrain stage1/stage2 (reference train tree)
    RETRAIN_RUN = {
        "task": "image_text_retrain",
        "lr_sched": "linear_warmup_cosine_lr",
        "init_lr": 1.0e-4, "min_lr": 1.0e-5, "warmup_lr": 1.0e-6,
        "weight_decay": 0.05, "max_epoch": 1,
        "batch_size_train": 32, "batch_size_eval": 160,
        "num_workers": 4, "warmup_steps": 1000, "seed": 42,
        "amp": True,
    }
    for mk, suffix in (("flant5xl", ""), ("opt2.7b", "_opt2.7b"),
                       ("opt6.7b", "_opt6.7b"),
                       ("flant5xl_instruct", "_t5_instruct"),
                       ("vicuna_instruct", "_vicuna_instruct")):
        tree = {
            "model": dict(MODELS[mk]),
            "datasets": {"prefix_conceptual_caption_3m": {
                "vis_processor": VIS_TRAIN,
                "text_processor": {"train": {"name": "blip_caption"},
                                   "eval": {"name": "blip_caption"}},
            }},
            "run": dict(RETRAIN_RUN,
                        output_dir=f"output/continue_stage2{suffix}"),
        }
        written.append(_write(
            f"projects/train/continue_stage2{suffix}.yaml", tree))
    # cc3m-named variants (reference continue_stage2_cc3m*.yaml use the
    # instruct_cc3m_caption builder)
    for mk, suffix in (("flant5xl", "_cc3m"),
                       ("flant5xl_instruct", "_cc3m_t5_instruct")):
        tree = {
            "model": dict(MODELS[mk]),
            "datasets": {"instruct_cc3m_caption": {
                "vis_processor": VIS_TRAIN,
                "text_processor": {"train": {"name": "blip_caption"},
                                   "eval": {"name": "blip_caption"}},
            }},
            "run": dict(RETRAIN_RUN,
                        output_dir=f"output/continue_stage2{suffix}"),
        }
        written.append(_write(
            f"projects/train/continue_stage2{suffix}.yaml", tree))

    for stem, task, dataset in (
            ("pretrain_stage1", "image_text_pretrain", "coco_caption"),
            ("pretrain_stage1_cc3m", "image_text_pretrain",
             "instruct_cc3m_caption"),
            ("pretrain_stage2", "image_text_pretrain", "coco_caption"),
            ("pretrain_stage2_cc3m", "image_text_pretrain",
             "instruct_cc3m_caption"),
            ("caption_coco_ft", "captioning", "coco_caption"),
            ("continue_coco_ft", "captioning", "coco_caption")):
        arch = ("blip2" if stem.startswith("pretrain_stage1")
                else "blip2_t5")
        tree = {
            "model": ({"arch": arch, "model_type": "pretrain"}
                      if arch == "blip2"
                      else {"arch": "blip2_t5", "model_type": "flant5xl"}),
            "datasets": {dataset: {
                "vis_processor": VIS_TRAIN,
                "text_processor": {"train": {"name": "blip_caption"},
                                   "eval": {"name": "blip_caption"}},
            }},
            "run": {"task": task,
                    "lr_sched": "linear_warmup_cosine_lr",
                    "init_lr": 1.0e-4, "min_lr": 1.0e-5,
                    "warmup_lr": 1.0e-6, "weight_decay": 0.05,
                    "max_epoch": 10, "batch_size_train": 100,
                    "batch_size_eval": 64, "num_workers": 4,
                    "warmup_steps": 5000, "seed": 42, "amp": True,
                    "output_dir": f"output/{stem}"},
        }
        written.append(_write(f"projects/train/{stem}.yaml", tree))

    # model default yamls (reference lavis/configs/models/blip2/*.yaml)
    for fname, arch, mtype in (
            ("blip2_instruct_flant5xl", "blip2_t5_instruct", "flant5xl"),
            ("blip2_instruct_flant5xxl", "blip2_t5_instruct", "flant5xxl"),
            ("blip2_instruct_vicuna7b", "blip2_vicuna_instruct", "vicuna7b"),
            ("blip2_instruct_vicuna13b", "blip2_vicuna_instruct",
             "vicuna13b"),
            ("blip2_pretrain", "blip2", "pretrain"),
            ("blip2_pretrain_flant5xl", "blip2_t5", "flant5xl"),
            ("blip2_pretrain_flant5xxl", "blip2_t5", "flant5xxl"),
            ("blip2_pretrain_opt2.7b", "blip2_opt", "pretrain_opt2.7b"),
            ("blip2_pretrain_opt6.7b", "blip2_opt", "pretrain_opt6.7b"),
            ("blip2_caption_flant5xl", "blip2_t5", "caption_coco_flant5xl"),
            ("blip2_caption_opt2.7b", "blip2_opt", "caption_coco_opt2.7b"),
            ("blip2_caption_opt6.7b", "blip2_opt", "caption_coco_opt6.7b"),
            ("blip2_coco", "blip2", "coco"),
            ("blip2_pretrain_vitL", "blip2", "pretrain_vitL"),
            ("blip2_pretrain_flant5xl_vitL", "blip2_t5",
             "pretrain_flant5xl_vitL")):
        written.append(_write(
            f"models/{fname}.yaml",
            {"model": {"arch": arch, "model_type": mtype,
                       "load_finetuned": False}}))

    # dataset default yamls (reference lavis/configs/datasets/<name>/ —
    # 21 dirs): build_info skeletons a deployment fills with local paths
    DATASETS = {
        "coco": ["coco_caption", "coco_vqa", "coco_retrieval"],
        "nocaps": ["nocaps"], "okvqa": ["ok_vqa"], "aokvqa": ["aok_vqa"],
        "gqa": ["gqa"], "vg": ["vg_vqa", "vg_caption"],
        "flickr30k": ["flickr30k"],
        "conceptual_caption": ["conceptual_caption_3m",
                               "conceptual_caption_12m"],
        "prefix_conceptual_caption": ["prefix_conceptual_caption_3m",
                                      "prefix_conceptual_caption_12m",
                                      "instruct_cc3m_caption"],
        "sbu_caption": ["sbu_caption", "prefix_sbu_caption"],
        "c4": ["c4"], "imagenet": ["imagenet"], "cifar100": ["cifar100"],
        "nlvr": ["nlvr"], "snli_ve": ["snli_ve"],
        "msrvtt": ["msrvtt_caption", "msrvtt_qa", "msrvtt_retrieval"],
        "msvd": ["msvd_caption", "msvd_qa"], "vatex": ["vatex_caption"],
        "didemo": ["didemo_retrieval"], "avsd": ["avsd_dialogue"],
        "laion": [],
    }
    for d, builders in DATASETS.items():
        tree = {"datasets": {
            b: {"build_info": {
                "annotations": {
                    "train": [f"data/{d}/annotations/{b}_train.json"],
                    "val": [f"data/{d}/annotations/{b}_val.json"],
                },
                "images": {"storage": f"data/{d}/images"},
            }} for b in builders}}
        written.append(_write(f"datasets/{d}/defaults.yaml", tree))

    written += gen_zoo()
    print(f"wrote {len(written)} configs")


REF_LAVIS = "/root/reference/lavis"

# torch-runtime run keys that have no meaning here (the TPU runtime takes
# its device/process layout from JAX, common/dist.py)
_DROP_RUN_KEYS = ("device", "dist_url")


def gen_zoo():
    """Mirror the legacy-zoo config surface (VERDICT r2 task 7): the
    reference's non-blip2 ``lavis/projects/*`` train/eval yamls
    (albef/alpro/blip/clip/eva_clip/gpt/pnp-vqa — 64 files) and the zoo
    model-default yamls + bert/med/clip/pnp json hyperparameter files
    under ``lavis/configs/models/``.  These are run-config DATA mirrored
    name-for-name so the reference's config-first launch commands port
    verbatim; trees are re-serialized through our conventions with
    torch-only run keys dropped and intra-config paths rebased.

    Extraction needs the reference snapshot on disk; committed outputs
    keep working without it."""
    import glob
    import json

    if not os.path.isdir(REF_LAVIS):
        print("reference tree absent; zoo configs left as committed")
        return []
    written = []
    proj_root = os.path.join(REF_LAVIS, "projects")
    for src in sorted(glob.glob(os.path.join(proj_root, "**", "*.yaml"),
                                recursive=True)):
        rel = os.path.relpath(src, proj_root)
        if rel.split(os.sep)[0] == "blip2":
            continue  # the blip2 tree is generated natively above
        with open(src) as f:
            tree = yaml.safe_load(f) or {}
        run = tree.get("run") or {}
        for k in _DROP_RUN_KEYS:
            run.pop(k, None)
        written.append(_write(os.path.join("projects", rel), tree))

    models_root = os.path.join(REF_LAVIS, "configs", "models")
    for src in sorted(glob.glob(os.path.join(models_root, "**", "*"),
                                recursive=True)):
        if os.path.isdir(src):
            continue
        rel = os.path.relpath(src, models_root)
        if rel.split(os.sep)[0] == "blip2":
            continue  # blip2 model defaults generated natively above
        if src.endswith(".yaml"):
            with open(src) as f:
                tree = yaml.safe_load(f) or {}
            m = tree.get("model") or {}
            for k, v in list(m.items()):
                if isinstance(v, str) and v.startswith("configs/models/"):
                    m[k] = "configs/models/" + v[len("configs/models/"):]
            written.append(_write(os.path.join("models", rel), tree))
        elif src.endswith(".json"):
            with open(src) as f:
                data = json.load(f)
            path = os.path.join(ROOT, "models", rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                json.dump(data, f, indent=2, sort_keys=True)
                f.write("\n")
            written.append(path)
    return written


if __name__ == "__main__":
    main()
