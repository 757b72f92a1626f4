"""Lemmatizer post-process for OK-VQA answers (VERDICT round-1 item 1b).

Reference behavior: ``blip2_t5_instruct.py:717-738`` lemmatizes
NOUN/VERB tokens via spaCy.  spaCy is absent in this image, so these
tests pin the rule-based fallback on the short lowercase answers this
path actually sees, plus the task-level wiring.
"""

from vlm_compression_tpu.evaluation.lemmatize import lemmatize


def test_plural_nouns():
    assert lemmatize(["dogs"]) == ["dog"]
    assert lemmatize(["two dogs"]) == ["two dog"]
    assert lemmatize(["berries"]) == ["berry"]
    assert lemmatize(["dishes"]) == ["dish"]
    assert lemmatize(["boxes"]) == ["box"]
    assert lemmatize(["potatoes"]) == ["potato"]


def test_irregulars():
    assert lemmatize(["men", "children", "teeth", "knives"]) == \
        ["man", "child", "tooth", "knife"]
    assert lemmatize(["skiing"]) == ["ski"]
    assert lemmatize(["glasses"]) == ["glass"]


def test_progressive_and_past():
    assert lemmatize(["running"]) == ["run"]       # undouble
    assert lemmatize(["smiling"]) == ["smile"]     # restore e
    assert lemmatize(["playing"]) == ["play"]
    assert lemmatize(["surfing"]) == ["surf"]
    assert lemmatize(["baked"]) == ["bake"]
    assert lemmatize(["stopped"]) == ["stop"]
    assert lemmatize(["walked"]) == ["walk"]
    assert lemmatize(["eating"]) == ["eat"]


def test_keep_list_and_non_alpha():
    # function words and s-final non-plurals survive
    assert lemmatize(["yes"]) == ["yes"]
    assert lemmatize(["on the bus"]) == ["on the bus"]
    assert lemmatize(["2 dogs"]) == ["2 dog"]
    assert lemmatize([""]) == [""]


def test_multiword_answer():
    assert lemmatize(["riding horses"]) == ["ride horse"]


def test_task_wiring():
    """VQATask picks apply_lemmatizer off the model cfg like the
    reference okvqa eval yamls."""
    from vlm_compression_tpu.common.config import Config
    from vlm_compression_tpu.tasks.vqa import VQATask

    task = VQATask.setup_task(Config(
        "configs/projects/eval/okvqa_zeroshot_flant5xl_instruct_eval.yaml"))
    assert task.apply_lemmatizer is True

    task2 = VQATask.setup_task(Config(
        "configs/projects/eval/gqa_zeroshot_flant5xl_instruct_eval.yaml"))
    assert task2.apply_lemmatizer is False
