"""Metric suites: VQA protocol, BLEU/CIDEr, retrieval R@k."""

import numpy as np
import pytest

from vlm_compression_tpu.evaluation import (
    VQAEval,
    cider_d,
    coco_caption_eval,
    corpus_bleu,
    gqa_exact_match,
    itm_eval,
    normalize_answer,
    vqa_accuracy,
)


def test_normalize_answer():
    assert normalize_answer("The Dog!") == "dog"
    assert normalize_answer("TWO") == "2"
    assert normalize_answer("dont") == "don't"
    # official processPunctuation: digit-group comma removed WITHOUT
    # inserting a space ("1,000" → "1000")
    assert normalize_answer("1,000") == "1000"
    assert normalize_answer("a  cat ") == "cat"


def test_vqa_accuracy_protocol():
    # 10 annotators, 4 say "yes": leave-one-out min(1, m/3)
    gts = ["yes"] * 4 + ["no"] * 6
    acc = vqa_accuracy("yes", gts)
    # for each left-out "yes": 3 matches → 1.0 (4 subsets)
    # for each left-out "no":  4 matches → 1.0 (6 subsets)
    assert acc == pytest.approx(1.0)
    gts = ["yes"] * 2 + ["no"] * 8
    acc = vqa_accuracy("yes", gts)
    # left-out yes (2): 1 match → 1/3 ; left-out no (8): 2 → 2/3
    assert acc == pytest.approx((2 * (1 / 3) + 8 * (2 / 3)) / 10)
    assert vqa_accuracy("blue", ["red"] * 10) == 0.0


def test_vqa_eval_aggregate():
    ev = VQAEval()
    res = [
        {"question_id": 1, "answer": "yes", "gt_answers": ["yes"] * 10,
         "answer_type": "yes/no"},
        {"question_id": 2, "answer": "2", "gt_answers": ["two"] * 10,
         "answer_type": "number"},
        {"question_id": 3, "answer": "cat", "gt_answers": ["dog"] * 10,
         "answer_type": "other"},
    ]
    acc = ev.evaluate(res)
    assert acc["overall"] == pytest.approx(66.67, abs=0.01)
    assert acc["yes/no"] == 100.0
    assert acc["other"] == 0.0


def test_gqa_exact_match():
    res = [{"answer": "The dog", "gt_answers": ["dog"]},
           {"answer": "cat", "gt_answers": ["dog"]}]
    assert gqa_exact_match(res) == 50.0


def test_bleu_perfect_and_zero():
    cands = {1: "the cat sat on the mat"}
    refs = {1: ["the cat sat on the mat"]}
    bleu = corpus_bleu(cands, refs)
    assert all(b == pytest.approx(1.0) for b in bleu)
    # pycocoevalcap's tiny/small smoothing constants keep zero-overlap
    # scores at ~1e-10 rather than exactly 0
    bleu0 = corpus_bleu({1: "dog"}, {1: ["entirely different words here"]})
    assert bleu0[3] < 1e-6


def test_bleu_matches_nltk_style_known_value():
    """Hand-checked corpus BLEU: candidate shares 4/6 unigrams etc."""
    cands = {1: "the cat sat on a rug"}
    refs = {1: ["the cat sat on the mat"]}
    b = corpus_bleu(cands, refs)
    # unigram: the,cat,sat,on,a,rug → matches the,cat,sat,on = 4/6
    assert b[0] == pytest.approx(4 / 6)
    # bigram: 5 bigrams, matches: the-cat, cat-sat, sat-on = 3/5
    assert b[1] == pytest.approx(np.sqrt((4 / 6) * (3 / 5)))


def test_cider_identity_scores_high():
    cands = {i: f"a {w} on a mat" for i, w in
             enumerate(["cat", "dog", "bird", "fish"])}
    refs = {i: [c] for i, c in cands.items()}
    score = cider_d(cands, refs)
    assert score > 5.0  # identical candidate ≈ max score (10 · idf-weighted)
    worse = cider_d({0: "something else entirely", **{k: v for k, v in
                     cands.items() if k != 0}}, refs)
    assert worse < score


def test_coco_caption_eval_agg():
    res = [{"image_id": 1, "caption": "a cat sits on the mat"},
           {"image_id": 2, "caption": "a dog"}]
    gts = {1: ["a cat sits on the mat", "cat on a mat"],
           2: ["a big dog runs", "a dog running fast"]}
    out = coco_caption_eval(res, gts)
    assert set(out) >= {"Bleu_4", "CIDEr", "agg_metrics"}
    assert out["agg_metrics"] == pytest.approx(
        out["CIDEr"] + out["Bleu_4"], abs=1e-6)


def test_itm_eval_perfect_and_random():
    # 3 images, 6 texts, 2 per image
    txt2img = [0, 0, 1, 1, 2, 2]
    img2txt = {0: [0, 1], 1: [2, 3], 2: [4, 5]}
    perfect_i2t = np.full((3, 6), -1.0)
    for i, ts in img2txt.items():
        for t in ts:
            perfect_i2t[i, t] = 1.0
    perfect_t2i = perfect_i2t.T.copy()
    m = itm_eval(perfect_i2t, perfect_t2i, txt2img, img2txt)
    assert m["txt_r1"] == 100.0 and m["img_r1"] == 100.0
    assert m["agg_metrics"] == 100.0


def test_rouge_l_oracle():
    from vlm_compression_tpu.evaluation.caption_metrics import (
        _lcs_len,
        rouge_l,
    )

    assert _lcs_len("a b c d".split(), "a c d".split()) == 3
    assert _lcs_len([], ["x"]) == 0
    # identical candidate/reference → F = 1
    c = {1: "a cat sits on the mat"}
    r = {1: ["a cat sits on the mat"]}
    assert rouge_l(c, r) == pytest.approx(1.0)
    # hand-computed: cand "the cat", refs ["the cat sat", "a dog"]
    # lcs vs ref1 = 2 → p=1.0, r=2/3; vs ref2 = 0 → max p=1, max r=2/3
    # beta=1.2: F = (1+1.44)·1·(2/3) / ((2/3) + 1.44·1)
    c = {1: "the cat"}
    r = {1: ["the cat sat", "a dog"]}
    want = (2.44 * 1.0 * (2 / 3)) / ((2 / 3) + 1.44)
    assert rouge_l(c, r) == pytest.approx(want)


def test_coco_caption_eval_includes_rouge():
    res = [{"image_id": 1, "caption": "a cat on a mat"}]
    gts = {1: ["a cat on a mat", "cat sitting on mat"]}
    out = coco_caption_eval(res, gts)
    assert out["ROUGE_L"] == pytest.approx(1.0)
    assert "agg_metrics" in out
