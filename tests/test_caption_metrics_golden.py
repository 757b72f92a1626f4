"""Golden tests pinning the caption metric layer to pycocoevalcap
semantics (VERDICT round-1 item 1a).

pycocoevalcap itself is not installable in this image (and METEOR/SPICE
are Java jars), so fidelity is established three independent ways:

1. closed-form hand-derived values (identical corpora, disjoint corpora,
   analytic brevity-penalty / idf cases);
2. nltk's independent ``corpus_bleu`` implementation (same corpus BLEU
   definition with "closest" effective reference length) on both a toy
   and a 50-caption synthetic corpus;
3. a pinned 50-caption regression corpus so any tokenizer/scorer drift
   fails loudly.

Tokenizer fidelity (PTB sed-script behavior + pycocoevalcap punctuation
removal) is asserted token-by-token.
"""

import math
import random

import pytest

from vlm_compression_tpu.evaluation.caption_metrics import (
    cider_d,
    coco_caption_eval,
    corpus_bleu,
    meteor,
    ptb_tokenize,
    rouge_l,
)

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


def test_ptb_tokenize_contractions_and_possessives():
    # PTB splits clitics; pycocoevalcap then lowercases and drops
    # punctuation tokens.
    assert ptb_tokenize("A man isn't happy.") == ["a", "man", "is", "n't",
                                                  "happy"]
    assert ptb_tokenize("The dog's bone") == ["the", "dog", "'s", "bone"]


def test_ptb_tokenize_punctuation_removed_hyphen_kept_in_word():
    # standalone "-", ",", ".", parens (-LRB-/-RRB-) are removed;
    # intra-word hyphens survive.
    toks = ptb_tokenize("a well-lit room - with (two) windows, yes.")
    assert toks == ["a", "well-lit", "room", "with", "two", "windows",
                    "yes"]


def test_ptb_tokenize_quotes_removed():
    assert ptb_tokenize('he said "hello there" loudly') == \
        ["he", "said", "hello", "there", "loudly"]


# ---------------------------------------------------------------------------
# closed-form checks
# ---------------------------------------------------------------------------


def test_bleu_identical_candidates_are_one():
    cands = {1: "a dog runs across the green field",
             2: "two people ride bicycles down the street"}
    refs = {k: [v] for k, v in cands.items()}
    bleus = corpus_bleu(cands, refs)
    for b in bleus:
        assert abs(b - 1.0) < 1e-6


def test_bleu_analytic_half_overlap():
    # candidate: 4 tokens, 2 unigrams correct, 1 bigram correct,
    # 0 higher-order; single ref of equal length => BP = 1.
    cands = {1: "a b x y"}
    refs = {1: ["a b c d"]}
    b = corpus_bleu(cands, refs)
    assert abs(b[0] - 2 / 4) < 1e-6
    assert abs(b[1] - math.sqrt((2 / 4) * (1 / 3))) < 1e-6
    # tri/4-gram correct = 0 -> tiny smoothing keeps it ~0
    assert b[2] < 1e-3 and b[3] < 1e-3


def test_bleu_brevity_penalty():
    # candidate shorter than the (single) reference: BP = exp(1 - r/c)
    cands = {1: "a b"}
    refs = {1: ["a b c d"]}
    b = corpus_bleu(cands, refs)
    assert abs(b[0] - 1.0 * math.exp(1 - 4 / 2)) < 1e-6


def test_bleu_closest_reflen_tie_prefers_shorter():
    # len(c)=3; refs of len 2 and 4 tie on |l-3| -> reflen=2 -> BP=1
    cands = {1: "a b c"}
    refs = {1: ["a b", "a b c d"]}
    b = corpus_bleu(cands, refs)
    assert abs(b[0] - 1.0) < 1e-6   # all 3 unigrams appear in refs


def test_cider_identical_distinct_pairs_is_ten():
    # every candidate == its single distinct reference, equal length:
    # idf > 0, cosine = 1, length penalty = 1 => CIDEr-D = 10 exactly.
    cands = {1: "a brown dog runs across the field",
             2: "two children play chess near the window"}
    refs = {k: [v] for k, v in cands.items()}
    assert abs(cider_d(cands, refs) - 10.0) < 1e-9


def test_cider_single_image_idf_collapses_to_zero():
    # with one image log(1)=0 idf zeroes every vector => score 0
    cands = {1: "a dog"}
    refs = {1: ["a dog"]}
    assert cider_d(cands, refs) == 0.0


def test_cider_length_penalty_gaussian():
    # disjoint vocab candidate => numerator 0 regardless of penalty
    cands = {1: "x y z", 2: "a brown dog"}
    refs = {1: ["a brown dog"], 2: ["x y z"]}
    assert cider_d(cands, refs) < 1e-9


def test_rouge_identical_is_one():
    cands = {1: "a dog runs"}
    refs = {1: ["a dog runs", "something else entirely here"]}
    assert abs(rouge_l(cands, refs) - 1.0) < 1e-9


def test_rouge_analytic():
    # LCS("a b c d", "a c d e") = 3 -> P=3/4, R=3/4, F(beta=1.2)=3/4
    cands = {1: "a b c d"}
    refs = {1: ["a c d e"]}
    beta = 1.2
    p = r = 3 / 4
    f = (1 + beta ** 2) * p * r / (r + beta ** 2 * p)
    assert abs(rouge_l(cands, refs) - f) < 1e-9


def test_meteor_identical_penalty_only():
    # identical 4-token sentence: F=1, chunks=1, m=4
    cands = {1: "a dog runs fast"}
    refs = {1: ["a dog runs fast"]}
    expect = 1.0 - 0.5 * (1 / 4) ** 3
    assert abs(meteor(cands, refs) - expect) < 1e-9


def test_meteor_stem_stage_matches():
    # "running" vs "runs" only match through the Porter-stem stage
    cands = {1: "running"}
    refs = {1: ["runs"]}
    # P=R=1 => F=1; chunks=1, m=1 => penalty=0.5
    assert abs(meteor(cands, refs) - 0.5) < 1e-9


def test_meteor_no_match_zero():
    assert meteor({1: "x y"}, {1: ["a b"]}) == 0.0


def test_meteor_15en_identical_analytic():
    # identical 4-token sentence under METEOR-1.5's English constants
    # (alpha=.85, beta=.2, gamma=.6): F=1, chunks=1, m=4
    cands = {1: "a dog runs fast"}
    refs = {1: ["a dog runs fast"]}
    expect = 1.0 - 0.6 * (1 / 4) ** 0.2
    assert abs(meteor(cands, refs, params="1.5en") - expect) < 1e-9


def test_meteor_parameter_family_spread():
    """Quantified METEOR-1.5 deviation bound (VERDICT r2 task 6).

    The Java jar cannot run offline, so the deviation of our METEOR from
    a reference-produced evaluate.txt decomposes into (a) the scoring
    parameter family — fully reproducible offline and pinned here — and
    (b) the jar's synonym/paraphrase matcher stages + δ function-word
    discount, which need WordNet/paraphrase tables.  On the 50-caption
    golden corpus the family term is 0.3477 corpus-level (0.395 max
    per-image): the 2005 constants are a DIFFERENT SCALE, which is why
    coco_caption_eval reports the "1.5en" parameterization (same family
    and scale as the jar; published COCO METEOR values ~0.25-0.30 live on
    this scale)."""
    cands, refs = _synth_corpus()
    m05 = meteor(cands, refs, params="2005")
    m15 = meteor(cands, refs, params="1.5en")
    assert m05 == pytest.approx(0.8509, abs=1e-4)
    assert m15 == pytest.approx(0.5031, abs=1e-4)
    assert abs(m05 - m15) == pytest.approx(0.3477, abs=1e-3)


def test_spice_column_is_explicit_null():
    """The reference's COCOEvalCap computes SPICE (captioning.py:114,
    139-147); we cannot (Java scene-graph pipeline).  The exclusion must
    be VISIBLE in the evaluate.txt schema — an explicit null column, not
    a silently missing key — and must never feed agg_metrics."""
    cands, refs = _synth_corpus(n=5)
    results = [{"image_id": k, "caption": v} for k, v in cands.items()]
    m = coco_caption_eval(results, refs)
    assert "SPICE" in m and m["SPICE"] is None
    assert m["agg_metrics"] == pytest.approx(m["CIDEr"] + m["Bleu_4"],
                                             abs=2e-4)


# ---------------------------------------------------------------------------
# independent implementation cross-check: nltk corpus_bleu
# ---------------------------------------------------------------------------


def _nltk_bleu4(cands, refs):
    from nltk.translate.bleu_score import corpus_bleu as nltk_corpus_bleu

    hyps, reflists = [], []
    for cid, c in cands.items():
        hyps.append(ptb_tokenize(c))
        reflists.append([ptb_tokenize(r) for r in refs[cid]])
    return nltk_corpus_bleu(reflists, hyps)


def _synth_corpus(n=50, seed=7):
    rng = random.Random(seed)
    nouns = ["dog", "cat", "man", "woman", "boy", "girl", "car", "bike",
             "tree", "bench", "kite", "ball", "bird", "horse", "plate"]
    verbs = ["holding", "riding", "watching", "standing near", "playing",
             "eating", "looking at", "sitting on", "jumping over"]
    places = ["in the park", "on the street", "near the beach",
              "at the table", "by the window", "in a field"]
    cands, refs = {}, {}
    for i in range(n):
        no, ve, pl = rng.choice(nouns), rng.choice(verbs), rng.choice(places)
        base = f"a {no} {ve} a {rng.choice(nouns)} {pl}"
        cands[i] = base
        variants = [base,
                    f"the {no} is {ve} a {rng.choice(nouns)} {pl}",
                    f"a photo of a {no} {ve} something {pl}"]
        refs[i] = rng.sample(variants, k=rng.randint(1, 3))
    return cands, refs


def test_bleu_matches_nltk_toy():
    cands = {1: "a dog runs across the field",
             2: "two people walk on a beach near the water"}
    refs = {1: ["a dog runs across a green field",
                "the dog is running through the field"],
            2: ["two people walk along the beach"]}
    ours = corpus_bleu(cands, refs)[3]
    theirs = _nltk_bleu4(cands, refs)
    assert abs(ours - theirs) < 1e-6


def test_bleu_matches_nltk_50_caption_corpus():
    cands, refs = _synth_corpus()
    ours = corpus_bleu(cands, refs)[3]
    theirs = _nltk_bleu4(cands, refs)
    assert abs(ours - theirs) < 1e-6


# ---------------------------------------------------------------------------
# pinned regression corpus (50 captions)
# ---------------------------------------------------------------------------


def test_pinned_50_caption_corpus():
    cands, refs = _synth_corpus()
    results = [{"image_id": k, "caption": v} for k, v in cands.items()]
    m = coco_caption_eval(results, refs)
    # Values pinned at introduction (round 2).  Any change to the
    # tokenizer or a scorer must update these deliberately.
    assert m["agg_metrics"] == pytest.approx(m["CIDEr"] + m["Bleu_4"],
                                             abs=2e-4)
    pinned = PINNED_METRICS
    for k, v in pinned.items():
        assert m[k] == pytest.approx(v, abs=1e-4), (k, m[k], v)


# Computed by running the scorers on _synth_corpus() at pin time; BLEU
# independently confirmed by nltk above.
PINNED_METRICS = {
    "Bleu_1": 0.8877,
    "Bleu_2": 0.8444,
    "Bleu_3": 0.8004,
    "Bleu_4": 0.7491,
    # 1.5en constants (round 3): the jar's scoring family; the 2005-family
    # value for the same corpus is 0.8509 (see
    # test_meteor_parameter_family_spread)
    "METEOR": 0.5031,
    "ROUGE_L": 0.8878,
    "CIDEr": 5.7535,
}
