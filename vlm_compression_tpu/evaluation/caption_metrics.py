"""Caption metrics: corpus BLEU-1..4 and CIDEr-D.

pycocoevalcap is not in the image, so both metrics are implemented from
their definitions (Papineni et al. 2002; Vedantam et al. 2015) with the
same conventions the COCO caption eval uses:

  * BLEU: corpus-level, modified n-gram precision clipped by the max
    reference count, closest-length brevity penalty, uniform weights.
    (pycocoevalcap's default "closest" effective reference length.)
  * CIDEr-D: tf-idf over 1-4-grams (df from the reference corpus, log),
    length-penalized gaussian factor exp(-(δl)²/(2·6²)), clipped
    candidate counts, ×10 scale, averaged over n.

Tokenization: PTBTokenizer-lite — lowercase, strip punctuation, split on
whitespace (the reference corpus goes through the same path, so scores
are internally consistent).

The reference aggregates ``agg_metrics = CIDEr + BLEU-4``
(lavis/tasks/captioning.py:99).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence, Tuple

_PUNCT = re.compile(r"[^\w\s]")


def tokenize(s: str) -> List[str]:
    return _PUNCT.sub("", s.lower()).split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i: i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------


def corpus_bleu(candidates: Dict, references: Dict, max_n: int = 4
                ) -> List[float]:
    """candidates: {id: str}; references: {id: [str, ...]}.
    Returns [BLEU-1, ..., BLEU-max_n]."""
    clipped = [0] * max_n
    totals = [0] * max_n
    cand_len = 0
    ref_len = 0
    for cid, cand in candidates.items():
        c = tokenize(cand)
        refs = [tokenize(r) for r in references[cid]]
        cand_len += len(c)
        # closest reference length (ties → shorter)
        ref_len += min((abs(len(r) - len(c)), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            cn = _ngrams(c, n)
            max_ref = Counter()
            for r in refs:
                for g, cnt in _ngrams(r, n).items():
                    max_ref[g] = max(max_ref[g], cnt)
            totals[n - 1] += sum(cn.values())
            clipped[n - 1] += sum(min(cnt, max_ref.get(g, 0))
                                  for g, cnt in cn.items())
    # smoothed-0 (no smoothing, like pycocoevalcap): p_n = clipped/total
    precisions = [(clipped[i] / totals[i]) if totals[i] else 0.0
                  for i in range(max_n)]
    bp = 1.0 if cand_len > ref_len else (
        math.exp(1 - ref_len / cand_len) if cand_len > 0 else 0.0)
    out = []
    for n in range(1, max_n + 1):
        if any(p == 0 for p in precisions[:n]):
            out.append(0.0)
            continue
        log_avg = sum(math.log(p) for p in precisions[:n]) / n
        out.append(bp * math.exp(log_avg))
    return out


# ---------------------------------------------------------------------------
# CIDEr-D
# ---------------------------------------------------------------------------


def cider_d(candidates: Dict, references: Dict, max_n: int = 4,
            sigma: float = 6.0) -> float:
    ids = list(candidates)
    # document frequency over reference sets
    df: List[Dict[Tuple, int]] = [defaultdict(int) for _ in range(max_n)]
    ref_ngrams = {}
    for cid in ids:
        refs = [tokenize(r) for r in references[cid]]
        ref_ngrams[cid] = refs
        for n in range(max_n):
            seen = set()
            for r in refs:
                seen |= set(_ngrams(r, n + 1))
            for g in seen:
                df[n][g] += 1
    log_docs = math.log(max(len(ids), 1))

    def vec(tokens, n):
        cnt = _ngrams(tokens, n + 1)
        v = {}
        norm = 0.0
        for g, c in cnt.items():
            idf = log_docs - math.log(max(df[n].get(g, 0), 1))
            v[g] = c * idf
            norm += v[g] ** 2
        return v, math.sqrt(norm), len(tokens)

    scores = []
    for cid in ids:
        c = tokenize(candidates[cid])
        score_n = [0.0] * max_n
        for n in range(max_n):
            vc, nc, lc = vec(c, n)
            for r in ref_ngrams[cid]:
                vr, nr, lr = vec(r, n)
                # CIDEr-D: clip candidate counts at reference counts
                num = sum(min(vc[g], vr.get(g, 0.0)) * vr.get(g, 0.0)
                          for g in vc)
                denom = nc * nr
                sim = (num / denom) if denom > 0 else 0.0
                delta = lc - lr
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                score_n[n] += sim
            score_n[n] /= max(len(ref_ngrams[cid]), 1)
        scores.append(10.0 * sum(score_n) / max_n)
    return sum(scores) / max(len(scores), 1)


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(cur[-1], prev[j + 1]))
        prev = cur
    return prev[-1]


def rouge_l(candidates: Dict, references: Dict, beta: float = 1.2) -> float:
    """Corpus ROUGE-L, the pycocoevalcap formula: per image, max LCS
    precision/recall over references, F_beta with beta=1.2; mean over
    images."""
    scores = []
    for cid, cand in candidates.items():
        ct = tokenize(cand)
        precs, recs = [0.0], [0.0]   # empty reference list scores 0
        for ref in references[cid]:
            rt = tokenize(ref)
            l = _lcs_len(ct, rt)
            precs.append(l / max(len(ct), 1))
            recs.append(l / max(len(rt), 1))
        p, r = max(precs), max(recs)
        if p == 0 or r == 0:
            scores.append(0.0)
        else:
            scores.append((1 + beta ** 2) * p * r / (r + beta ** 2 * p))
    return sum(scores) / max(len(scores), 1)


def coco_caption_eval(results: List[dict], gts: Dict[object, List[str]]
                      ) -> Dict[str, float]:
    """results: [{image_id, caption}]; gts: {image_id: [refs]}.
    Returns Bleu_1..4 + ROUGE_L + CIDEr (+ agg_metrics = CIDEr + BLEU-4,
    reference captioning.py:99).  METEOR/SPICE are omitted: the official
    scorers are Java jars with external data files; the reference's
    agg_metrics never uses them."""
    cands = {r["image_id"]: r["caption"] for r in results
             if r["image_id"] in gts}
    refs = {cid: gts[cid] for cid in cands}
    bleu = corpus_bleu(cands, refs)
    cd = cider_d(cands, refs)
    out = {f"Bleu_{i + 1}": round(b, 4) for i, b in enumerate(bleu)}
    out["ROUGE_L"] = round(rouge_l(cands, refs), 4)
    out["CIDEr"] = round(cd, 4)
    out["agg_metrics"] = round(cd + bleu[3], 4)
    return out
