"""Evaluation metric suites (SURVEY.md §2.4 tasks' _report_metrics)."""

from vlm_compression_tpu.evaluation.caption_metrics import (  # noqa: F401
    cider_d,
    coco_caption_eval,
    corpus_bleu,
    meteor,
    ptb_tokenize,
    rouge_l,
)
from vlm_compression_tpu.evaluation.retrieval_metrics import itm_eval  # noqa: F401
from vlm_compression_tpu.evaluation.vqa_eval import (  # noqa: F401
    VQAEval,
    gqa_exact_match,
    normalize_answer,
    vqa_accuracy,
)
