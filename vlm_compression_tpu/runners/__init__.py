"""Runners: train/eval orchestration (SURVEY.md §2.5)."""

from vlm_compression_tpu.runners.runner_base import RunnerBase  # noqa: F401
