"""Checkpoint-eval launcher (reference scripts/T5/evaluate_new.py):
  python scripts/t5/evaluate_new.py <checkpoint_dir>
"""
import sys

sys.path.insert(0, "scripts")
from launch_lib import eval_checkpoint

eval_checkpoint(sys.argv[1], instruct="--no-instruct" not in sys.argv)
