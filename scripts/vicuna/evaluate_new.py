"""Vicuna checkpoint-eval launcher (reference scripts/Vicuna/evaluate_new.py)."""
import sys

sys.path.insert(0, "scripts")
from launch_lib import eval_checkpoint

eval_checkpoint(sys.argv[1], family="vicuna")
