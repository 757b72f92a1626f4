"""Prune-and-eval launcher (reference scripts/T5/dsnot.py):
  python scripts/t5/dsnot.py <t5_ratio> <vit_ratio> [prune_n prune_m] [--no-instruct]
"""
import sys

sys.path.insert(0, "scripts")
from launch_lib import prune_and_eval

a = [x for x in sys.argv[1:] if not x.startswith("--")]
prune_and_eval(
    "dsnot",
    t5_ratio=float(a[0]) if a else 0.5,
    vit_ratio=float(a[1]) if len(a) > 1 else 0.5,
    prune_n=int(a[2]) if len(a) > 2 else 0,
    prune_m=int(a[3]) if len(a) > 3 else 0,
    instruct="--no-instruct" not in sys.argv)
