"""Vicuna RESSA train launcher (reference scripts/Vicuna/train.py:
t5_model_prefix=llm_model)."""
import sys

sys.path.insert(0, "scripts")
from launch_lib import train_ressa

a = [x for x in sys.argv[1:] if not x.startswith("--")]
train_ressa(
    a[0] if a else "wanda",
    t5_ratio=float(a[1]) if len(a) > 1 else 0.5,
    vit_ratio=float(a[2]) if len(a) > 2 else 0.5,
    kl_weight=float(a[3]) if len(a) > 3 else 0.1,
    prune_n=int(a[4]) if len(a) > 4 else 0,
    prune_m=int(a[5]) if len(a) > 5 else 0,
    max_train_samples=int(a[6]) if len(a) > 6 else 25000,
    family="vicuna")
