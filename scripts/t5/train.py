"""RESSA train launcher (reference scripts/T5/train.py):
  python scripts/t5/train.py <pruner> <t5_ratio> <vit_ratio> <kl> [n m samples tune_opt rv rl rq]
"""
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
    tune_opt=a[7] if len(a) > 7 else "LVQ",
    lora_r_v=int(a[8]) if len(a) > 8 else 4,
    lora_r_l=int(a[9]) if len(a) > 9 else 8,
    lora_r_q=int(a[10]) if len(a) > 10 else 2,
    instruct="--no-instruct" not in sys.argv)
