"""Zero-shot suite over a PRUNE-ONLY checkpoint (the evaluate_old flow's
eval half): no lora/mask entries to strip — weights are physically zeroed.

  python scripts/t5/evaluate_old_suite.py <checkpoint_dir>
"""
import sys

sys.path.insert(0, "scripts")
from launch_lib import eval_checkpoint

eval_checkpoint(sys.argv[1], instruct="--no-instruct" not in sys.argv,
                strip=False)
