#!/usr/bin/env bash
# COCO images + karpathy/VQA annotations (reference download_coco.py)
set -euo pipefail
ROOT=${1:-data/coco}
mkdir -p "$ROOT/images" "$ROOT/annotations"
for f in train2014 val2014 test2015; do
  wget -c "http://images.cocodataset.org/zips/${f}.zip" -P "$ROOT/images"
  unzip -n "$ROOT/images/${f}.zip" -d "$ROOT/images"
done
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/coco_karpathy_train.json -P "$ROOT/annotations"
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/coco_karpathy_val.json -P "$ROOT/annotations"
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/coco_karpathy_test.json -P "$ROOT/annotations"
