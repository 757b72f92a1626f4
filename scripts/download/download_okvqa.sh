#!/usr/bin/env bash
# OK-VQA annotations (images ship with COCO)
set -euo pipefail
ROOT=${1:-data/okvqa}
mkdir -p "$ROOT/annotations"
for f in okvqa_train okvqa_val_eval ok_vqa_train ok_vqa_val; do
  wget -c "https://storage.googleapis.com/sfr-vision-language-research/datasets/${f}.json" -P "$ROOT/annotations" || true
done
wget -c "https://okvqa.allenai.org/static/data/mscoco_train2014_annotations.json.zip" -P "$ROOT/annotations" || true
wget -c "https://okvqa.allenai.org/static/data/mscoco_val2014_annotations.json.zip" -P "$ROOT/annotations" || true
