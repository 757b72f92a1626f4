#!/usr/bin/env bash
# Visual Genome images + caption/VQA annotations (reference download_vg.py)
set -euo pipefail
ROOT=${1:-data/vg}
mkdir -p "$ROOT/images" "$ROOT/annotations"
for z in images images2; do
  wget -c "https://cs.stanford.edu/people/rak248/VG_100K_2/${z}.zip" -P "$ROOT"
  unzip -n "$ROOT/${z}.zip" -d "$ROOT/images"
done
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/vg_caption.json -P "$ROOT/annotations"
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/vg_qa.json -P "$ROOT/annotations"
