#!/usr/bin/env bash
# SBU captions (reference download_sbu.py; images fetched per-URL from the
# annotation list — the original sbu_images.tar mirror is intermittent)
set -euo pipefail
ROOT=${1:-data/sbu}
mkdir -p "$ROOT/images" "$ROOT/annotations"
wget -c "http://www.cs.rice.edu/~vo9/sbucaptions/sbu_images.tar" -P "$ROOT" \
  && tar -xf "$ROOT/sbu_images.tar" -C "$ROOT/images" \
  || echo "sbu_images.tar mirror unavailable; fetch per-URL from the annotation json"
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/sbu_caption.json -P "$ROOT/annotations" || true
