#!/usr/bin/env bash
# Flickr30k requires a form-gated download; place images under
# data/flickr30k/images and fetch LAVIS annotations:
set -euo pipefail
ROOT=${1:-data/flickr30k}
mkdir -p "$ROOT/annotations"
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/flickr30k_test.json -P "$ROOT/annotations"
wget -c https://storage.googleapis.com/sfr-vision-language-research/datasets/flickr30k_val.json -P "$ROOT/annotations"
