#!/usr/bin/env bash
# A-OK-VQA annotations (images ship with COCO)
set -euo pipefail
ROOT=${1:-data/aokvqa}
mkdir -p "$ROOT/annotations"
wget -c "https://prior-datasets.s3.us-east-2.amazonaws.com/aokvqa/aokvqa_v1p0.tar.gz" -P "$ROOT"
tar -xzf "$ROOT/aokvqa_v1p0.tar.gz" -C "$ROOT/annotations"
