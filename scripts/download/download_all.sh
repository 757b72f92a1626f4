#!/usr/bin/env bash
# Fetch the full benchmark matrix (reference download.sh/download2_parallel.sh)
set -uo pipefail
HERE=$(dirname "$0")
for s in coco flickr gqa vqa okvqa aokvqa nocaps vg sbu cc msrvtt msvd didemo; do
  bash "$HERE/download_${s}.sh" "${1:-data}/$s" || echo "download_${s}.sh failed (continuing)"
done
