#!/usr/bin/env bash
set -euo pipefail
ROOT=${1:-data/gqa}
mkdir -p "$ROOT"
wget -c https://downloads.cs.stanford.edu/nlp/data/gqa/images.zip -P "$ROOT"
unzip -n "$ROOT/images.zip" -d "$ROOT"
