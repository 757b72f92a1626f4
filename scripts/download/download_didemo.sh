#!/usr/bin/env bash
# DiDeMo videos (reference download_didemo.py) + frame extraction
set -euo pipefail
ROOT=${1:-data/didemo}
mkdir -p "$ROOT/videos" "$ROOT/frames" "$ROOT/annotations"
wget -c "https://storage.googleapis.com/sfr-vision-language-research/LAVIS/datasets/didemo/didemo_videos.tar.gz" -P "$ROOT"
tar -xzf "$ROOT/didemo_videos.tar.gz" -C "$ROOT/videos"
command -v ffmpeg >/dev/null && for v in "$ROOT"/videos/*; do
  b=$(basename "$v"); d="$ROOT/frames/${b%.*}"; mkdir -p "$d"
  ffmpeg -nostdin -loglevel error -i "$v" -vf fps=1 "$d/frame_%03d.jpg"
done || echo "ffmpeg not found; skip frame extraction"
