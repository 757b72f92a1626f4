#!/usr/bin/env bash
# MSRVTT videos (reference download_msrvtt.py; mediafire links rotate —
# follow the landing pages below if the direct fetch 404s) + frame extraction
set -euo pipefail
ROOT=${1:-data/msrvtt}
mkdir -p "$ROOT/videos" "$ROOT/frames" "$ROOT/annotations"
echo "train+val: https://www.mediafire.com/file/x3rrbe4hwp04e6w/train_val_videos.zip/file"
echo "test:      https://www.mediafire.com/file/czh8sezbo9s4692/test_videos.zip/file"
wget -c "https://download2295.mediafire.com/4bb7p74xrbgg/x3rrbe4hwp04e6w/train_val_videos.zip" -P "$ROOT" || true
wget -c "https://download2390.mediafire.com/79hfq3592lqg/czh8sezbo9s4692/test_videos.zip" -P "$ROOT" || true
for z in "$ROOT"/*.zip; do unzip -n "$z" -d "$ROOT/videos" || true; done
# extract frame stacks for the frame-based video datasets (items.py)
command -v ffmpeg >/dev/null && for v in "$ROOT"/videos/*.mp4; do
  d="$ROOT/frames/$(basename "${v%.mp4}")"; mkdir -p "$d"
  ffmpeg -nostdin -loglevel error -i "$v" -vf fps=1 "$d/frame_%03d.jpg"
done || echo "ffmpeg not found; skip frame extraction"
