#!/usr/bin/env bash
# MSVD videos (reference download_msvd.py) + frame extraction
set -euo pipefail
ROOT=${1:-data/msvd}
mkdir -p "$ROOT/videos" "$ROOT/frames" "$ROOT/annotations"
wget -c "https://www.cs.utexas.edu/users/ml/clamp/videoDescription/YouTubeClips.tar" -P "$ROOT"
tar -xf "$ROOT/YouTubeClips.tar" -C "$ROOT/videos"
command -v ffmpeg >/dev/null && for v in "$ROOT"/videos/*.avi; do
  d="$ROOT/frames/$(basename "${v%.avi}")"; mkdir -p "$d"
  ffmpeg -nostdin -loglevel error -i "$v" -vf fps=1 "$d/frame_%03d.jpg"
done || echo "ffmpeg not found; skip frame extraction"
