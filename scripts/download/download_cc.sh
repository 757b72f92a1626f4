#!/usr/bin/env bash
# Conceptual Captions 3M/12M (reference DownloadConceptualCaptions/):
# images are fetched per-URL from the Google TSVs, then the LAVIS-format
# annotation json is emitted.  Usage: download_cc.sh [root] [3m|12m]
set -euo pipefail
ROOT=${1:-data/cc3m}
SCALE=${2:-3m}
mkdir -p "$ROOT/images" "$ROOT/annotations"
if [ "$SCALE" = "3m" ]; then
  TSV_URL="https://storage.googleapis.com/gcc-data/Train/GCC-training.tsv"
else
  TSV_URL="https://storage.googleapis.com/conceptual_12m/cc12m.tsv"
fi
wget -c "$TSV_URL" -O "$ROOT/cc_${SCALE}.tsv"
python - "$ROOT" "$SCALE" <<'PY'
import csv, json, os, sys, urllib.request
root, scale = sys.argv[1], sys.argv[2]
anns = []
with open(os.path.join(root, f"cc_{scale}.tsv")) as f:
    for i, row in enumerate(csv.reader(f, delimiter="\t")):
        caption, url = row[0], row[1]
        name = f"{i:08d}.jpg"
        dst = os.path.join(root, "images", name)
        if not os.path.exists(dst):
            try:
                urllib.request.urlretrieve(url, dst)
            except Exception:
                continue
        anns.append({"image": name, "caption": caption, "image_id": i})
with open(os.path.join(root, "annotations",
                       f"cc{scale}_train.json"), "w") as f:
    json.dump(anns, f)
PY
