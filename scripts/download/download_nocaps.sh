#!/usr/bin/env bash
# NoCaps val/test annotations + OpenImages val images (reference download_nocaps.py)
set -euo pipefail
ROOT=${1:-data/nocaps}
mkdir -p "$ROOT/images" "$ROOT/annotations"
wget -c "https://nocaps.s3.amazonaws.com/nocaps_val_4500_captions.json" -P "$ROOT/annotations"
wget -c "https://s3.amazonaws.com/nocaps/nocaps_test_image_info.json" -P "$ROOT/annotations"
python - "$ROOT" <<'PY'
import json, os, sys, urllib.request
root = sys.argv[1]
with open(os.path.join(root, "annotations",
                       "nocaps_val_4500_captions.json")) as f:
    data = json.load(f)
for img in data["images"]:
    dst = os.path.join(root, "images", img["file_name"])
    if not os.path.exists(dst):
        urllib.request.urlretrieve(img["coco_url"], dst)
PY
