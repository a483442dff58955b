#!/usr/bin/env bash
# Fetch + organize UCF101 (the reference's get_data_ucf101.sh + utils/classify_video.py
# bootstrap, rebuilt). Downloads the official archives, extracts, splits videos into
# per-class directories, and places the train/test annotation lists where
# scripts/pack_ucf101.py expects them.
#
# Usage: scripts/fetch_ucf101.sh <dest-root>
set -euo pipefail

ROOT="${1:?usage: fetch_ucf101.sh <dest-root>}"
mkdir -p "$ROOT"
cd "$ROOT"

# official mirrors (CRCV). --no-check-certificate matches the host's TLS quirks.
wget -c --no-check-certificate https://www.crcv.ucf.edu/data/UCF101/UCF101.rar
wget -c --no-check-certificate \
  https://www.crcv.ucf.edu/data/UCF101/UCF101TrainTestSplits-RecognitionTask.zip

mkdir -p videos annotations
unrar x -o+ UCF101.rar videos_flat/ || {
  echo "need 'unrar' to extract UCF101.rar" >&2; exit 1; }
unzip -o UCF101TrainTestSplits-RecognitionTask.zip
mv ucfTrainTestlist/* annotations/

# organize flat v_<Class>_g##_c##.avi files into per-class directories
# (what the reference's utils/classify_video.py did with mv in a loop)
python3 - <<'PY'
import os, shutil
src = "videos_flat/UCF-101" if os.path.isdir("videos_flat/UCF-101") else "videos_flat"
for entry in os.listdir(src):
    path = os.path.join(src, entry)
    if os.path.isdir(path):  # already organized per class
        shutil.move(path, os.path.join("videos", entry))
    elif entry.endswith(".avi"):
        cls = entry.split("_")[1]
        os.makedirs(os.path.join("videos", cls), exist_ok=True)
        shutil.move(path, os.path.join("videos", cls, entry))
print("organized into ./videos/<class>/")
PY

echo "done. now run: python scripts/pack_ucf101.py --root $ROOT --out data/ucf101-pack"
